"""Depth-to-space with torch ``nn.PixelShuffle`` channel semantics, NHWC layout.

The reference upsamples with Conv2d -> PixelShuffle inside every NeRVBlock
(models/_layers.py:20-36). Torch semantics on NCHW are
out[n, c, h*r+i, w*r+j] = in[n, c*r*r + i*r + j, h, w]; we reproduce exactly
that channel ordering on NHWC tensors so weights can round-trip with the
reference's checkpoints. XLA fuses the reshape/transpose chain — no custom
kernel needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x, r):
    """(N, H, W, C*rh*rw) -> (N, H*rh, W*rw, C), torch channel ordering.

    `r` may be an int or an (rh, rw) pair; the anisotropic form also covers
    the NeRV layer-0 block-to-space shuffle (models/NeRV.py:51), which is a
    pixel shuffle with factors (fc_h, fc_w).
    """
    rh, rw = (r, r) if isinstance(r, int) else r
    if rh == 1 and rw == 1:
        return x
    n, h, w, crr = x.shape
    c = crr // (rh * rw)
    assert c * rh * rw == crr, (crr, rh, rw)
    x = x.reshape(n, h, w, c, rh, rw)
    # target index: out[n, h*rh+i, w*rw+j, c] = x[n, h, w, c, i, j]
    x = x.transpose(0, 1, 4, 2, 5, 3)      # (n, h, i, w, j, c)
    return x.reshape(n, h * rh, w * rw, c)


def pixel_unshuffle(x, r: int):
    """Inverse of :func:`pixel_shuffle`."""
    if r == 1:
        return x
    n, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    x = x.reshape(n, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)      # (n, h, w, c, i, j)
    return x.reshape(n, h, w, c * r * r)
