"""Fused conv + pixel-shuffle as a single transposed convolution.

The NeRVBlock upsample is Conv2d(C_in -> C_out*r^2, k, pad=(k-1)//2) followed
by PixelShuffle(r) (reference: models/_layers.py:20-36). Profiling the decode
on TPU showed ~half of step time spent in layout copies from the shuffle's
6-D transposes. The exact equivalence (Shi et al., "Is the deconvolution
layer the same as a convolutional layer?") lets us instead run ONE
`lax.conv_general_dilated` with lhs_dilation=r and a periodically rearranged
kernel: the MXU writes the output directly at (H*r, W*r, C_out) — no shuffle,
no copies, identical math and identical parameters.

Derivation (per axis, r = upsample, k = conv kernel, p = (k-1)//2):
  y[r*h + i] = sum_dy W[dy, .., c*r^2 + i*r + j] x[h + dy - p]
  == conv(x dilated by r, K', pad P) with
     P  = r*p + r - 1,      k_t = r*k,
     K'[ty, tx, ci, c] = W[dy, dx, ci, c*r*r + i*r + j]
       where i = (r-1 - ty) % r,  dy = (ty - (r-1) + i) // r   (and same for tx).

Also covers the NeRV layer-0 block-to-space shuffle (models/NeRV.py:51):
k = 1 with anisotropic (rh, rw).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _gather_indices(k: int, r: int):
    """For each transposed-kernel tap ty in [0, r*k): (dy, i)."""
    out = []
    for ty in range(r * k):
        i = (r - 1 - ty) % r
        dy = (ty - (r - 1) + i) // r
        out.append((dy, i))
    return out


def rearrange_kernel(w_hwio, rh: int, rw: int):
    """(k, k, C_in, C_out*rh*rw) conv kernel -> (rh*k, rw*k, C_in, C_out)
    transposed-conv kernel implementing conv + pixel_shuffle."""
    kh, kw, cin, cout_rr = w_hwio.shape
    cout = cout_rr // (rh * rw)
    # channel layout: c*rh*rw + i*rw + j  (torch PixelShuffle order)
    w = w_hwio.reshape(kh, kw, cin, cout, rh, rw)
    ty_map = _gather_indices(kh, rh)
    tx_map = _gather_indices(kw, rw)
    dy = jnp.asarray([m[0] for m in ty_map])
    iy = jnp.asarray([m[1] for m in ty_map])
    dx = jnp.asarray([m[0] for m in tx_map])
    jx = jnp.asarray([m[1] for m in tx_map])
    # K'[ty, tx, ci, c] = w[dy[ty], dx[tx], ci, c, iy[ty], jx[tx]]
    kk = w[dy][:, dx]                      # (rh*k, rw*k, cin, cout, rh, rw)
    kk = jnp.take_along_axis(
        kk, iy[:, None, None, None, None, None].astype(jnp.int32), axis=4)
    kk = jnp.take_along_axis(
        kk, jx[None, :, None, None, None, None].astype(jnp.int32), axis=5)
    return kk[:, :, :, :, 0, 0]


def conv_pixel_shuffle_perm(x, w_hwio, bias, r, padding: int | None = None):
    """conv + pixel-shuffle with a lane-friendly data path.

    The naive shuffle transposes (n,h,w,C,rh,rw)->(n,h,rh,w,rw,C): the
    minor-most axis changes from rw (tiny) to C — a worst-case TPU relayout
    (half the decode step in `copy` ops under the profiler). Instead we
    permute the conv's output-channel ORDER (a free relabeling of kernel
    columns) to (rh, rw, C); the shuffle then becomes
    (n,h,w,rh,rw,C) -> (n,h,rh,w,rw,C), which keeps a contiguous (rw*C)
    minor block and only swaps w<->rh — near-bandwidth on TPU.
    """
    rh, rw = (r, r) if isinstance(r, int) else r
    kh, kw, cin, cout_rr = w_hwio.shape
    cout = cout_rr // (rh * rw)
    p = (kh - 1) // 2 if padding is None else padding

    # relabel output channels: c*rh*rw + i*rw + j  ->  (i*rw + j)*C + c
    w = w_hwio.reshape(kh, kw, cin, cout, rh, rw)
    w = w.transpose(0, 1, 2, 4, 5, 3).reshape(kh, kw, cin, cout_rr)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(p, p), (p, p)], dimension_numbers=dn)
    if bias is not None:
        b = bias.reshape(cout, rh, rw).transpose(1, 2, 0).reshape(-1)
        y = y + b
    if rh == 1 and rw == 1:
        return y
    n, h, wd, _ = y.shape
    y = y.reshape(n, h, wd, rh, rw, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)        # minor (rw, C) block untouched
    return y.reshape(n, h * rh, wd * rw, cout)


def conv_pixel_shuffle(x, w_hwio, bias, r, padding: int | None = None):
    """conv(k, pad=(k-1)//2) + pixel_shuffle(r) in one transposed conv.

    x: NHWC; w_hwio: (k, k, C_in, C_out*rh*rw); bias: (C_out*rh*rw,) or None.
    Bias is folded per output channel AND shuffle position: after the shuffle,
    bias index c*rh*rw + i*rw + j varies with spatial parity — handled by
    adding the full-channel bias pre-shuffle-equivalently via a (rh, rw, C)
    spatially-tiled bias.
    """
    rh, rw = (r, r) if isinstance(r, int) else r
    kh, kw, cin, cout_rr = w_hwio.shape
    cout = cout_rr // (rh * rw)
    p = (kh - 1) // 2 if padding is None else padding

    if rh == 1 and rw == 1:
        dn = jax.lax.conv_dimension_numbers(x.shape, w_hwio.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, w_hwio, (1, 1), [(p, p), (p, p)], dimension_numbers=dn)
        return y + bias if bias is not None else y

    kk = rearrange_kernel(w_hwio, rh, rw)
    ph = rh * p + rh - 1
    pw = rw * p + rw - 1
    dn = jax.lax.conv_dimension_numbers(x.shape, kk.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, kk, (1, 1), [(ph, ph), (pw, pw)],
        lhs_dilation=(rh, rw), dimension_numbers=dn)
    if bias is not None:
        n, hh, ww, _ = y.shape
        b = bias.reshape(cout, rh, rw).transpose(1, 2, 0)   # (rh, rw, C)
        y = y.reshape(n, hh // rh, rh, ww // rw, rw, cout)
        y = y + b[None, None, :, None, :, :]
        y = y.reshape(n, hh, ww, cout)
    return y
