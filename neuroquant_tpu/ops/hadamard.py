"""Normalized fast Walsh-Hadamard transform (FWHT) over the input-channel axis.

The reference quantizes conv weights in a per-channel Hadamard domain
(quantization/quant_layer.py:13-22): reshape (C_out, C_in, KH, KW) ->
(C_out*KH*KW, C_in), apply a normalized FWHT along C_in (self-inverse), and
reshape back; C_in is zero-padded to the next power of two first. The torch
path leans on the `hadamard_transform` pip package (and recommends a CUDA
kernel, readme.md:123); here the transform is a log2(C) butterfly expressed in
jnp that XLA maps onto the VPU, plus a Pallas-fused
FWHT -> fake-quant -> inverse-FWHT kernel for the calibration hot path (see
ops/pallas_fakequant.py).

Weights in this framework are HWIO (KH, KW, C_in, C_out); the transform runs
along the C_in axis (axis=-2 for HWIO views).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def next_power_of_two(n: int) -> int:
    return 1 if n == 0 else 2 ** math.ceil(math.log2(n))


def fwht(x, axis: int = -1, normalize: bool = True):
    """Normalized FWHT along `axis`; length must be a power of two.

    Self-inverse when normalized (H @ H = I). Implemented as log2(n)
    reshape-butterfly stages — static shapes, fully fusible by XLA.
    """
    n = x.shape[axis]
    assert n & (n - 1) == 0, f"FWHT length must be a power of two, got {n}"
    x = jnp.moveaxis(x, axis, -1)
    lead = x.shape[:-1]
    steps = n.bit_length() - 1
    for s in range(steps):
        half = 1 << s
        x = x.reshape(*lead, n // (2 * half), 2, half)
        a = x[..., 0, :]
        b = x[..., 1, :]
        x = jnp.concatenate([a + b, a - b], axis=-1)
        x = x.reshape(*lead, n)
        # after stage s the transformed blocks have length 2*half; the
        # reshape above interleaves them back in natural order
    if normalize:
        x = x / jnp.sqrt(jnp.asarray(n, x.dtype))
    return jnp.moveaxis(x, -1, axis)


def pad_cin_to_pow2(w_hwio):
    """Zero-pad the C_in axis of an HWIO weight to the next power of two."""
    kh, kw, cin, cout = w_hwio.shape
    p = next_power_of_two(cin) - cin
    if p == 0:
        return w_hwio
    return jnp.pad(w_hwio, ((0, 0), (0, 0), (0, p), (0, 0)))


def hadamard_along_channel_weight(w_hwio, normalize: bool = True):
    """FWHT along C_in of an HWIO conv weight (C_in must be a power of two).

    Equivalent to the reference's (C_out*KH*KW, C_in) row-wise transform
    (quant_layer.py:16-22) — the transform touches only the C_in axis, so no
    reshaping is needed in HWIO layout.
    """
    return fwht(w_hwio, axis=2, normalize=normalize)
