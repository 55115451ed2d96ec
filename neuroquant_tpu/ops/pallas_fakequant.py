"""Pallas TPU kernel: fused Hadamard-domain fake-quantization of conv weights.

The calibration/eval hot path quantizes weights as
FWHT(C_in) -> uniform-affine (or AdaRound) fake-quant -> inverse FWHT
(reference: quant_layer.py:67-81, with the README recommending a CUDA
Hadamard kernel, readme.md:123). On TPU the natural formulation is matmuls:
for C = C_in_pad <= a few hundred, the normalized Hadamard matrix H (C x C)
lives in VMEM and the transform is X @ H on the MXU — so the whole chain
becomes  (X @ H) -> VPU quant math -> (@ H)  in ONE kernel, one HBM round
trip for the weight instead of three.

Weights enter as (R, C) with R = C_out * KH * KW rows grouped C_out-major so
the per-output-channel scale/zero-point broadcast as per-row vectors.
`fused_fake_quant_hwio` handles the HWIO reshape/pad plumbing.

Autodiff: `pallas_uaq_fake_quant` / `pallas_ada_fake_quant` wrap the kernel
in a jax.custom_vjp whose backward pass is the VJP of the jnp reference
implementation (`_jnp_reference`, the same math as quantization/qmodel.py)
— gradient parity with the jnp path holds by construction (STE through
round, zero-grad floor + rectified-sigmoid alpha grad for AdaRound, clip
masks, FWHT self-adjointness). The raw `fused_fake_quant_hwio` is
forward-only. Select the kernel in the calibration pipeline with
QuantSpec(fq_impl='pallas') / calibrate_network --fq_impl pallas.

Measured verdict (TPU v5e, HNeRV-3M Bunny 640x1280, batch-2 calibration,
2026-08): forward output is bit-identical to the jnp path (0/2.95M weight
elements differ, max 3e-8) once the in-kernel Hadamard dots run at
Precision.HIGHEST; calibration throughput is 37.3 it/s vs 38.1 it/s for the
XLA-fused jnp chain. With the packed decoder tail the fake-quant is ~2% of
step time, so the kernel's fusion win no longer pays for its fixed overhead
— the jnp path stays the default and the kernel is kept as a verified
alternative (it wins when weights are large relative to the decode, e.g.
single-layer microbenchmarks).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from neuroquant_tpu.ops.hadamard import next_power_of_two


def _hadamard_matrix(n: int) -> np.ndarray:
    h = np.array([[1.0]], np.float32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return (h / math.sqrt(n)).astype(np.float32)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _hdot(x, h):
    """Hadamard-matrix matmul at fp32 MXU precision: the jnp reference FWHT
    is exact adds/subs, so a default (bf16-pass) dot here flips round()
    decisions near quantization boundaries — measured 5.6e-3 weight error on
    real TPU before forcing HIGHEST."""
    return jax.lax.dot(x, h, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)


def _fq_kernel(x_ref, h_ref, delta_ref, zp_ref, out_ref, *, n_levels: int,
               hadamard: bool):
    x = x_ref[:]
    if hadamard:
        x = _hdot(x, h_ref[:])
    delta = delta_ref[:]          # (TILE_R, 1)
    zp = zp_ref[:]
    q = jnp.clip(jnp.round(x / delta) + zp, 0.0, n_levels - 1.0)
    deq = (q - zp) * delta
    if hadamard:
        deq = _hdot(deq, h_ref[:])
    out_ref[:] = deq


def _ada_kernel(x_ref, h_ref, delta_ref, zp_ref, alpha_ref, out_ref, *,
                n_levels: int, hadamard: bool, soft: bool):
    x = x_ref[:]
    if hadamard:
        x = _hdot(x, h_ref[:])
    delta = delta_ref[:]
    zp = zp_ref[:]
    if soft:
        h_alpha = jnp.clip(jax.nn.sigmoid(alpha_ref[:]) * 1.2 - 0.1, 0.0, 1.0)
    else:
        h_alpha = (alpha_ref[:] >= 0).astype(jnp.float32)
    q = jnp.clip(jnp.floor(x / delta) + h_alpha + zp, 0.0, n_levels - 1.0)
    deq = (q - zp) * delta
    if hadamard:
        deq = _hdot(deq, h_ref[:])
    out_ref[:] = deq


def _pallas_fq_2d(x2, hmat, delta_rows, zp_rows, n_bits: int, hadamard: bool,
                  alpha2=None, soft: bool = True, interpret: bool = False,
                  tile_r: int = 256):
    """x2: (R, C) padded weight view; delta/zp: (R, 1); alpha2: (R, C)|None."""
    r, c = x2.shape
    rp = _round_up(r, 8)
    if rp != r:
        pad = ((0, rp - r), (0, 0))
        x2 = jnp.pad(x2, pad)
        delta_rows = jnp.pad(delta_rows, pad, constant_values=1.0)
        zp_rows = jnp.pad(zp_rows, pad)
        if alpha2 is not None:
            alpha2 = jnp.pad(alpha2, pad)
    tile_r = min(tile_r, rp)
    while rp % tile_r:
        tile_r //= 2
    grid = (rp // tile_r,)

    row_spec = pl.BlockSpec((tile_r, c), lambda i: (i, 0))
    one_spec = pl.BlockSpec((tile_r, 1), lambda i: (i, 0))
    h_spec = pl.BlockSpec((c, c), lambda i: (0, 0))

    if alpha2 is None:
        kern = functools.partial(_fq_kernel, n_levels=2 ** n_bits,
                                 hadamard=hadamard)
        out = pl.pallas_call(
            kern, grid=grid,
            in_specs=[row_spec, h_spec, one_spec, one_spec],
            out_specs=row_spec,
            out_shape=jax.ShapeDtypeStruct((rp, c), jnp.float32),
            interpret=interpret,
        )(x2, hmat, delta_rows, zp_rows)
    else:
        kern = functools.partial(_ada_kernel, n_levels=2 ** n_bits,
                                 hadamard=hadamard, soft=soft)
        out = pl.pallas_call(
            kern, grid=grid,
            in_specs=[row_spec, h_spec, one_spec, one_spec, row_spec],
            out_specs=row_spec,
            out_shape=jax.ShapeDtypeStruct((rp, c), jnp.float32),
            interpret=interpret,
        )(x2, hmat, delta_rows, zp_rows, alpha2)
    return out[:r]


def fused_fake_quant_hwio(w_hwio, delta, zp, n_bits: int,
                          hadamard: bool = True, alpha=None, soft: bool = True,
                          interpret: bool | None = None):
    """Fused (FWHT ->) fake-quant (-> inverse FWHT) of an HWIO conv weight.

    delta/zp: per-channel (1,1,1,C_out) or scalars; alpha (AdaRound): the
    quantization-domain tensor (KH, KW, C_in_pad, C_out) or None for UAQ.
    Numerically equivalent to the jnp path in quantization/qmodel.py.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kh, kw, cin, cout = w_hwio.shape
    cpad = next_power_of_two(cin) if hadamard else cin
    if cpad != cin:
        w_hwio = jnp.pad(w_hwio, ((0, 0), (0, 0), (0, cpad - cin), (0, 0)))

    # rows C_out-major: (C_out, KH, KW, C) -> (R, C)
    x2 = w_hwio.transpose(3, 0, 1, 2).reshape(-1, cpad)
    r = x2.shape[0]
    per_row = kh * kw
    d = jnp.broadcast_to(jnp.reshape(delta, (-1,)), (cout,))
    z = jnp.broadcast_to(jnp.reshape(zp, (-1,)), (cout,))
    delta_rows = jnp.repeat(d, per_row).reshape(r, 1)
    zp_rows = jnp.repeat(z, per_row).reshape(r, 1)
    alpha2 = None
    if alpha is not None:
        alpha2 = alpha.transpose(3, 0, 1, 2).reshape(-1, cpad)

    hmat = jnp.asarray(_hadamard_matrix(cpad))
    out2 = _pallas_fq_2d(x2, hmat, delta_rows, zp_rows, n_bits, hadamard,
                         alpha2=alpha2, soft=soft, interpret=interpret)
    out = out2.reshape(cout, kh, kw, cpad).transpose(1, 2, 3, 0)
    return out[:, :, :cin, :]


# --------------------------------------------------------------------------
# Differentiable wrappers: Pallas forward, jnp-reference-VJP backward.
# --------------------------------------------------------------------------
def _jnp_reference(w, delta, zp, alpha, n_bits: int, hadamard: bool,
                   soft: bool):
    """The jnp fake-quant chain this kernel fuses (quantization/qmodel.py
    _fq_weight) — the backward passes below differentiate THIS, so kernel
    gradients match the jnp path exactly."""
    from neuroquant_tpu.ops import quant as Q
    from neuroquant_tpu.ops.hadamard import fwht, pad_cin_to_pow2

    cin = w.shape[2]
    x = fwht(pad_cin_to_pow2(w), axis=2) if hadamard else w
    if alpha is None:
        xq = Q.uaq_fake_quant(x, delta, zp, n_bits)
    else:
        xq = Q.adaround_fake_quant(x, delta, zp, alpha, n_bits, soft=soft)
    if hadamard:
        xq = fwht(xq, axis=2)[:, :, :cin, :]
    return xq


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pallas_uaq_fake_quant(w, delta, zp, n_bits, hadamard):
    """UAQ fake-quant of an HWIO weight: fused Pallas forward, STE backward."""
    return fused_fake_quant_hwio(w, delta, zp, n_bits, hadamard=hadamard)


def _uaq_fwd(w, delta, zp, n_bits, hadamard):
    return pallas_uaq_fake_quant(w, delta, zp, n_bits, hadamard), (w, delta, zp)


def _uaq_bwd(n_bits, hadamard, res, g):
    w, delta, zp = res
    _, vjp = jax.vjp(
        lambda w, d, z: _jnp_reference(w, d, z, None, n_bits, hadamard, True),
        w, delta, zp)
    return vjp(g)


pallas_uaq_fake_quant.defvjp(_uaq_fwd, _uaq_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def pallas_ada_fake_quant(w, delta, zp, alpha, n_bits, hadamard, soft):
    """AdaRound fake-quant: fused Pallas forward; backward gives the
    rectified-sigmoid alpha gradient (and zero grad to w through floor,
    matching torch)."""
    return fused_fake_quant_hwio(w, delta, zp, n_bits, hadamard=hadamard,
                                 alpha=alpha, soft=soft)


def _ada_fwd(w, delta, zp, alpha, n_bits, hadamard, soft):
    out = pallas_ada_fake_quant(w, delta, zp, alpha, n_bits, hadamard, soft)
    return out, (w, delta, zp, alpha)


def _ada_bwd(n_bits, hadamard, soft, res, g):
    w, delta, zp, alpha = res
    _, vjp = jax.vjp(
        lambda w, d, z, a: _jnp_reference(w, d, z, a, n_bits, hadamard, soft),
        w, delta, zp, alpha)
    return vjp(g)


pallas_ada_fake_quant.defvjp(_ada_fwd, _ada_bwd)
