"""Fake-quantization math: STE rounding, uniform affine quantizers, scale
initialization, and AdaRound — all pure jnp functions over explicit state.

Re-designs quantization/quantizer.py functionally: the reference mutates
quantizer modules in place (lazy `inited` flag, `nn.Parameter` promotion,
quantizer object swap for AdaRound); here quantization parameters are plain
pytree leaves and every transform is a pure function, so "optimize delta" and
"optimize alpha" are just different optax masks over one jitted step.

Per-channel scale search is vmapped over the output-channel axis instead of
the reference's Python loop over channels (quantizer.py:139-140).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

GAMMA, ZETA = -0.1, 1.1      # AdaRound rectified-sigmoid constants (quantizer.py:274)
EPS = 1e-8


def round_ste(x):
    """Straight-through round (quantizer.py:53-57)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def floor_ste(x):
    return x + jax.lax.stop_gradient(jnp.floor(x) - x)


# --------------------------------------------------------------------------
# Uniform affine fake-quant.
# --------------------------------------------------------------------------
def uaq_fake_quant(x, delta, zero_point, n_bits: int):
    """Asymmetric uniform affine fake-quant with STE (quantizer.py:111-125).

    delta/zero_point broadcast against x (per-channel shapes supported).
    Gradients flow to x via STE and to delta through both the scaling and the
    dequant, matching the torch autograd graph.
    """
    n_levels = 2 ** n_bits
    x_int = round_ste(x / delta) + zero_point
    x_quant = jnp.clip(x_int, 0, n_levels - 1)
    return (x_quant - zero_point) * delta


def uaq_int_codes(x, delta, zero_point, n_bits: int):
    """Integer codes (what the entropy coder consumes)."""
    n_levels = 2 ** n_bits
    x_int = jnp.round(x / delta) + zero_point
    return jnp.clip(x_int, 0, n_levels - 1).astype(jnp.int32)


# --------------------------------------------------------------------------
# Scale initialization (quantizer.py:127-225).
# --------------------------------------------------------------------------
def _quantize_with_range(x, new_max, new_min, n_bits: int):
    """Candidate quantization used by the mse/l1 searches (quantizer.py:227-234)."""
    n_levels = 2 ** n_bits
    delta = jnp.maximum((new_max - new_min) / (n_levels - 1), EPS)
    zp = jnp.round(-new_min / delta)
    x_int = jnp.round(x / delta)
    x_quant = jnp.clip(x_int + zp, 0, n_levels - 1)
    return (x_quant - zp) * delta


def _init_scale_flat(x, n_bits: int, method: str, sym: bool):
    """Scale/zero-point for one quantization group (a flat slice of weights).

    Returns (delta, zero_point) scalars. jit/vmap-safe.
    """
    n_levels = 2 ** n_bits

    if "max" in method:
        x_min = jnp.minimum(x.min(), 0.0)
        x_max = jnp.maximum(x.max(), 0.0)
        if sym:
            x_absmax = jnp.maximum(jnp.abs(x_min), x_max)
            x_min = jnp.where(x_min < 0, -x_absmax, 0.0)
            x_max = x_absmax
        delta = jnp.maximum((x_max - x_min) / (n_levels - 1), EPS)
        zp = jnp.round(-x_min / delta)
        return delta, zp

    if method == "gaussian":
        mu = x.mean()
        sigma = x.var()   # reference quirk: torch.var (variance, not std) at quantizer.py:190
        x_min = jnp.minimum(mu - 6 * sigma, 0.0)
        x_max = jnp.maximum(mu + 6 * sigma, 0.0)
        if sym:
            x_absmax = jnp.maximum(jnp.abs(x_min), x_max)
            x_min = jnp.where(x_min < 0, -x_absmax, 0.0)
            x_max = x_absmax
        delta = jnp.maximum((x_max - x_min) / (n_levels - 1), EPS)
        zp = jnp.round(-x_min / delta)
        return delta, zp

    if method in ("mse", "l1", "l2"):
        # 'l2' is advertised by the reference CLIs but unimplemented there
        # (would raise at init, quantizer.py:225); here it is the natural
        # p=2 member of the same shrink search.
        x_max, x_min = x.max(), x.min()
        shrink = 1.0 - 0.05 * jnp.arange(10, dtype=x.dtype)      # (10,)
        cand_max = x_max * shrink
        cand_min = x_min * shrink

        def score_one(nmax, nmin):
            xq = _quantize_with_range(x, nmax, nmin, n_bits)
            if method == "mse":
                return (jnp.abs(x - xq) ** 3.5).mean()   # lp_loss p=3.5 (quantizer.py:181)
            if method == "l2":
                return ((x - xq) ** 2).mean()
            return jnp.abs(x - xq).mean()
        scores = jax.vmap(score_one)(cand_max, cand_min)
        best = jnp.argmin(scores)
        nmax, nmin = cand_max[best], cand_min[best]
        delta = jnp.maximum((nmax - nmin) / (n_levels - 1), EPS)
        zp = jnp.round(-nmin / delta)
        return delta, zp

    raise NotImplementedError(f"scale method {method!r}")


def init_weight_scale(w_hwio, n_bits: int, channel_wise: bool, method: str,
                      sym: bool = False):
    """Scale init for an HWIO conv weight.

    channel_wise follows the reference's per-output-channel recursion
    (quantizer.py:133-143) but vectorized with vmap over C_out. Returns
    (delta, zero_point) with shape (1, 1, 1, C_out) when channel_wise else ().
    """
    if channel_wise:
        cout = w_hwio.shape[-1]
        per_ch = w_hwio.reshape(-1, cout).T            # (C_out, KH*KW*C_in)
        delta, zp = jax.vmap(
            lambda v: _init_scale_flat(v, n_bits, method, sym))(per_ch)
        return delta.reshape(1, 1, 1, cout), zp.reshape(1, 1, 1, cout)
    return _init_scale_flat(w_hwio.reshape(-1), n_bits, method, sym)


def init_bias_scale(b, n_bits: int, method: str, sym: bool = False):
    """Bias (1-D) always gets a single scale, even channel_wise
    (quantizer.py:144-152)."""
    return _init_scale_flat(b.reshape(-1), n_bits, method, sym)


# --------------------------------------------------------------------------
# AdaRound (quantizer.py:247-323).
# --------------------------------------------------------------------------
def f16_round(x):
    """float32 -> float16 -> float32 cast, replicating the reference's
    `.half().float()` on delta/zero_point at AdaRound hand-off (quantizer.py:264-265)."""
    return x.astype(jnp.float16).astype(jnp.float32)


def adaround_init_alpha(x, delta):
    """alpha such that rect_sigmoid(alpha) == rest(x/delta) (quantizer.py:305-317)."""
    rest = x / delta - jnp.floor(x / delta)
    return -jnp.log((ZETA - GAMMA) / (rest - GAMMA) - 1.0)


def adaround_soft_targets(alpha):
    """h(alpha) = clip(sigmoid(alpha)*(zeta-gamma)+gamma, 0, 1) (quantizer.py:302-303)."""
    return jnp.clip(jax.nn.sigmoid(alpha) * (ZETA - GAMMA) + GAMMA, 0.0, 1.0)


def adaround_fake_quant(x, delta, zero_point, alpha, n_bits: int,
                        soft: bool = True):
    """learned_hard_sigmoid forward (quantizer.py:288-300)."""
    n_levels = 2 ** n_bits
    x_floor = jnp.floor(x / delta)
    if soft:
        x_int = x_floor + adaround_soft_targets(alpha)
    else:
        x_int = x_floor + (alpha >= 0).astype(x.dtype)
    x_quant = jnp.clip(x_int + zero_point, 0, n_levels - 1)
    return (x_quant - zero_point) * delta


def adaround_int_codes(x, delta, zero_point, alpha, n_bits: int):
    """Hard-rounded integer codes (the reference's x_quant, quantizer.py:297)."""
    n_levels = 2 ** n_bits
    x_int = jnp.floor(x / delta) + (alpha >= 0).astype(x.dtype)
    return jnp.clip(x_int + zero_point, 0, n_levels - 1).astype(jnp.int32)


def adaround_reg(alpha, b):
    """Rounding regularizer sum(1 - |2h(a)-1|^b) (calib_model.py:44-45)."""
    h = adaround_soft_targets(alpha)
    return (1.0 - jnp.abs(2.0 * h - 1.0) ** b).sum()


# --------------------------------------------------------------------------
# QAT quantizers (quantizer.py:326-375) — FFNeRV / HiNeRV baselines.
# --------------------------------------------------------------------------
def qfn_ste(x, bit: int):
    """FFNeRV qfn: sign-preserving floor-quantize of |x| with STE
    (quantizer.py:17-28)."""
    n = float(2 ** (bit - 1) - 1)
    out = jnp.floor(jnp.abs(x) * n) / n * jnp.sign(x)
    return x + jax.lax.stop_gradient(out - x)


def quantize_ste_sym(x, n_bits: int, axis=0):
    """HiNeRV-style symmetric quantize with per-axis scale (quantizer.py:9-14)."""
    quant_range = 2.0 ** n_bits - 1.0
    if axis is None:
        x_max = jnp.abs(x).max()
    else:
        x_max = jnp.abs(x).max(axis=axis, keepdims=True)
    x_scale = 2 * x_max / quant_range + 1e-6
    x_q = jnp.clip(round_ste(x / x_scale), -2 ** (n_bits - 1),
                   2 ** (n_bits - 1) - 1)
    return x_q, x_scale


def qat_fake_quant(x, n_bits: int, mode: str, rng=None, training: bool = True):
    """QATQuantizer forward (quantizer.py:351-371)."""
    if mode == "ffnerv":
        return qfn_ste(jnp.tanh(x), n_bits)
    if mode == "hinerv":
        x_q, x_scale = quantize_ste_sym(x, n_bits)
        x_qr = jax.lax.stop_gradient(x_q) * x_scale
        if training:
            assert rng is not None, "hinerv QAT training mode needs an rng"
            mask = (jax.random.uniform(rng, x.shape) > 0.9).astype(x.dtype)
            return x * mask + x_qr * (1.0 - mask)
        return x_qr
    raise ValueError(f"Wrong rounding mode {mode!r}")
