"""Mixed-precision sensitivity criteria: Omega (v' H v) and diagonal Fisher.

Reference: methods/bit_assign.py:57-217. Omega evaluates the quantization
perturbation v = w - w_hat against the loss Hessian accumulated over <= 10
random batches: omega = sum_layers (sum_b H_b v) . v. The HVP here is
reverse-over-FORWARD — Hv = grad(w -> jvp(loss, w, v)) — the only
composition that can pass through the fused Pallas tail: jax.custom_vjp is
strictly first-order (neither jvp-over-grad nor grad-of-grad traces through
it), but the 'pallas_hvp' execution (ops/tail_fused.py tail_apply_fo)
carries a custom_jvp rule built from first-order Pallas conv primitives, so
the jvp works and the outer grad only ever reverse-differentiates ONCE.
The whole 10-batch accumulation is a single jitted lax.scan with frames
resident in HBM; `remat=True` wraps the loss jvp in jax.checkpoint so the
outer backward rematerializes instead of storing (PNeRV's batch-2 HVP
exceeded HBM without it).

fisher_diag: sum_layers (v^2 * g^2) with g the gradient accumulated over the
same batches (bit_assign.py:122-169, 204-215).
"""

from __future__ import annotations

import logging
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from neuroquant_tpu.quantization.qmodel import _get, _set, get_perturbation
from neuroquant_tpu.quantization.spec import QuantSpec

MAX_BATCHES = 10  # bit_assign.py:116-118


def _kernels_of(params, spec: QuantSpec) -> Dict:
    return {n: _get(params, p)["kernel"]
            for n, p in zip(spec.layer_names, spec.layer_paths)}


def _with_kernels(params, spec: QuantSpec, kernels: Dict):
    out = params
    for n, p in zip(spec.layer_names, spec.layer_paths):
        layer = dict(_get(out, p))
        layer["kernel"] = kernels[n]
        out = _set(out, p, layer)
    return out


def sensitivity_criterion(mode: str, arch: str, model, params,
                          spec: QuantSpec, state: Dict, frames, norm_idx,
                          batch_size: int, seed: int = 903,
                          log_fn=logging.info, remat: bool = False):
    """Sensitivity score for the current (spec, state) bit allocation.

    Lower is better; bit_assign picks the argmin over candidates
    (bit_assign.py:369-381).
    """
    arch = arch.lower()
    kernels = _kernels_of(params, spec)
    vec = dict(zip(spec.layer_names, get_perturbation(params, spec, state)))

    n = frames.shape[0]
    rng = jax.random.PRNGKey(seed)
    perm = jax.random.permutation(rng, n)
    n_batches = min(MAX_BATCHES, n // batch_size)
    batches = perm[:n_batches * batch_size].reshape(n_batches, batch_size)

    # frames/norm_idx/params pass as jit args (closure capture would embed
    # the full clip in the HLO)
    def loss_fn(kernels, params, frames, norm_idx, idx):
        p = _with_kernels(params, spec, kernels)
        img = frames[idx]
        if arch == "hnerv" or arch.startswith("pnerv"):
            pred = model.apply(p, img)
        elif arch == "nerv":
            pred = model.apply(p, norm_idx[idx])
        else:
            raise ValueError(arch)
        return jnp.mean((pred - img) ** 2)   # nn.MSELoss (bit_assign.py:190)

    if mode == "omega":
        @jax.jit
        def accumulate(kernels, vec, batches, params, frames, norm_idx):
            def dirderiv(k, idx):
                # d/de loss(k + e*vec): forward-mode; the pallas_hvp tail's
                # custom_jvp rule supplies the tangent through the kernels
                _, dl = jax.jvp(
                    lambda kk: loss_fn(kk, params, frames, norm_idx, idx),
                    (k,), (vec,))
                return dl

            dd = jax.checkpoint(dirderiv) if remat else dirderiv

            def body(acc, idx):
                hv = jax.grad(dd)(kernels, idx)
                return jax.tree_util.tree_map(jnp.add, acc, hv), None
            zero = jax.tree_util.tree_map(jnp.zeros_like, kernels)
            acc, _ = jax.lax.scan(body, zero, batches)
            return acc

        hvp = accumulate(kernels, vec, batches, params, frames, norm_idx)
        per_layer = [float(jnp.sum(hvp[ln] * vec[ln])) for ln in spec.layer_names]
    elif mode == "fisher_diag":
        @jax.jit
        def accumulate(kernels, batches, params, frames, norm_idx):
            def body(acc, idx):
                g = jax.grad(loss_fn)(kernels, params, frames, norm_idx, idx)
                return jax.tree_util.tree_map(jnp.add, acc, g), None
            zero = jax.tree_util.tree_map(jnp.zeros_like, kernels)
            acc, _ = jax.lax.scan(body, zero, batches)
            return acc

        g = accumulate(kernels, batches, params, frames, norm_idx)
        per_layer = [float(jnp.sum(vec[ln] ** 2 * g[ln] ** 2))
                     for ln in spec.layer_names]
    else:
        raise ValueError(f"Not implemented sensitivity criteria: {mode}")

    for count, v in enumerate(per_layer):
        log_fn(f"[{count:d}-th layer] {v:.3e}")
    return float(np.sum(per_layer)), per_layer
