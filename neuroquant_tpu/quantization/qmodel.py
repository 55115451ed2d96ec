"""Functional "QuantModel": fake-quantization as a pure params transform.

The reference wraps conv modules in QuantModule objects and toggles state on
them (quant_layer.py:24-89, quant_model.py:11-87). The TPU-native equivalent:

    qparams = quantize_params(params, spec, qstate, mode=...)
    out = model.apply(qparams, x)

`qstate` is a pytree of quantization parameters, so jitted calibration steps
differentiate straight through `quantize_params` into deltas (phase 1) or
AdaRound alphas (phase 2) — no module surgery, no recompiles between phases.

Weights are HWIO; the optional Hadamard domain transforms along C_in
(ops/hadamard.py), with zero-padding to the next power of two
(quant_layer.py:44-49).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from neuroquant_tpu.ops import quant as Q
from neuroquant_tpu.ops.hadamard import (
    fwht, next_power_of_two, pad_cin_to_pow2,
)
from neuroquant_tpu.quantization.spec import QuantSpec


def _get(tree, path):
    node = tree["params"] if "params" in tree else tree
    for k in path:
        node = node[k]
    return node


def _set(tree, path, value):
    """Out-of-place set of a nested dict entry; returns a new tree."""
    import copy

    root = dict(tree)
    if "params" in root:
        root["params"] = _set(root["params"], path, value)
        return root
    node = root
    for k in path[:-1]:
        node[k] = dict(node[k])
        node = node[k]
    node[path[-1]] = value
    return root


def _hadamard_weight(w_hwio):
    """Padded, C_in-transformed weight (the quantization domain when
    spec.hadamard; quant_layer.py:44-49)."""
    return fwht(pad_cin_to_pow2(w_hwio), axis=2)


from functools import partial


@partial(jax.jit, static_argnames=("spec",))
def init_quant_state(params, spec: QuantSpec) -> Dict:
    """Eager scale init for every layer (replaces the reference's lazy
    first-forward init, quantizer.py:111-114). Jitted as one program — on
    tunneled-TPU setups per-op dispatch would otherwise dominate."""
    state = {}
    for name, path, bits in zip(spec.layer_names, spec.layer_paths, spec.n_bits):
        layer = _get(params, path)
        w, b = layer["kernel"], layer["bias"]
        w_dom = _hadamard_weight(w) if spec.hadamard else w
        wd, wz = Q.init_weight_scale(w_dom, bits, spec.channel_wise,
                                     spec.scale_method, spec.sym)
        bd, bz = Q.init_bias_scale(b, bits, spec.scale_method, spec.sym)
        state[name] = {"w_delta": wd, "w_zp": wz, "b_delta": bd, "b_zp": bz}
    return state


@partial(jax.jit, static_argnames=("spec", "only"))
def adaround_upgrade(params, spec: QuantSpec, state: Dict,
                     only: tuple | None = None) -> Dict:
    """Swap-in of AdaRound: add per-element alphas, f16-cast deltas/zps
    (calib_model.py:169-191, quantizer.py:259-317). Weight alphas live in the
    quantization domain (hadamard_weight when spec.hadamard).

    `only`: layer-name subset to upgrade — the rest keep their UAQ state
    (round-to-nearest). Downstream consumers (quantize_params,
    collect_int_codes, round_loss) key the per-layer mode off alpha
    presence, enabling MIXED rounding — a capability the reference lacks
    (it always AdaRounds every layer), for models like PNeRV where
    whole-model AdaRound is net-negative (RESULTS.md round 4)."""
    new_state = {}
    for name, path in zip(spec.layer_names, spec.layer_paths):
        s = state[name]
        if only is not None and name not in only:
            new_state[name] = dict(s)
            continue
        layer = _get(params, path)
        w, b = layer["kernel"], layer["bias"]
        w_dom = _hadamard_weight(w) if spec.hadamard else w
        wd, wz = Q.f16_round(s["w_delta"]), Q.f16_round(s["w_zp"])
        bd, bz = Q.f16_round(s["b_delta"]), Q.f16_round(s["b_zp"])
        new_state[name] = {
            "w_delta": wd, "w_zp": wz, "b_delta": bd, "b_zp": bz,
            "w_alpha": Q.adaround_init_alpha(w_dom, wd),
            "b_alpha": Q.adaround_init_alpha(b, bd),
        }
    return new_state


def _fq_weight(w, s, bits: int, hadamard: bool, mode: str, soft: bool,
               impl: str = "jnp"):
    if impl == "pallas":
        # fused FWHT -> quant -> FWHT Pallas kernel with a custom VJP whose
        # backward is the VJP of this function's jnp branch
        from neuroquant_tpu.ops.pallas_fakequant import (
            pallas_ada_fake_quant, pallas_uaq_fake_quant,
        )

        if mode == "uaq":
            return pallas_uaq_fake_quant(w, s["w_delta"], s["w_zp"], bits,
                                         hadamard)
        if mode == "adaround":
            return pallas_ada_fake_quant(w, s["w_delta"], s["w_zp"],
                                         s["w_alpha"], bits, hadamard, soft)
        raise ValueError(mode)
    cin = w.shape[2]
    x = _hadamard_weight(w) if hadamard else w
    if mode == "uaq":
        xq = Q.uaq_fake_quant(x, s["w_delta"], s["w_zp"], bits)
    elif mode == "adaround":
        xq = Q.adaround_fake_quant(x, s["w_delta"], s["w_zp"], s["w_alpha"],
                                   bits, soft=soft)
    else:
        raise ValueError(mode)
    if hadamard:
        xq = fwht(xq, axis=2)[:, :, :cin, :]   # self-inverse; crop the pad
    return xq


def _fq_bias(b, s, bits: int, mode: str, soft: bool):
    if mode == "uaq":
        return Q.uaq_fake_quant(b, s["b_delta"], s["b_zp"], bits)
    return Q.adaround_fake_quant(b, s["b_delta"], s["b_zp"], s["b_alpha"],
                                 bits, soft=soft)


def quantize_params(params, spec: QuantSpec, state: Dict, mode: str = "uaq",
                    soft: bool = True, upto: int | None = None):
    """Return a params pytree with fake-quantized kernels/biases for every
    spec layer (the functional equivalent of set_quant_state(True) forward,
    quant_layer.py:67-81). `upto` quantizes only units 0..upto inclusive —
    the reference's quantize_model_till (data_utils.py:262-272), used when
    harvesting fisher gradients and QDrop "sym" inputs."""
    out = params
    for i, (name, path, bits) in enumerate(
            zip(spec.layer_names, spec.layer_paths, spec.n_bits)):
        if upto is not None and i > upto:
            break
        layer = _get(params, path)
        s = state[name]
        # per-layer mode: a layer without alphas under mode='adaround' is a
        # nearest-rounded (UAQ) layer — the mixed-rounding state
        # adaround_upgrade(only=...) produces
        lmode = mode if (mode != "adaround" or "w_alpha" in s) else "uaq"
        new_layer = dict(layer)
        new_layer["kernel"] = _fq_weight(layer["kernel"], s, bits,
                                         spec.hadamard, lmode, soft,
                                         impl=getattr(spec, "fq_impl", "jnp"))
        new_layer["bias"] = _fq_bias(layer["bias"], s, bits, lmode, soft)
        out = _set(out, path, new_layer)
    return out


def get_perturbation(params, spec: QuantSpec, state: Dict):
    """Per-layer delta_w = w - UAQ(w) for the Omega criterion.

    Matches the reference quirk (quant_layer.py:86-89): the raw-domain weight
    is quantized with the current scales even when those scales were
    initialized in the Hadamard domain.
    """
    out = []
    for name, path, bits in zip(spec.layer_names, spec.layer_paths, spec.n_bits):
        w = _get(params, path)["kernel"]
        s = state[name]
        out.append(w - Q.uaq_fake_quant(w, s["w_delta"], s["w_zp"], bits))
    return out


def average_bits(params, spec: QuantSpec) -> float:
    """Parameter-weighted average bit width (quant_model.py:58-72)."""
    import numpy as np

    bits_total, n_total = 0.0, 0.0
    for path, bits in zip(spec.layer_paths, spec.n_bits):
        layer = _get(params, path)
        nw = int(np.prod(layer["kernel"].shape))
        nb = int(np.prod(layer["bias"].shape))
        bits_total += bits * (nw + nb)
        n_total += nw + nb
    return bits_total / n_total


@partial(jax.jit, static_argnames=("spec", "mode"))
def _int_code_arrays(params, spec: QuantSpec, state: Dict, mode: str):
    """One device program producing every layer's integer codes (eagerly the
    per-layer FWHT + rounding chains are hundreds of small dispatches, ~20 s
    through a tunneled backend)."""
    arrays = {}
    for name, path, bits in zip(spec.layer_names, spec.layer_paths, spec.n_bits):
        layer = _get(params, path)
        w, b = layer["kernel"], layer["bias"]
        w_dom = _hadamard_weight(w) if spec.hadamard else w
        s = state[name]
        if mode == "uaq" or "w_alpha" not in s:
            wc = Q.uaq_int_codes(w_dom, s["w_delta"], s["w_zp"], bits)
            bc = Q.uaq_int_codes(b, s["b_delta"], s["b_zp"], bits)
        else:
            wc = Q.adaround_int_codes(w_dom, s["w_delta"], s["w_zp"],
                                      s["w_alpha"], bits)
            bc = Q.adaround_int_codes(b, s["b_delta"], s["b_zp"],
                                      s["b_alpha"], bits)
        arrays[name] = (wc, bc)
    return arrays


def collect_int_codes(params, spec: QuantSpec, state: Dict,
                      mode: str = "adaround"):
    """Per-layer integer codes for the entropy-coding stage
    (get_quantized_param, quant_model.py:74-80). Weight codes are in the
    quantization domain (Hadamard domain when spec.hadamard — the decoder
    inverse-transforms after dequantization)."""
    arrays = _int_code_arrays(params, spec, state, mode)
    codes = {}
    for name, bits in zip(spec.layer_names, spec.n_bits):
        wc, bc = arrays[name]
        s = state[name]
        codes[name] = {"w": wc, "b": bc,
                       "w_delta": s["w_delta"], "w_zp": s["w_zp"],
                       "b_delta": s["b_delta"], "b_zp": s["b_zp"],
                       "bits": bits}
    return codes


def round_loss(state: Dict, spec: QuantSpec, b, weight: float):
    """AdaRound regularizer over *weight* alphas only (calib_model.py:39-47)."""
    total = 0.0
    for name in spec.layer_names:
        if "w_alpha" in state[name]:     # mixed rounding: UAQ layers have
            total = total + Q.adaround_reg(state[name]["w_alpha"], b)
    return weight * total


class QuantModel:
    """Thin stateful convenience wrapper bundling (model, params, spec, state).

    The pipeline CLIs use the pure functions directly inside jit; this class
    serves interactive use and mirrors the reference QuantModel surface
    (set_quant_state / set_bitwidth / forward=decode, quant_model.py:43-87).
    """

    def __init__(self, model, params, spec: QuantSpec, state: Dict | None = None):
        self.model = model
        self.params = params
        self.spec = spec
        self.state = state if state is not None else init_quant_state(params, spec)
        self.use_weight_quant = False
        self.mode = "uaq"
        self.soft = True

    def set_quant_state(self, weight_quant: bool = False):
        self.use_weight_quant = weight_quant

    def set_bitwidth(self, bits, reinit: bool = True) -> float:
        self.spec = self.spec.with_bits(bits)
        if reinit:
            self.state = init_quant_state(self.params, self.spec)
        return average_bits(self.params, self.spec)

    def quantized_params(self):
        return quantize_params(self.params, self.spec, self.state,
                               mode=self.mode, soft=self.soft)

    def encode(self, x):
        return self.model.apply(self.params, x, method="encode")

    def decode(self, embed):
        p = self.quantized_params() if self.use_weight_quant else self.params
        return self.model.apply(p, embed, method="decode")

    def __call__(self, embed):
        # reference: QuantModel.forward == model.decode (quant_model.py:54-55)
        return self.decode(embed)
