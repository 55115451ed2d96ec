"""Block-wise and layer-wise calibration (BRECQ/AdaRound baselines).

Reference: quantization/calib_block.py:91-183 and calib_layer.py:89-179 (the
latter has a NameError at calib_layer.py:130 — `opt_params +=` before
definition — fixed here by construction). These reconstruct each quantized
unit against its cached FP32 outputs, in contrast to NeuroQuant's network-wise
calibration against ground-truth frames (calibrate.py).

TPU design: FP input/output pairs for every unit are harvested in ONE jitted
pass over the calibration embeddings (the reference re-runs the network per
unit with forward hooks + StopForward exceptions, data_utils.py:45-88); the
optimization loop is a jitted scan over random minibatches of the cached
tensors, which stay resident in HBM.

A "unit" is one quantizable conv layer; `include_act=True` reconstructs the
block output (conv -> pixel-shuffle -> act), `False` the raw conv output.
"""

from __future__ import annotations

import logging
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuroquant_tpu.metrics import lp_loss
from neuroquant_tpu.ops import quant as Q
from neuroquant_tpu.ops.hadamard import fwht
from neuroquant_tpu.ops.pixelshuffle import pixel_shuffle
from neuroquant_tpu.quantization.calibrate import LinearTempDecay
from neuroquant_tpu.quantization.qmodel import (
    _get, _hadamard_weight, adaround_upgrade, quantize_params,
)
from neuroquant_tpu.quantization.spec import QuantSpec


def _unit_meta(model, arch: str, unit_idx: int):
    """(stride, act, pre_shuffle) of the unit at quant-traversal position
    `unit_idx` for the NeRV/HNeRV decoder layout: [decoder0, blocks..., head]."""
    from neuroquant_tpu.models.layers import activation

    cfg = model.cfg
    n_blocks = len(cfg.dec_strides)
    if unit_idx == 0:                       # decoder0: plain 1x1 conv
        return 1, None, False
    if unit_idx == n_blocks + 1:            # head: plain 3x3 conv
        return 1, None, False
    stride = cfg.dec_strides[unit_idx - 1]
    return stride, activation(cfg.dec_acts), False


def harvest_unit_io(model, params, arch: str, spec: QuantSpec, cali_data,
                    batch_size: int = 10, include_act: bool = True):
    """One pass over cali_data capturing each unit's FP input/output.

    Uses decode(..., return_embeds=True): embeds = [embed_in, dec0_out,
    blk0_out, ..., blkN_out]. Unit inputs/outputs follow from the decoder
    dataflow (models/hnerv.py decode); batch layout matches the reference's
    batch_size=10 caching (calib_block.py:150).
    """
    cfg = model.cfg
    n_blocks = len(cfg.dec_strides)
    fc = (cfg.fc_h, cfg.fc_w)

    @jax.jit
    def run(params, x):
        img, embeds = model.apply(params, x, method="decode",
                                  return_embeds=True)
        taps = {}
        taps[0] = (embeds[0], embeds[1])                    # decoder0
        blk_in = pixel_shuffle(embeds[1], fc)
        for k in range(n_blocks):
            taps[k + 1] = (blk_in, embeds[2 + k])
            blk_in = embeds[2 + k]
        # head conv output = pre-OutImg logits; recompute from params
        head = _get(params, spec.layer_paths[-1])
        logits = _head_conv(blk_in, head)
        taps[n_blocks + 1] = (blk_in, logits)
        return taps

    outs = None
    n = cali_data.shape[0]
    for s in range(0, n, batch_size):
        taps = run(params, cali_data[s:s + batch_size])
        if outs is None:
            outs = {k: ([v[0]], [v[1]]) for k, v in taps.items()}
        else:
            for k, v in taps.items():
                outs[k][0].append(v[0])
                outs[k][1].append(v[1])
    return {k: (jnp.concatenate(i), jnp.concatenate(o))
            for k, (i, o) in outs.items()}


def _head_conv(x, layer):
    dn = jax.lax.conv_dimension_numbers(x.shape, layer["kernel"].shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, layer["kernel"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn) + layer["bias"]


def _apply_unit(x, kernel, bias, stride: int, kernel_size: int, act):
    pad = (kernel_size - 1) // 2
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=dn) + bias
    if stride != 1:
        y = pixel_shuffle(y, stride)
    if act is not None:
        y = act(y)
    return y


def unit_reconstruction(model, params, spec: QuantSpec, state: Dict,
                        unit_idx: int, cali_data, include_act: bool = True,
                        batch_size: int = 8, iters: int = 20000,
                        weight: float = 0.01, b_range=(20, 2),
                        warmup: float = 0.0, p: float = 2.0,
                        lr: float = 0.0015, seed: int = 903,
                        log_fn=logging.info):
    """AdaRound one unit against its cached FP output. Returns updated state
    for that unit (others untouched). include_act=True == block
    reconstruction; False == layer reconstruction."""
    name = spec.layer_names[unit_idx]
    path = spec.layer_paths[unit_idx]
    bits = spec.n_bits[unit_idx]
    layer = _get(params, path)
    w, b = layer["kernel"], layer["bias"]
    kernel_size = w.shape[0]
    stride, act, _ = _unit_meta(model, "", unit_idx)
    if not include_act:
        stride, act = 1, None

    t0 = time.time()
    io = harvest_unit_io(model, params, "", spec, cali_data)
    log_fn("Cached init time: {}".format(time.time() - t0))
    x_fp, y_fp = io[unit_idx]
    if not include_act:
        # layer mode reconstructs the raw conv output: recompute cheaply
        y_fp = _apply_unit(x_fp, w, b, 1, kernel_size, None)

    # AdaRound state for this unit (reference block recon inits from the raw
    # weight, calib_block.py:124-125; network-wise uses hadamard domain)
    sub = adaround_upgrade(params, spec, state)
    ustate = sub[name]
    temp = LinearTempDecay(iters, rel_start_decay=warmup,
                           start_b=b_range[0], end_b=b_range[1])
    loss_start = iters * warmup
    opt = optax.adam(lr, eps=1e-8)

    tr = {"w_alpha": ustate["w_alpha"], "b_alpha": ustate["b_alpha"]}
    frozen = {k: v for k, v in ustate.items() if k not in tr}
    opt_state = opt.init(tr)
    cin = w.shape[2]

    def fq_unit(tr, count):
        st = {**frozen, **tr}
        wd = _hadamard_weight(w) if spec.hadamard else w
        wq = Q.adaround_fake_quant(wd, st["w_delta"], st["w_zp"],
                                   st["w_alpha"], bits, soft=True)
        if spec.hadamard:
            wq = fwht(wq, axis=2)[:, :, :cin, :]
        bq = Q.adaround_fake_quant(b, st["b_delta"], st["b_zp"],
                                   st["b_alpha"], bits, soft=True)
        return wq, bq

    # cached activations flow through as jit args (closure capture would
    # embed them as HLO constants)
    def loss_at(tr, x_fp, y_fp, idx, count):
        wq, bq = fq_unit(tr, count)
        pred = _apply_unit(x_fp[idx], wq, bq, stride, kernel_size, act)
        rec = lp_loss(pred, y_fp[idx], p=p)
        btemp = temp(count)
        reg = jnp.where(count >= loss_start,
                        weight * Q.adaround_reg(tr["w_alpha"], btemp), 0.0)
        return rec + reg, (rec, reg)

    n_cached = x_fp.shape[0]
    rng = jax.random.PRNGKey(seed)

    @jax.jit
    def run_chunk(tr, opt_state, count0, idxs, x_fp, y_fp):
        def step(carry, idx):
            tr, opt_state, count = carry
            count = count + 1
            (l, aux), g = jax.value_and_grad(loss_at, has_aux=True)(
                tr, x_fp, y_fp, idx, count)
            updates, opt_state = opt.update(g, opt_state, tr)
            tr = optax.apply_updates(tr, updates)
            return (tr, opt_state, count), l
        (tr, opt_state, count), losses = jax.lax.scan(
            step, (tr, opt_state, count0), idxs)
        return tr, opt_state, count, losses

    chunk = 500
    count = jnp.asarray(0, jnp.int32)
    done = 0
    while done < iters:
        todo = min(chunk, iters - done)
        rng, r = jax.random.split(rng)
        idxs = jax.random.randint(r, (todo, batch_size), 0, n_cached)
        tr, opt_state, count, losses = run_chunk(tr, opt_state, count, idxs,
                                                 x_fp, y_fp)
        done += todo
        log_fn(f"[unit {unit_idx} {name}] iter {done}/{iters} "
               f"loss {float(losses[-1]):.5f}")

    new_state = dict(state)
    new_state[name] = {**frozen, **jax.tree_util.tree_map(jnp.asarray, tr)}
    return new_state


def block_reconstruction(model, params, spec, state, block_idx, cali_data,
                         **kw):
    """BRECQ-style block calibration (calib_block.py:91-183)."""
    return unit_reconstruction(model, params, spec, state, block_idx,
                               cali_data, include_act=True, **kw)


def layer_reconstruction(model, params, spec, state, layer_idx, cali_data,
                         **kw):
    """AdaRound per-layer calibration; the reference version is broken at
    this commit (calib_layer.py:130 NameError) — functional here."""
    return unit_reconstruction(model, params, spec, state, layer_idx,
                               cali_data, include_act=False, **kw)
