"""Where does the calibration step spend its time? Times the jitted pieces
separately at the bench shape (HNeRV-3M, batch 2, Hadamard, CW, adaround).

Each piece runs as a lax.scan of REPS iterations inside one device program.
Every scan body consumes the iteration index (frame indices rotate; the
quant state gets an i*1e-30 alpha nudge) — without this XLA hoists the
loop-invariant body out of the scan and the timing collapses to ~0 (the
first version of this script measured exactly that)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from neuroquant_tpu.config import get_config
from neuroquant_tpu.metrics import lp_loss
from neuroquant_tpu.models import build_model
from neuroquant_tpu.quantization import init_quant_state, make_spec
from neuroquant_tpu.quantization.qmodel import (
    adaround_upgrade, quantize_params, round_loss,
)

REPS = 50
BATCH = 2
NFRAMES = 16


def main():
    global NFRAMES
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/HNeRV/Bunny_1280x640_3M.yaml")
    ap.add_argument("--frames", type=int, default=NFRAMES)
    args = ap.parse_args()
    NFRAMES = args.frames
    cfg = get_config(args.config)
    model = build_model("hnerv", cfg)
    frames = jnp.asarray(
        np.random.RandomState(0).rand(NFRAMES, cfg["crop_h"], cfg["crop_w"],
                                      3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(903), frames[:1])
    cali = jax.jit(lambda p, x: model.apply(p, x, method="encode"))(
        params, frames)
    spec = make_spec("hnerv", cfg, channel_wise=True, scale_method="max",
                     hadamard=True).with_bits([6, 5, 4, 5, 5, 6, 6])
    state = adaround_upgrade(params, spec, init_quant_state(params, spec))

    def nudge(st, i):
        # per-iteration perturbation so the body is not loop-invariant
        fi = i.astype(jnp.float32)
        return {ln: {k: (v + fi * 1e-30 if k == "w_alpha" else v)
                     for k, v in s.items()} for ln, s in st.items()}

    def bench(name, body):
        @jax.jit
        def run(state, params, frames, cali):
            def step(acc, i):
                idx = (i + jnp.arange(BATCH)) % NFRAMES
                return acc + body(nudge(state, i), params, frames, cali, idx), None
            acc, _ = jax.lax.scan(step, 0.0, jnp.arange(REPS))
            return acc
        jax.block_until_ready(run(state, params, frames, cali))
        t0 = time.time()
        jax.block_until_ready(run(state, params, frames, cali))
        print(f"{name:34s} {(time.time()-t0)/REPS*1000:7.2f} ms/iter")

    bench("quantize_params(adaround)", lambda st, p, f, c, idx: sum(
        jnp.sum(x) for x in jax.tree_util.tree_leaves(
            quantize_params(p, spec, st, mode="adaround"))))

    qp = quantize_params(params, spec, state, mode="adaround")
    bench("decode fwd (pre-quantized)",
          lambda st, p, f, c, idx: model.apply(
              qp, c[idx], method="decode").mean() + st["head_layer"]["w_alpha"].sum() * 0)

    # the PRODUCTION loss: packed channels-first domain (calibrate.py)
    from neuroquant_tpu.models import tail_plan_for
    from neuroquant_tpu.ops.tail_fused import border_mask, pack_targets
    plan, fpk, ch = tail_plan_for("hnerv", cfg)
    print(f"plan f={fpk} grid {plan.h}x{plan.w}")
    gt_cf = pack_targets(frames, plan, fpk)
    mask_cf = border_mask(plan, ch=ch)
    denom = cfg["crop_h"] * cfg["crop_w"]

    def full_loss(st, p, f, c, idx):
        q = quantize_params(p, spec, st, mode="adaround")
        pred = model.apply(q, c[idx], method="decode_cf") * mask_cf
        rec = jnp.sum((pred - gt_cf[idx] * mask_cf) ** 2) / (idx.shape[0]
                                                             * denom)
        return rec + round_loss(st, spec, 10.0, 0.01)

    bench("loss fwd (packed cf, production)", full_loss)

    # ---- round-5 isolation probes ----
    bench("decode_cf fwd (pre-quantized)",
          lambda st, p, f, c, idx: model.apply(
              qp, c[idx], method="decode_cf").sum()
          + st["head_layer"]["w_alpha"].sum() * 0)

    def loss_nr(st, p, f, c, idx):
        q = quantize_params(p, spec, st, mode="adaround")
        pred = model.apply(q, c[idx], method="decode_cf") * mask_cf
        return jnp.sum((pred - gt_cf[idx] * mask_cf) ** 2) / (idx.shape[0]
                                                              * denom)

    bench("loss fwd (no round_loss)", loss_nr)
    bench("round_loss alone",
          lambda st, p, f, c, idx: round_loss(st, spec, 10.0, 0.01))

    def vag_no_round(st, p, f, c, idx):
        loss, g = jax.value_and_grad(loss_nr)(st, p, f, c, idx)
        return loss + sum(jnp.sum(x) * 1e-30
                          for x in jax.tree_util.tree_leaves(g))

    bench("fwd+bwd (no round_loss)", vag_no_round)

    def vag_qparams(st, p, f, c, idx):
        # gradient stops at the fake-quantized weights: isolates the
        # quant-chain VJP (pack-gather scatter + FWHT + rounding STEs)
        q = quantize_params(p, spec, nudge(st, idx[0]), mode="adaround")

        def ploss(q):
            pred = model.apply(q, c[idx], method="decode_cf") * mask_cf
            return jnp.sum((pred - gt_cf[idx] * mask_cf) ** 2) / (
                idx.shape[0] * denom)

        loss, g = jax.value_and_grad(ploss)(q)
        return loss + sum(jnp.sum(x) * 1e-30
                          for x in jax.tree_util.tree_leaves(g))

    bench("fwd+bwd wrt qparams (no quant VJP)", vag_qparams)

    def vag_consumed(st, p, f, c, idx):
        loss, g = jax.value_and_grad(full_loss)(st, p, f, c, idx)
        # consume every grad leaf so nothing is DCE'd
        return loss + sum(jnp.sum(x) * 1e-30
                          for x in jax.tree_util.tree_leaves(g))

    bench("fwd+bwd (grads consumed)", vag_consumed)

    def vag_tail_only(st, p, f, c, idx):
        # tail-only fwd+bwd for comparison: gradient wrt the cf input of
        # the fused tail (prefix excluded from the backward)
        q = quantize_params(p, spec, st, mode="adaround")
        def tail_loss(emb):
            pred = model.apply(q, emb, method="decode_cf") * mask_cf
            return jnp.sum((pred - gt_cf[idx] * mask_cf) ** 2) / (
                idx.shape[0] * denom)
        loss, g = jax.value_and_grad(tail_loss)(c[idx])
        return loss + jnp.sum(g) * 1e-30

    bench("fwd+bwd wrt embedding only", vag_tail_only)

    opt = optax.adam(0.003, eps=1e-8)

    @jax.jit
    def train(state, params, frames, cali):
        opt_state = opt.init(state)
        def step(carry, i):
            st, os_ = carry
            idx = (i + jnp.arange(BATCH)) % NFRAMES
            loss, g = jax.value_and_grad(full_loss)(st, params, frames, cali,
                                                    idx)
            up, os_ = opt.update(g, os_, st)
            return (optax.apply_updates(st, up), os_), loss
        (st, _), losses = jax.lax.scan(step, (state, opt_state),
                                       jnp.arange(REPS))
        return losses[-1]
    jax.block_until_ready(train(state, params, frames, cali))
    t0 = time.time()
    jax.block_until_ready(train(state, params, frames, cali))
    print(f"{'full step (grad + Adam)':34s} {(time.time()-t0)/REPS*1000:7.2f} ms/iter")


if __name__ == "__main__":
    main()
