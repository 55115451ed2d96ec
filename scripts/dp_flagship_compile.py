"""Flagship-shape DP evidence (VERDICT r3 item 6): compile the FULL-SIZE
640x1280 batch-16 8-device data-parallel phase-2 calibration epoch program
on the virtual CPU mesh and report its per-device memory analysis.

dp_batch_demo validated batch-16 DP calibration QUALITY at a tiny crop;
MULTICHIP dryruns compile+run the sharded program at tiny shapes. What was
missing is evidence that the FLAGSHIP-shape sharded program fits per-chip
HBM (PNeRV's HVP already hit the 15.75 GB ceiling at batch 2). This script
AOT-compiles (jit(...).lower(...).compile()) the same epoch program
quantization/calibrate.py's _run_phase jits — pre-gathered epoch batches,
lax.scan over steps, value_and_grad of the packed-cf loss, optax.adam,
frames/cali sharded over the 'data' mesh axis — at the real Bunny shapes,
and prints jax's compiled memory analysis per device. Buffer sizes are
dominated by array bytes (params + epoch batches + batch-2-per-device
decode activations + Adam state), which are layout-portable CPU vs TPU;
the Pallas tail is TPU-only, so the compiled decode here is the jnp twin —
its activation footprint upper-bounds the fused path's (the fused tail
materializes strictly fewer intermediates).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     PALLAS_AXON_POOL_IPS= python scripts/dp_flagship_compile.py
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import json
from functools import partial

import jax.numpy as jnp
import numpy as np
import optax

from neuroquant_tpu.config import get_config
from neuroquant_tpu.metrics import lp_loss  # noqa: F401 (parity import)
from neuroquant_tpu.models import build_model, tail_plan_for
from neuroquant_tpu.ops.tail_fused import border_mask, pack_targets
from neuroquant_tpu.parallel import make_mesh
from neuroquant_tpu.quantization import init_quant_state, make_spec
from neuroquant_tpu.quantization.calibrate import (
    LinearTempDecay, _merge_state, _split_state,
)
from neuroquant_tpu.quantization.qmodel import (
    adaround_upgrade, quantize_params, round_loss,
)

BATCH = 16
DEVICES = 8
N_FRAMES = 132
STEPS = N_FRAMES // BATCH          # 8 steps/epoch at batch 16


def human(n):
    for u in ("B", "KB", "MB", "GB"):
        if abs(n) < 1024:
            return f"{n:.2f} {u}"
        n /= 1024
    return f"{n:.2f} TB"


def main():
    cfg = get_config("configs/HNeRV/Bunny_1280x640_3M.yaml")
    model = build_model("hnerv", cfg)
    mesh = make_mesh(DEVICES)

    # abstract inputs only — nothing full-size is materialized on the host
    frames_s = jax.ShapeDtypeStruct((N_FRAMES, 640, 1280, 3), jnp.float32)
    params = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros((1, 640, 1280, 3))),
        jax.random.PRNGKey(0))
    cali_s = jax.eval_shape(
        lambda p, f: model.apply(p, f, method="encode"), params, frames_s)

    spec = make_spec("hnerv", cfg, channel_wise=True, scale_method="max",
                     hadamard=True).with_bits([6, 5, 4, 5, 5, 6, 6])
    state_s = jax.eval_shape(
        lambda p: adaround_upgrade(p, spec, init_quant_state(p, spec)),
        params)
    tstate_s, frozen_s = _split_state(
        state_s, ("w_alpha", "b_alpha"))

    plan, fpk, ch = tail_plan_for("hnerv", cfg)
    gt_s = jax.eval_shape(lambda f: pack_targets(f, plan, fpk), frames_s)
    mask_cf = border_mask(plan, ch=ch)
    denom = float(cfg["crop_h"] * cfg["crop_w"])

    opt = optax.adam(0.003, eps=1e-8)
    opt_state_s = jax.eval_shape(lambda t: opt.init(t), tstate_s)
    temp = LinearTempDecay(21120, rel_start_decay=0.2, start_b=20, end_b=2)

    train_ind = jnp.arange(N_FRAMES, dtype=jnp.int32)

    # --- the phase-2 epoch program, mirroring calibrate.py _run_phase ---
    def loss_at(tstate, frozen, params, img, inputs, count):
        st = _merge_state(tstate, frozen)
        qp = quantize_params(params, spec, st, mode="adaround", soft=True)
        pred = model.apply(qp, inputs, method="decode_cf").astype(jnp.float32)
        diff = (pred - img) * mask_cf
        rec = (diff * diff).sum() / (img.shape[0] * denom)
        rnd = round_loss(st, spec, temp(count), 0.01)
        return rec + rnd, (rec, rnd)

    @partial(jax.jit, donate_argnums=(0, 2))
    def run_epoch(tstate, frozen, opt_state, count, erng, params, gt_all,
                  cali):
        perm = jax.random.permutation(erng, train_ind)
        batches = perm[:STEPS * BATCH].reshape(STEPS, BATCH)
        gt_ep = gt_all[batches]
        in_ep = cali[batches]
        from jax.sharding import NamedSharding, PartitionSpec as P
        gt_ep = jax.lax.with_sharding_constraint(
            gt_ep, NamedSharding(mesh, P(None, "data")))
        in_ep = jax.lax.with_sharding_constraint(
            in_ep, NamedSharding(mesh, P(None, "data")))

        def step(carry, xs):
            tstate, opt_state, count = carry
            img, inputs = xs
            count = count + 1
            (loss, aux), grads = jax.value_and_grad(
                loss_at, has_aux=True)(tstate, frozen, params, img, inputs,
                                       count)
            updates, opt_state = opt.update(grads, opt_state, tstate)
            tstate = optax.apply_updates(tstate, updates)
            return (tstate, opt_state, count), loss

        (tstate, opt_state, count), losses = jax.lax.scan(
            step, (tstate, opt_state, count), (gt_ep, in_ep))
        return tstate, opt_state, count, losses

    print(f"[dp] lowering the batch-{BATCH} x {DEVICES}-device flagship "
          f"epoch program ({STEPS} steps, 640x1280)...")
    lowered = run_epoch.lower(
        tstate_s, frozen_s, opt_state_s,
        jax.ShapeDtypeStruct((), jnp.int32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
        params, gt_s, cali_s)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    print("[dp] compiled OK")
    report = {}
    if ma is not None:
        report = {
            "argument_size": int(getattr(ma, "argument_size_in_bytes", 0)),
            "output_size": int(getattr(ma, "output_size_in_bytes", 0)),
            "temp_size": int(getattr(ma, "temp_size_in_bytes", 0)),
            "generated_code_size": int(
                getattr(ma, "generated_code_size_in_bytes", 0)),
            "alias_size": int(getattr(ma, "alias_size_in_bytes", 0)),
        }
        for k, v in report.items():
            print(f"[dp] {k}: {human(v)}")
        # donation aliases the carried state; peak live ~ args + temps
        peak = (report["argument_size"] + report["temp_size"]
                - report["alias_size"])
        print(f"[dp] peak live estimate (args + temps - aliased): "
              f"{human(peak)}")
        report["peak_live_estimate"] = int(peak)
    else:
        print("[dp] memory_analysis unavailable on this backend")

    # per-device view: sharded batches divide by the mesh; replicated
    # params/state/GT do not. Report the dominant replicated arrays too.
    nbytes = lambda t: sum(int(np.prod(l.shape)) * l.dtype.itemsize
                           for l in jax.tree_util.tree_leaves(t))
    sizes = {
        "frames_packed_gt (replicated, HBM-resident)": nbytes(gt_s),
        "cali_embeddings (replicated)": nbytes(cali_s),
        "params (replicated)": nbytes(params),
        "quant_state+adam (replicated)": nbytes(tstate_s) * 3 + nbytes(frozen_s),
        "epoch batches (sharded /8)": (nbytes(gt_s) + nbytes(cali_s))
        * STEPS * BATCH // N_FRAMES // DEVICES,
    }
    for k, v in sizes.items():
        print(f"[dp] {k}: {human(v)}")

    out = {"batch": BATCH, "devices": DEVICES, "steps": STEPS,
           "compiled": True, "memory_analysis": report,
           "array_sizes": {k: int(v) for k, v in sizes.items()}}
    os.makedirs("results", exist_ok=True)
    with open("results/dp_flagship_compile.json", "w") as f:
        json.dump(out, f, indent=1)
    print("[dp] wrote results/dp_flagship_compile.json")


if __name__ == "__main__":
    main()
