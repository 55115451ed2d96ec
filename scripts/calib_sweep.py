"""Calibration-throughput sweep over the round-3 execution knobs.

Short (but per-step-identical) HNeRV-Bunny network-wise calibrations through
model_reconstruction, reporting steady-state phase-2 iters/s for combinations
of: packed-domain cf loss, fused Pallas tail, bf16 compute dtype.

Usage: python scripts/calib_sweep.py [config ...]
  config tokens: base | cf | cf+pallas | cf+bf16 | cf+pallas+bf16 | bf16 ...
  (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from neuroquant_tpu.config import get_config
from neuroquant_tpu.models import build_model, tail_plan_for
from neuroquant_tpu.quantization import init_quant_state, make_spec
from neuroquant_tpu.quantization.calibrate import model_reconstruction

ITERS = 462        # 7 phase-2 epochs at 66 steps (batch 2)
BATCH = 2


def run(tag: str, iters=ITERS, batch=BATCH):
    toks = set(tag.split("+"))
    cfg = get_config("configs/HNeRV/Bunny_1280x640_3M.yaml")
    cfg["fused_tail"] = "auto" if "pallas" in toks else "off"  # noqa
    model = build_model("hnerv", cfg)
    h, w = cfg["crop_h"], cfg["crop_w"]
    frames = jnp.asarray(np.random.RandomState(0).rand(132, h, w, 3),
                         jnp.float32)
    params = model.init(jax.random.PRNGKey(903), frames[:1])
    cali = jax.jit(lambda p, x: model.apply(p, x, method="encode"))(
        params, frames)
    spec = make_spec("hnerv", cfg, channel_wise=True, scale_method="max",
                     hadamard=True).with_bits([6, 5, 4, 5, 5, 6, 6])
    state = init_quant_state(params, spec)

    cf_pack = None
    if "cf" in toks:
        from neuroquant_tpu.ops.tail_fused import border_mask, pack_targets
        plan, f, ch = tail_plan_for("hnerv", cfg)
        cf_pack = {"gt": pack_targets(frames, plan, f),
                   "mask": border_mask(plan, ch=ch), "denom": h * w}

    times = []

    def hook(e, count, st=None):
        if st is not None:   # sync: the calib loop dispatches epochs ahead
            jax.block_until_ready(jax.tree_util.tree_leaves(st)[0])
        times.append((time.time(), count))

    t0 = time.time()
    model_reconstruction(
        model, params, spec, state, cali, frames, list(range(132)),
        batch_size=batch, iters=iters, weight=0.01, b_range=(20, 2),
        warmup=0.2, lr=0.003, seed=903, log_fn=lambda m: None,
        compute_dtype=jnp.bfloat16 if "bf16" in toks else None,
        epoch_hook=hook, cf_pack=cf_pack)
    total = time.time() - t0
    if len(times) >= 3:
        # drop the first phase-2 epoch (compile)
        dt = times[-1][0] - times[1][0]
        its = times[-1][1] - times[1][1]
        print(f"{tag:18s} {its / dt:7.1f} it/s steady "
              f"(total {total:.1f}s incl compile)", flush=True)
    else:
        print(f"{tag:18s} too few epochs (total {total:.1f}s)", flush=True)


if __name__ == "__main__":
    tags = sys.argv[1:] or ["base", "cf", "cf+pallas", "bf16",
                            "cf+bf16", "cf+pallas+bf16"]
    for t in tags:
        run(t)
