"""UVG-scale (960x1920) performance on the real TPU with synthetic frames.

The paper's RD comparisons live at UVG 1080p; no UVG data ships with either
repo (see README), but the kernels' behavior at that geometry is a real
question: the UVG tail packs at f=6 (strides [...,3,2]) vs Bunny's f=4, the
flagship sweep pins do not apply (different channel geometry), and the grid
is 2.25x larger. This measures what BASELINE.md tracks — decode FPS/chip
and calibration iters/s — for HNeRV and NeRV at the UVG crop, so the
Bunny-vs-UVG scaling of both numbers is on record.

Usage: python scripts/uvg_perf.py [--frames N]
"""

import argparse
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
from neuroquant_tpu.methods.common import measure_decode_fps
from neuroquant_tpu.models import build_model, tail_plan_for
from neuroquant_tpu.quantization import init_quant_state, make_spec
from neuroquant_tpu.quantization.calibrate import model_reconstruction


def calib_rate(arch, cfg, model, params, frames, cali, nbits):
    """Short network-wise calibration (identical per-step compute to the
    21k run); returns the MEDIAN steady per-epoch phase-2 rate, measured
    exactly like bench.py — an epoch_hook that blocks on the epoch's
    output state. Whole-phase walls at ~250 steps are dominated by
    tracing/cache loads (the round-3 'noise band', and the r4 warm run
    even measured slower than the cold one); per-epoch rates past the
    first epoch are the real number."""
    spec = make_spec(arch, cfg, channel_wise=True, scale_method="max",
                     hadamard=True).with_bits(nbits)
    state = init_quant_state(params, spec)
    cf_pack = None
    tp = tail_plan_for(arch, cfg)
    if tp is not None:
        from neuroquant_tpu.ops.tail_fused import border_mask, pack_targets
        plan, f, ch = tp
        cf_pack = {"gt": pack_targets(frames, plan, f),
                   "mask": border_mask(plan, ch=ch),
                   "denom": cfg["crop_h"] * cfg["crop_w"]}
    n = frames.shape[0]
    batch = 2
    spe = n // batch
    last = {"t": None, "count": 0}
    rates = []

    def epoch_hook(e, count, st=None):
        if st is not None:
            jax.block_until_ready(jax.tree_util.tree_leaves(st)[0])
        now = time.time()
        if last["t"] is not None and e > 0:      # first epoch = compile
            rates.append((count - last["count"]) / max(now - last["t"], 1e-9))
        last["t"], last["count"] = now, count

    model_reconstruction(
        model, params, spec, state, cali, frames, list(range(n)), arch=arch,
        batch_size=batch, iters=64 * spe, weight=0.01, b_range=(20, 2),
        warmup=0.1, p=2.0, lr=0.003, seed=903, log_fn=lambda *_: None,
        cf_pack=cf_pack, epoch_hook=epoch_hook)
    if not rates:
        return float("nan")
    rates.sort()
    return rates[len(rates) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()
    rng = np.random.RandomState(0)

    for arch, cfgp, nbits in (
            ("hnerv", "configs/HNeRV/UVG_1920x960_3M.yaml",
             [6, 5, 4, 5, 5, 6, 6]),
            ("nerv", "configs/NeRV/UVG_1920x960_3M.yaml",
             [6, 5, 5, 6, 7, 6, 7])):
        cfg = get_config(cfgp)
        if arch == "nerv":
            cfg["n_frames"] = args.frames
        model = build_model(arch, cfg)
        frames = jnp.asarray(
            rng.rand(args.frames, cfg["crop_h"], cfg["crop_w"], 3),
            jnp.float32)
        if arch == "hnerv":
            params = model.init(jax.random.PRNGKey(0), frames[:1])
        else:
            params = model.init(jax.random.PRNGKey(0), jnp.asarray([0.1]))
        enc = jax.jit(lambda p, x: model.apply(p, x, method="encode"))
        if arch == "hnerv":
            emb = jnp.concatenate([enc(params, frames[i:i + 1])
                                   for i in range(args.frames)])
        else:
            emb = enc(params, jnp.linspace(0.05, 0.95, args.frames,
                                           dtype=jnp.float32))
        fps = measure_decode_fps(model, params, emb, 1)
        rate = calib_rate(arch, cfg, model, params, frames, emb, nbits)
        print(f"[uvg 960x1920] {arch}: decode {fps:.1f} FPS/chip, "
              f"calib steady {rate:.1f} it/s (batch 2, median epoch)")


if __name__ == "__main__":
    main()
