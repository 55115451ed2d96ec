"""Microbenchmark: packed-tail decode vs unpacked on the real TPU.

Times device-side decode FPS (batch 1) and a short phase-2-style calibration
run for HNeRV/NeRV Bunny shapes with random weights (timing only — numerics
are covered by tests/test_packed_decode.py).

Usage: python scripts/micro_decode.py [hnerv|nerv|calib|all]
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
from neuroquant_tpu.methods.common import measure_decode_fps
from neuroquant_tpu.models import build_model


def bench_decode(arch: str, variants):
    cfg = get_config(f"configs/{arch.upper().replace('NERV', 'NeRV')}/Bunny_1280x640_3M.yaml")
    if arch == "nerv":
        cfg["n_frames"] = 132
    for name, overrides in variants:
        c = dict(cfg, **overrides)
        model = build_model(arch, c)
        rng = jax.random.PRNGKey(0)
        if arch != "nerv":
            x = jnp.zeros((1, c["crop_h"], c["crop_w"], 3), jnp.float32)
            params = model.init(rng, x)
            emb = jax.jit(lambda p, x: model.apply(p, x, method="encode"))(params, x)
        else:
            params = model.init(rng, jnp.asarray([0.0]))
            emb = jax.jit(lambda p, x: model.apply(p, x, method="encode"))(
                params, jnp.asarray([0.0]))
        emb = jnp.concatenate([emb] * 8, 0)
        fps = measure_decode_fps(model, params, emb, 1, n_iters=400)
        print(f"{arch:6s} {name:16s} decode {fps:8.1f} FPS  "
              f"({1000.0 / fps:.2f} ms/frame)")


def bench_calib(overrides, tag, arch="hnerv", iters=264, batch=2, bits=None):
    from neuroquant_tpu.quantization import init_quant_state, make_spec
    from neuroquant_tpu.quantization.calibrate import model_reconstruction

    cfg = get_config("configs/HNeRV/Bunny_1280x640_3M.yaml")
    cfg.update(overrides)
    model = build_model(arch, cfg)
    h, w = cfg["crop_h"], cfg["crop_w"]
    frames = jnp.asarray(np.random.RandomState(0).rand(132, h, w, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(903), frames[:1])
    cali = jax.jit(lambda p, x: model.apply(p, x, method="encode"))(params, frames)
    spec = make_spec(arch, cfg, channel_wise=True, scale_method="max",
                     hadamard=True).with_bits(bits or [6, 5, 4, 5, 5, 6, 6])
    state = init_quant_state(params, spec)
    train_ind = list(range(132))
    times = []

    def hook(e, count, st=None):
        if st is not None:   # sync: the calib loop dispatches epochs ahead
            jax.block_until_ready(jax.tree_util.tree_leaves(st)[0])
        times.append(time.time())

    model_reconstruction(model, params, spec, state, cali, frames, train_ind,
                         arch=arch, batch_size=batch, iters=iters, weight=0.01,
                         b_range=(20, 2), warmup=0.2, lr=0.003, seed=903,
                         log_fn=lambda m: None, epoch_hook=hook)
    spe = 132 // batch
    if len(times) >= 3:
        dt = (times[-1] - times[1]) / (len(times) - 2)
        print(f"calib  {tag:16s} {spe / dt:8.1f} it/s  ({dt:.2f} s/epoch of {spe} steps)")
    else:
        print(f"calib  {tag:16s} too few epochs")


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("hnerv", "all"):
        bench_decode("hnerv", [("fused(auto)", {}), ("fused_off", {"fused_tail": "off"}), ("unpacked", {"packed_tail": "off"})])
    if what == "tsweep":
        # pack-start sweep under the FUSED kernels: the XLA padded-cost model
        # picked t=3, but the Pallas kernels don't pay 128-lane channel
        # padding, so the kp^2 kernel inflation of early packing may not pay
        for arch in ("hnerv", "nerv"):
            bench_decode(arch, [(f"t{t}", {"packed_tail": t})
                                for t in (2, 3, 4)])
    if what in ("nerv", "all"):
        bench_decode("nerv", [("fused(auto)", {}), ("fused_off", {"fused_tail": "off"})])
    if what in ("pnerv", "all"):
        bench_decode("pnerv", [("fused(auto)", {}), ("fused_off", {"fused_tail": "off"}), ("unpacked", {"packed_tail": "off"})])
    if what in ("calib", "all"):
        bench_calib({}, "packed(auto)")
        bench_calib({"packed_tail": "off"}, "unpacked")
    if what == "pnerv_calib":
        from neuroquant_tpu.config import get_config as _gc
        pc = _gc("configs/PNeRV/Bunny_1280x640_3M.yaml")
        n = 1 + len(pc["kfc_strides"]) + 3 * (len(pc["kfc_strides"]) - 1) + 1
        bench_calib(dict(pc), "pnerv packed", arch="pnerv", bits=[5] * n)
        bench_calib(dict(pc, packed_tail="off"), "pnerv unpacked",
                    arch="pnerv", bits=[5] * n)
