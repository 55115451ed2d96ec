"""Serving-batch decode throughput (frames/sec/chip) for the RESULTS table.

measure_decode_fps at batch 1/4/8 on the flagship Bunny configs (weight
values don't affect kernel throughput, so random-init params measure the
same program the trained checkpoints run).

Usage: python scripts/serving_batch.py [--arch hnerv|nerv|all]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from neuroquant_tpu.config import get_config
from neuroquant_tpu.methods.common import measure_decode_fps
from neuroquant_tpu.models import build_model


def one(arch):
    cfgp = {"hnerv": "configs/HNeRV/Bunny_1280x640_3M.yaml",
            "nerv": "configs/NeRV/Bunny_1280x640_3M.yaml"}[arch]
    cfg = get_config(cfgp)
    rng = np.random.RandomState(0)
    model = build_model(arch, cfg)
    n = 8
    if arch == "hnerv":
        frames = jnp.asarray(
            rng.rand(1, cfg["crop_h"], cfg["crop_w"], 3), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), frames)
        enc = jax.jit(lambda p, x: model.apply(p, x, method="encode"))
        emb = jnp.concatenate([enc(params, frames) for _ in range(n)])
    else:
        params = model.init(jax.random.PRNGKey(0), jnp.asarray([0.1]))
        enc = jax.jit(lambda p, t: model.apply(p, t, method="encode"))
        emb = enc(params, jnp.linspace(0.05, 0.95, n, dtype=jnp.float32))
    for b in (1, 4, 8):
        fps = measure_decode_fps(model, params, emb, b)
        print(f"[serving] {arch} batch {b}: {fps:.1f} FPS/chip")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="all")
    args = ap.parse_args()
    for arch in (("hnerv", "nerv") if args.arch == "all" else (args.arch,)):
        one(arch)


if __name__ == "__main__":
    main()
