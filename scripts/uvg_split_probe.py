"""Split-Pallas vs XLA-packed decode at the UVG f=6 geometry.

The UVG HNeRV tail's cost-model pack start (f=6) produces layers whose
one-call working set exceeded VMEM before the upatches mode landed; this
probe originally settled whether the cout-row split execution beats the
XLA packed path it demoted to (it does: 221.6 vs 151.2 FPS, which made
split-feasible plans the 'auto' choice), and now doubles as the UVG
regression probe after kernel changes. Three executions of the SAME
decode on synthetic UVG embeddings:

  auto    -> the models' gate_fused_impl choice (now Pallas, 240+ FPS)
  pallas  -> fused tail forced (split or one-call per the plan)
  jnp     -> channels-first jnp twin (for scale)

Usage: python scripts/uvg_split_probe.py [--arch hnerv] [--frames 8]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="hnerv", choices=["hnerv", "nerv"])
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()
    rng = np.random.RandomState(0)

    cfgp = {"hnerv": "configs/HNeRV/UVG_1920x960_3M.yaml",
            "nerv": "configs/NeRV/UVG_1920x960_3M.yaml"}[args.arch]
    base = get_config(cfgp)
    if args.arch == "nerv":
        base["n_frames"] = args.frames

    frames = jnp.asarray(
        rng.rand(args.frames, base["crop_h"], base["crop_w"], 3),
        jnp.float32)

    emb = None
    for impl in ("auto", "pallas", "jnp"):
        cfg = dict(base)
        cfg["fused_tail"] = impl
        model = build_model(args.arch, cfg)
        if args.arch == "hnerv":
            params = model.init(jax.random.PRNGKey(0), frames[:1])
        else:
            params = model.init(jax.random.PRNGKey(0), jnp.asarray([0.1]))
        if emb is None:
            enc = jax.jit(lambda p, x: model.apply(p, x, method="encode"))
            if args.arch == "hnerv":
                emb = jnp.concatenate([enc(params, frames[i:i + 1])
                                       for i in range(args.frames)])
            else:
                emb = enc(params, jnp.linspace(
                    0.05, 0.95, args.frames, dtype=jnp.float32))
        fps = measure_decode_fps(model, params, emb, 1)
        print(f"[uvg {base['crop_h']}x{base['crop_w']}] {args.arch} "
              f"fused_tail={impl}: decode {fps:.1f} FPS/chip "
              f"({1000.0 / fps:.2f} ms/frame)", flush=True)


if __name__ == "__main__":
    main()
