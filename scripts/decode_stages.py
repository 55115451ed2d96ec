"""Stage breakdown of the fused decode on the real TPU.

Times nested prefixes of the HNeRV/NeRV decode pipeline (batch 1, the
eval/FPS shape): embed -> XLA prefix blocks -> nhwc_to_cf layout ->
Pallas tail -> unpack kernel. Successive differences locate where the
2.5 ms/frame actually goes vs the ~0.5 ms analytic tail floor.

Usage: python scripts/decode_stages.py [--arch hnerv|nerv] [--batch N]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from neuroquant_tpu.config import get_config
from neuroquant_tpu.models import build_model
from neuroquant_tpu.models.layers import pixel_shuffle, collect_tail_params
from neuroquant_tpu.ops import tail_fused as tf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="hnerv")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    cfgp = ("configs/HNeRV/Bunny_1280x640_3M.yaml" if args.arch == "hnerv"
            else "configs/NeRV/Bunny_1280x640_3M.yaml")
    cfg = get_config(cfgp)
    model = build_model(args.arch, cfg)

    if args.arch == "hnerv":
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((args.batch, cfg["crop_h"],
                                       cfg["crop_w"], 3), jnp.float32))
        emb = jnp.asarray(np.random.RandomState(0)
                          .randn(args.batch, 2, 4, 16) * 0.1, jnp.float32)
    else:
        idx = jnp.linspace(0.1, 0.9, args.batch).astype(jnp.float32)
        params = model.init(jax.random.PRNGKey(0), idx)
        emb = jax.jit(lambda p, i: model.apply(p, i, method="encode"))(
            params, idx)

    def stage(name):
        def deco(fn):
            return (name, fn)
        return deco

    def prefix(mdl, e):
        c = mdl.cfg
        x = mdl.decoder0(e)
        if args.arch == "hnerv":
            x = pixel_shuffle(x, (c.fc_h, c.fc_w))
        for j in range(mdl.pack_start):
            x = mdl.blocks[j](x)
        return x

    def upto_cf(mdl, e):
        x = prefix(mdl, e)
        blocks, head = collect_tail_params(mdl.blocks, mdl.head_layer,
                                           mdl.pack_start,
                                           mdl.cfg.decoder_channels(), x)
        h, w = int(x.shape[1]), int(x.shape[2])
        plan, kks, bms, f, ch = tf.plan_and_pack(h, w, blocks, head)
        x_cf, kks_c, bms_c, _ = tf._mxu_cast(tf.nhwc_to_cf(x, plan), kks,
                                             bms, x.dtype)
        return x_cf, kks_c, bms_c, plan, f, ch

    def upto_tail(mdl, e):
        x_cf, kks_c, bms_c, plan, f, ch = upto_cf(mdl, e)
        z = tf.tail_apply(plan, x_cf, kks_c, bms_c)
        return z, plan, f, ch

    def full(mdl, e):
        return mdl.decode(e)

    stages = [
        ("prefix (XLA blocks)", lambda m, e: prefix(m, e)),
        ("+ nhwc_to_cf/cast", lambda m, e: upto_cf(m, e)[0]),
        ("+ pallas tail", lambda m, e: upto_tail(m, e)[0]),
        ("full decode (+unpack)", full),
    ]

    n = args.iters
    prev = 0.0
    for name, fn in stages:
        @jax.jit
        def loop(params, emb):
            def body(acc, i):
                pert = (1.0 + 1e-6 * i).astype(emb.dtype)
                out = model.apply(params, emb * pert, method=fn)
                leaves = jax.tree_util.tree_leaves(out)
                return acc + sum(jnp.sum(l.astype(jnp.float32))
                                 for l in leaves), None
            acc, _ = jax.lax.scan(body, 0.0, jnp.arange(n))
            return acc

        # block_until_ready does NOT synchronize through the tunneled
        # backend — only a host fetch does (see scripts/tail_layer_bench.py):
        # fetch the scalar accumulator and subtract the fetch round trip
        from scripts.tail_layer_bench import fetch_baseline
        float(loop(params, emb))
        t0 = time.time()
        float(loop(params, emb))
        ms = (time.time() - t0 - fetch_baseline()) / n * 1e3
        print(f"{name:24s}: {ms:7.3f} ms  (+{ms - prev:6.3f})")
        prev = ms


if __name__ == "__main__":
    main()
