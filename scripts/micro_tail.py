"""Microbenchmark: channels-first Pallas tail vs the XLA packed tail.

Runs the HNeRV-3M / NeRV-3M Bunny tail geometries (the calibration +
decode hot path) on one chip: forward only (decode) and forward+backward
(calibration step core), comparing ops/packed_decode (XLA convs) with
ops/tail_fused (Pallas kernels). Prints ms per invocation and max|diff|.

Usage: python scripts/micro_tail.py [--arch hnerv|nerv] [--batch N]
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

from neuroquant_tpu.ops import tail_fused as tf
from neuroquant_tpu.ops.packed_decode import (
    depth_to_space, packed_conv, upsample_conv_packed)


def gelu(v):
    return jax.nn.gelu(v, approximate=False)


def geometry(arch):
    if arch == "hnerv":
        # Bunny 640x1280: tail enters at 160x320x53 (pack_start=3)
        h, w, c0 = 160, 320, 53
        blocks = [(5, 53, 176, 2), (5, 44, 148, 2)]   # (k, cin, cout*r*r, r)
        head = (3, 37, 3)
    else:
        # NeRV-3M Bunny (chans [72,36,24,24,24], k=3): tail enters 160x320x24
        h, w, c0 = 160, 320, 24
        blocks = [(3, 24, 96, 2), (3, 24, 96, 2)]
        head = (3, 24, 3)
    return h, w, c0, blocks, head


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="hnerv")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--fwd_only", action="store_true")
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    h, w, c0, bl, hd = geometry(args.arch)
    rng = np.random.RandomState(0)
    blocks = []
    for (k, cin, crr, r) in bl:
        blocks.append((jnp.asarray(rng.randn(k, k, cin, crr) * .05, dt),
                       jnp.asarray(rng.randn(crr) * .05, dt), r))
    kh, cinh, couth = hd
    head = (jnp.asarray(rng.randn(kh, kh, cinh, couth) * .05, dt),
            jnp.asarray(rng.randn(couth) * .05, dt))
    x = jnp.asarray(rng.randn(args.batch, h, w, c0), dt)

    rs = [r for (_, _, r) in blocks]

    def oracle(x, ws, bs, head):
        f, perm, y = 1, None, x
        for (wk, b, r) in zip(ws, bs, rs):
            y, perm = upsample_conv_packed(y, wk, b, f, (r, r), in_perm=perm)
            y = gelu(y)
            f *= r
        y = packed_conv(y, head[0], head[1], f, in_perm=perm)
        return depth_to_space(y, f)

    def fused(x, ws, bs, head):
        blk = [(wk, b, r) for (wk, b, r) in zip(ws, bs, rs)]
        y, f = tf.run_fused_tail(x, blk, head, impl="pallas")
        return depth_to_space(y, f)

    ws = [wk for (wk, _, _) in blocks]
    bs = [b for (_, b, _) in blocks]

    # timing methodology (see RESULTS.md 'benchmark traps'): ONE jitted scan
    # whose body consumes the iteration index (rotating inputs) and whose
    # outputs feed the carry, so XLA can neither hoist nor DCE the work.
    xs = jnp.stack([x + 1e-3 * k for k in range(4)])

    def timed(fn, n=None):
        n = n or args.iters
        idx = jnp.arange(n) % 4

        @jax.jit
        def loop(xs, ws, bs, head):
            def body(acc, i):
                out = fn(xs[i], ws, bs, head)
                leaves = jax.tree_util.tree_leaves(out)
                return acc + sum(jnp.mean(l.astype(jnp.float32))
                                 for l in leaves), None
            acc, _ = jax.lax.scan(body, 0.0, idx)
            return acc

        jax.block_until_ready(loop(xs, ws, bs, head))   # compile + warm
        t0 = time.time()
        jax.block_until_ready(loop(xs, ws, bs, head))
        return (time.time() - t0) / n * 1e3

    j_o = jax.jit(oracle)
    j_f = jax.jit(fused)
    out_o = j_o(x, ws, bs, head)
    out_f = j_f(x, ws, bs, head)
    ms_o = timed(oracle)
    ms_f = timed(fused)
    d = float(jnp.abs(out_o.astype(jnp.float32)
                      - out_f.astype(jnp.float32)).max())
    print(f"[{args.arch} b{args.batch} {args.dtype}] fwd: xla {ms_o:.2f} ms | "
          f"pallas {ms_f:.2f} ms | speedup {ms_o / ms_f:.2f}x | maxdiff {d:.2e}")

    if args.fwd_only:
        return
    cot = jnp.asarray(rng.randn(*out_o.shape) * .01, dt)

    def loss(fn, x, ws, bs, head):
        return jnp.sum((fn(x, ws, bs, head).astype(jnp.float32)
                        - cot.astype(jnp.float32)) ** 2)

    g_o = jax.grad(lambda *a: loss(oracle, *a), argnums=(0, 1, 2, 3))
    g_f = jax.grad(lambda *a: loss(fused, *a), argnums=(0, 1, 2, 3))
    r_o = jax.jit(g_o)(x, ws, bs, head)
    r_f = jax.jit(g_f)(x, ws, bs, head)
    ms_og = timed(g_o)
    ms_fg = timed(g_f)
    flat_o = jax.tree_util.tree_leaves(r_o)
    flat_f = jax.tree_util.tree_leaves(r_f)
    rel = max(float(jnp.abs(a.astype(jnp.float32)
                            - b.astype(jnp.float32)).max())
              / (float(jnp.abs(a.astype(jnp.float32)).max()) + 1e-12)
              for a, b in zip(flat_o, flat_f))
    print(f"[{args.arch} b{args.batch} {args.dtype}] grad: xla {ms_og:.2f} ms | "
          f"pallas {ms_fg:.2f} ms | speedup {ms_og / ms_fg:.2f}x | "
          f"max rel grad diff {rel:.2e}")


if __name__ == "__main__":
    main()
