"""Per-layer timing of the fused Pallas tail: mode x tile sweep.

For each layer of an arch's real tail plan, times the forward kernel (and
optionally convT/dW) under every execution mode that fits VMEM, plus the
whole-tail composition, against the analytic MXU floor. Drives the
NQ_TAIL_MODE override in ops/tail_fused._exec_cfg, so what this script finds
fastest can be pinned without code changes — and its numbers calibrate the
padded-cost model itself.

Usage: python scripts/tail_layer_bench.py [--arch hnerv|nerv] [--batch N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from neuroquant_tpu.ops import tail_fused as tf


def geometry(arch):
    if arch == "hnerv":
        h, w, c0 = 160, 320, 53
        blocks = [(5, 53, 176, 2), (5, 44, 148, 2)]
        head = (3, 37, 3)
    elif arch == "hnerv_uvg":
        # UVG 960x1920 f=6 plan (strides [...,3,2]); same 160x320 packed
        # grid as Bunny but 9x/4x shuffle groups -> the fat 400->1336->112
        # packed channels whose dx kernels overflow Mosaic scoped vmem at
        # the model's picks (RESULTS.md UVG split study)
        h, w, c0 = 160, 320, 53
        blocks = [(5, 53, 396, 3), (5, 44, 148, 2)]
        head = (3, 37, 3)
    elif arch == "nerv_uvg":
        h, w, c0 = 160, 320, 24
        blocks = [(3, 24, 216, 3), (3, 24, 96, 2)]
        head = (3, 24, 3)
    elif arch == "pnerv":
        # PNeRV post-fusion tail (configs/PNeRV/Bunny_1280x640_3M.yaml):
        # last k=3 stride-2 NeRVBlock (100 -> 400) + 3x3 head at the
        # (320, 640) grid — 4x HNeRV's Mp, unswept until round 5
        # (RESULTS.md r4 decode anatomy: 8.1 ms of the 17.4 ms frame)
        h, w, c0 = 320, 640, 100
        blocks = [(3, 100, 400, 2)]
        head = (3, 100, 3)
    elif arch == "hnerv_prefix":
        # the fused prefix block's 1-layer plan (blocks[2]: 64 -> 848 k=5
        # at 40x80, models/layers.run_prefix_blocks); fwd/dx/dW pins for
        # the prefix geometry land in _SWEEP_PINS keyed on its plan
        h, w, c0 = 40, 80, 64
        blocks = []
        head = (5, 64, 848)
    elif arch == "nerv_prefix":
        # NeRV blocks[2]: 36 -> 24*16 k=3 at 40x80
        h, w, c0 = 40, 80, 36
        blocks = []
        head = (3, 36, 384)
    else:
        h, w, c0 = 160, 320, 24
        blocks = [(3, 24, 96, 2), (3, 24, 96, 2)]
        head = (3, 24, 3)
    return h, w, c0, blocks, head


def build(arch, dt):
    h, w, c0, bl, hd = geometry(arch)
    rng = np.random.RandomState(0)
    blocks = []
    for (k, cin, crr, r) in bl:
        blocks.append((jnp.asarray(rng.randn(k, k, cin, crr) * .05, dt),
                       jnp.asarray(rng.randn(crr) * .05, dt), r))
    kh, cinh, couth = hd
    head = (jnp.asarray(rng.randn(kh, kh, cinh, couth) * .05, dt),
            jnp.asarray(rng.randn(couth) * .05, dt))
    return h, w, c0, blocks, head


_FETCH_BASELINE = [None]


def fetch_baseline():
    """Tunnel round-trip cost of one host fetch (~29 ms on the axon
    backend). block_until_ready does NOT reliably synchronize through the
    tunnel — only a host fetch does — so every timing below runs a long
    scan, fetches the scalar result once, and subtracts this baseline."""
    if _FETCH_BASELINE[0] is None:
        f = jax.jit(lambda x: jnp.sum(x))
        x = jnp.ones((8, 128))
        float(f(x))
        t0 = time.time()
        float(f(x))
        _FETCH_BASELINE[0] = time.time() - t0
    return _FETCH_BASELINE[0]


def timed_scan(fn, args, iters=100):
    """One jitted scan whose body consumes the index (no hoisting) and whose
    outputs feed the carry (no DCE); synced by a host fetch of the scalar."""
    @jax.jit
    def loop(*a):
        def body(acc, i):
            out = fn(i, *a)
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves), None
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
        return acc

    float(loop(*args))
    t0 = time.time()
    float(loop(*args))
    return (time.time() - t0 - fetch_baseline()) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="hnerv")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--bwd", action="store_true",
                    help="also time convT and dW per layer")
    ap.add_argument("--modes", default=None,
                    help="comma list restricting the sweep (e.g. upatches)")
    ap.add_argument("--layers", default=None,
                    help="comma list of layer indices to sweep")
    args = ap.parse_args()
    only = set(args.modes.split(",")) if args.modes else None
    lsel = set(int(i) for i in args.layers.split(",")) if args.layers else None

    h, w, c0, blocks, head = build(args.arch, jnp.float32)
    plan, kks, bms, f, ch = tf.plan_and_pack(h, w, blocks, head)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(args.batch, tf._r8(c0), plan.mp) * .1,
                    jnp.float32)
    x_cf, kks_c, bms_c, _ = tf._mxu_cast(x, kks, bms, jnp.float32)
    dtype = x_cf.dtype

    print(f"plan: h={plan.h} w={plan.w} pad={plan.pad} tm={plan.tm} "
          f"Mp={plan.mp} dtype={dtype}")
    peak_tf = 197e12 if dtype == jnp.bfloat16 else 98e12

    # ---- per-layer sweep ----
    xs = {}
    hcur = x_cf
    for li, layer in enumerate(plan.layers):
        xs[li] = hcur
        hcur = tf._conv_cf(hcur, kks_c[li], bms_c[li], None, plan, layer,
                           dtype, emit="y" if li + 1 < len(plan.layers)
                           else "z")

    for li, layer in enumerate(plan.layers):
        if lsel is not None and li not in lsel:
            continue
        sp = layer.sparse
        # dense flops of this layer in the packed domain; sparse layers do
        # 1/f^2 of that in original-kernel terms
        dense_gf = 2 * plan.mp * layer.cout * layer.taps * layer.cin / 1e9
        if sp is not None:
            k_o, cin_o, cout_o, qt = sp
            real_gf = 2 * plan.mp * len(qt) * cout_o * k_o * k_o * cin_o / 1e9
        else:
            real_gf = dense_gf
        print(f"\nlayer {li}: side={layer.side} cin={layer.cin} "
              f"cout={layer.cout} sparse={'y' if sp else 'n'} "
              f"dense {dense_gf:.1f} GF real {real_gf:.1f} GF "
              f"floor {real_gf * 1e9 * args.batch / peak_tf * 1e6:.0f} us")
        modes = ["patches", "ppatches", "xpatches", "taps", "xtaps",
                 "kn2row"]
        if sp is not None:
            modes.append("qpatches")
            modes.append("upatches")
            modes.append("pupatches")
        xin = xs[li]
        for mode in modes:
            if only is not None and mode not in only:
                continue
            for tm in (256, 512, 1024, 2048, 4096):
                os.environ["NQ_TAIL_MODE"] = \
                    f"{layer.cin}x{layer.cout}={mode}@{tm}"
                tf._exec_cfg.cache_clear()
                try:
                    cfg = tf._exec_cfg(plan, layer, jnp.dtype(dtype).itemsize,
                                       "fwd1")
                    if plan.mp % cfg.tm:
                        continue

                    def fwd(i, xin, kk, bm):
                        return tf._conv_cf(
                            xin * (1.0 + 1e-6 * i).astype(dtype), kk, bm, None, plan,
                            layer, dtype, emit="y")
                    ms = timed_scan(fwd, (xin, kks_c[li], bms_c[li]),
                                    args.iters)
                    eff = (real_gf * 1e9 * args.batch / peak_tf) / (ms / 1e3)
                    print(f"  fwd {mode:9s}@{tm}: {ms * 1e3:7.0f} us  "
                          f"({eff * 100:4.1f}% of floor)")
                except Exception as e:
                    print(f"  fwd {mode:9s}@{tm}: FAIL "
                          f"{type(e).__name__}: {str(e)[:80]}")
        if args.bwd:
            # convT (dx) pass: transposed geometry, WITH the production
            # GELU' epilogue (out_mul) when this layer stores pre-activation
            # input — a config that only compiles without the epilogue is
            # not pinnable (the kn2row@4096 head trap, RESULTS.md)
            lt = layer.transposed()
            g_out = jnp.asarray(rng.randn(args.batch, layer.cout, plan.mp)
                                * .01, dtype)
            om = xs[li] if layer.gelu_in else None
            ktr = tf._kk_transpose(kks_c[li])
            for mode in (["patches", "ppatches", "dpatches", "taps",
                          "kn2row"]
                         + (["qpatches", "upatches", "pupatches"]
                            if lt.sparse else [])):
                if only is not None and mode not in only:
                    continue
                for tm in (256, 512, 1024, 2048):
                    os.environ["NQ_TAIL_MODE"] = \
                        f"{lt.cin}x{lt.cout}={mode}@{tm}"
                    tf._exec_cfg.cache_clear()
                    try:
                        if plan.mp % tf._exec_cfg(
                                plan, lt, jnp.dtype(dtype).itemsize,
                                "fwd1").tm:
                            continue   # partial grid = invalid timing
                        def bwdx(i, g, kk, om):
                            return tf._conv_cf(
                                g * (1.0 + 1e-6 * i).astype(dtype), kk,
                                None, om, plan, lt, dtype, emit="z")
                        ms = timed_scan(bwdx, (g_out, ktr, om), args.iters)
                        print(f"  dx  {mode:9s}@{tm}: {ms * 1e3:7.0f} us")
                    except Exception as e:
                        print(f"  dx  {mode:9s}@{tm}: FAIL {str(e)[:60]}")
            # dW pass
            for mode in (["patches", "ppatches", "dpatches", "taps"]
                         + (["qpatches", "upatches", "pupatches"]
                            if layer.sparse else [])):
                if only is not None and mode not in only:
                    continue
                for tm in (256, 512, 1024, 2048):
                    os.environ["NQ_TAIL_MODE"] = \
                        f"{layer.cin}x{layer.cout}={mode}@{tm}"
                    tf._exec_cfg.cache_clear()
                    try:
                        if plan.mp % tf._exec_cfg(
                                plan, layer, jnp.dtype(dtype).itemsize,
                                "dw").tm:
                            continue   # partial grid = invalid timing
                        gt2 = jnp.zeros((args.batch, layer.cout, plan.mp),
                                        dtype) + 0.01
                        def bwdw(i, x, g):
                            return tf._conv_cf_dw(
                                x * (1.0 + 1e-6 * i).astype(dtype), g,
                                plan, layer)
                        ms = timed_scan(bwdw, (xin, gt2), args.iters)
                        print(f"  dw  {mode:9s}@{tm}: {ms * 1e3:7.0f} us")
                    except Exception as e:
                        print(f"  dw  {mode:9s}@{tm}: FAIL {str(e)[:60]}")
        os.environ.pop("NQ_TAIL_MODE", None)
        tf._exec_cfg.cache_clear()

    # ---- whole-tail + default-choice report ----
    for li, layer in enumerate(plan.layers):
        for kind, lay in (("fwd1", layer), ("fwd2", layer), ("dw", layer),
                          ("dx", layer.transposed())):
            try:
                cfg = tf._exec_cfg(plan, lay, jnp.dtype(dtype).itemsize,
                                   "fwd1" if kind == "dx" else kind)
                print(f"default layer {li} {kind}: {cfg.mode}@{cfg.tm}")
            except ValueError:
                print(f"default layer {li} {kind}: one-call infeasible "
                      f"(split or jnp fallback)")

    def whole(i, x_cf, kks_c, bms_c):
        return tf.tail_apply(plan, x_cf * (1.0 + 1e-6 * i).astype(dtype),
                             kks_c, bms_c)
    ms = timed_scan(whole, (x_cf, kks_c, bms_c), args.iters)
    tot_gf = sum((2 * plan.mp * len(l.sparse[3]) * l.sparse[2]
                  * l.sparse[0] ** 2 * l.sparse[1] if l.sparse
                  else 2 * plan.mp * l.cout * l.taps * l.cin)
                 for l in plan.layers) / 1e9
    print(f"\nwhole tail fwd: {ms:.3f} ms "
          f"({(tot_gf * 1e9 * args.batch / peak_tf) / (ms / 1e3) * 100:.1f}% "
          f"of {tot_gf:.0f} GF floor)")

    if args.bwd:
        cot = jnp.asarray(rng.randn(args.batch, plan.layers[-1].cout,
                                    plan.mp) * .01, jnp.float32)

        def gradfn(i, x_cf, kks_c, bms_c):
            def loss(x_cf, kks_c, bms_c):
                z = tf.tail_apply(plan, x_cf * (1.0 + 1e-6 * i).astype(dtype),
                                  kks_c, bms_c)
                return jnp.sum(z.astype(jnp.float32) * cot.astype(jnp.float32))
            return jax.grad(loss, argnums=(0, 1, 2))(x_cf, kks_c, bms_c)
        ms = timed_scan(gradfn, (x_cf, kks_c, bms_c), max(args.iters // 3, 5))
        print(f"whole tail fwd+bwd: {ms:.3f} ms")


if __name__ == "__main__":
    main()
