"""Production-exact compile+time probe of every fused-tail call the UVG
(960x1920, f=6) HNeRV plan makes: fwd (act_in as shipped), dW, and dx with
the GELU' out_mul epilogue — the call form scripts/tail_layer_bench.py
omits and the one that OOM'd Mosaic's 16M scoped VMEM at the model's pick
(qpatches@256, actual 18.3M; see RESULTS.md round-3 UVG section).

For each call it tries the cost model's choice plus a candidate ladder,
reports COMPILES+us or the actual scoped-VMEM overflow, so winners can be
pinned in tail_fused._SWEEP_PINS with hardware evidence.

Usage: python scripts/uvg_tail_probe.py [--batch 2] [--iters 30]
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
from neuroquant_tpu.models import tail_plan_for
from neuroquant_tpu.ops import tail_fused as tf


def timed(make_fn, args, iters):
    """Compile + time a call chained `iters` times on-device; sync by host
    scalar fetch (block_until_ready does not sync through the tunnel)."""
    fn = jax.jit(make_fn)
    float(fn(*args))
    t0 = time.perf_counter()
    float(fn(*args))
    return (time.perf_counter() - t0) / iters * 1e6


def probe(label, key, candidates, make_fn, args, iters):
    for item in candidates:
        os.environ["NQ_TAIL_MODE"] = f"{key}={item}"
        tf._exec_cfg.cache_clear()
        tf._split_parts.cache_clear()
        try:
            us = timed(make_fn, args, iters)
            print(f"[{label}] {item}: {us:7.0f} us")
        except Exception as e:
            msg = str(e)
            i = msg.find("Scoped allocation")
            print(f"[{label}] {item}: FAIL "
                  f"({msg[i:i + 70] if i >= 0 else msg[:110]})")
    os.environ.pop("NQ_TAIL_MODE", None)
    tf._exec_cfg.cache_clear()
    tf._split_parts.cache_clear()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--layers", type=str, default="0,1,2")
    ap.add_argument("--kinds", type=str, default="fwd,dw,dx")
    args = ap.parse_args()

    cfg = get_config("configs/HNeRV/UVG_1920x960_3M.yaml")
    plan, f, ch = tail_plan_for("hnerv", cfg)
    rng = np.random.RandomState(0)
    b, n = args.batch, args.iters
    dt = jnp.bfloat16

    cands_by_sparse = {
        True: ["qpatches@128", "qpatches@256", "qpatches@512",
               "taps@128", "taps@512", "ppatches@128"],
        False: ["ppatches@512", "ppatches@1024", "patches@512",
                "patches@1024", "taps@1024", "taps@2048"],
    }

    for li in [int(v) for v in args.layers.split(",")]:
        L = plan.layers[li]
        Lt = L.transposed()
        x = jnp.asarray(rng.randn(b, L.cin, plan.mp) * .1, dt)
        g = jnp.asarray(rng.randn(b, L.cout, plan.mp) * .1, dt)
        kk = jnp.asarray(rng.randn(L.side, L.side, L.cin, L.cout) * .05, dt)
        bm = jnp.asarray(rng.randn(L.cout, 1) * .05, dt)
        kkt = tf._kk_transpose(kk)
        sp = L.sparse is not None
        print(f"\n== layer {li}: {L.cin}->{L.cout} side={L.side} "
              f"sparse={sp} gelu_in={L.gelu_in} ==")

        if "fwd" in args.kinds:
            def fwd(xx, kw, bb):
                def body(c, _):
                    o = tf._conv_cf(c, kw, bb, None, plan, L, c.dtype,
                                    emit="z", act_in=L.gelu_in)
                    up = jnp.pad(o, ((0, 0), (0, c.shape[1] - o.shape[1]),
                                     (0, 0))) if o.shape[1] < c.shape[1] \
                        else o[:, :c.shape[1], :]
                    return c + up * jnp.bfloat16(1e-8), None
                c, _ = jax.lax.scan(body, xx, None, length=n)
                return jnp.float32(c[0, 0, 0])
            probe(f"L{li} fwd", f"{L.cin}x{L.cout}",
                  cands_by_sparse[sp], fwd, (x, kk, bm), n)

        if "dw" in args.kinds:
            def dw(xx, gg):
                def body(c, _):
                    dkk, db = tf._conv_cf_dw(
                        xx * (1 + c * 0).astype(xx.dtype), gg, plan, L,
                        act_in=L.gelu_in)
                    return c + jnp.sum(dkk) * 1e-12 + jnp.sum(db) * 1e-12, None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
                return c
            probe(f"L{li} dw ", f"{L.cin}x{L.cout}",
                  cands_by_sparse[sp], dw, (x, g), n)

        if "dx" in args.kinds:
            spt = Lt.sparse is not None
            om = x if L.gelu_in else None

            def dx(gg, kw, m):
                def body(c, _):
                    o = tf._conv_cf(c, kw, None, m, plan, Lt, c.dtype)
                    up = jnp.pad(o, ((0, 0), (0, c.shape[1] - o.shape[1]),
                                     (0, 0))) if o.shape[1] < c.shape[1] \
                        else o[:, :c.shape[1], :]
                    return c + up * jnp.bfloat16(1e-8), None
                c, _ = jax.lax.scan(body, gg, None, length=n)
                return jnp.float32(c[0, 0, 0])

            def dx_nom(gg, kw):
                return dx(gg, kw, None)

            probe(f"L{li} dx ", f"{Lt.cin}x{Lt.cout}", cands_by_sparse[spt],
                  dx if om is not None else dx_nom,
                  (g, kkt, om) if om is not None else (g, kkt), n)


if __name__ == "__main__":
    main()
