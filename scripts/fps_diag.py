"""Diagnose the bench-vs-official decode-FPS discrepancy (VERDICT r3 item 1).

BENCH_r03 recorded 333.9 decode FPS/chip from bench.py's in-process
measurement; scripts/measure_fps.py on trained checkpoints recorded 471.5 —
same measure_decode_fps function (methods/common.py). Hypotheses:
  (a) random-init vs trained weights          -> compare both in one process
  (b) HBM/program state after the calibration -> measure before AND after
  (c) one-shot timing window (~210 ms for 100 frames) folds a per-process
      tunneled dispatch/fetch round trip of varying latency -> measure the
      null-program round trip and the rep-to-rep spread, and amortize with
      larger n_iters.

Prints a JSON summary; run on the real TPU chip.
"""

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
logging.basicConfig(stream=sys.stderr, level=logging.INFO)


def timed_reps(fn, reps=8):
    out = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        out.append(time.time() - t0)
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from neuroquant_tpu.config import get_config
    from neuroquant_tpu.data import VideoDataSet
    from neuroquant_tpu.models import build_model

    summary = {}

    cfg = get_config("configs/HNeRV/Bunny_1280x640_3M.yaml")
    ds = VideoDataSet(cfg, "/root/reference/bunny")
    model = build_model("hnerv", cfg)
    params = model.init(jax.random.PRNGKey(903), ds.frames[:1])
    emb = jax.jit(lambda p, x: model.apply(p, x, method="encode"))(params, ds.frames)
    jax.block_until_ready(emb)

    # --- null-program round trip: how much fixed overhead does one timed
    # invocation carry in THIS process? ---
    @jax.jit
    def null(x):
        return x + 1.0

    x0 = jnp.float32(0.0)
    float(null(x0))
    nulls = timed_reps(lambda: float(null(x0)), reps=12)
    summary["null_rtt_ms"] = sorted(round(t * 1e3, 1) for t in nulls)

    # --- decode program at several n_iters, with reps ---
    n = emb.shape[0]

    def make_run(n_iters):
        idx = jnp.arange(n_iters) % n

        @jax.jit
        def run(params, embeds):
            def body(acc, i):
                e = jax.lax.dynamic_index_in_dim(embeds, i, keepdims=True)
                out = model.apply(params, e, method="decode")
                return acc + out.mean(), None
            acc, _ = jax.lax.scan(body, 0.0, idx)
            return acc
        return run

    for n_iters in (100, 400):
        run = make_run(n_iters)
        float(run(params, emb))   # compile + warm
        reps = timed_reps(lambda: float(run(params, emb)), reps=8)
        rates = sorted(round(n_iters / t, 1) for t in reps)
        summary[f"fps_reps_n{n_iters}"] = rates
        # overhead-corrected: subtract the median null round trip
        null_med = sorted(nulls)[len(nulls) // 2]
        summary[f"fps_corrected_n{n_iters}"] = sorted(
            round(n_iters / (t - null_med), 1) for t in reps)

    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
