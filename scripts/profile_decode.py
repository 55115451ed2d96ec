"""Profile the HNeRV fused-tail decode on the real TPU.

Decodes the whole clip through the jitted decode (batch 1, the eval/FPS
configuration) under a jax.profiler trace and prints the top device-op
groups, separating the Pallas tail kernels from XLA ops — the breakdown
that locates the remaining distance to the analytic tail floor
(~0.75 ms/frame at 100% MXU on the packed HNeRV tail).

Usage: python scripts/profile_decode.py [arch] [batch]
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
logging.basicConfig(stream=sys.stderr, level=logging.INFO)


def main(arch="hnerv", batch=1, trace_dir="/tmp/nq_decode_trace"):
    import jax
    import jax.numpy as jnp  # noqa: F401

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from neuroquant_tpu.config import get_config
    from neuroquant_tpu.data import VideoDataSet
    from neuroquant_tpu.models import build_model
    from neuroquant_tpu.utils.profiling import profile_trace, summarize_trace

    cfgp = ("configs/HNeRV/Bunny_1280x640_3M.yaml" if arch == "hnerv"
            else "configs/NeRV/Bunny_1280x640_3M.yaml")
    cfg = get_config(cfgp)
    ds = VideoDataSet(cfg, "/root/reference/bunny")
    model = build_model(arch, cfg)
    params = model.init(jax.random.PRNGKey(903), ds.frames[:1])

    if arch == "hnerv":
        cali = jax.jit(lambda p, x: model.apply(p, x, method="encode"))(
            params, ds.frames)
    else:
        cali = jax.jit(lambda p, x: model.apply(p, x, method="encode"))(
            params, jnp.arange(len(ds), dtype=jnp.float32)[:, None]
            / len(ds))

    decode = jax.jit(lambda p, e: model.apply(p, e, method="decode"))
    n = cali.shape[0] - cali.shape[0] % batch

    def sweep():
        outs = []
        for i in range(0, n, batch):
            outs.append(decode(params, cali[i:i + batch]))
        jax.block_until_ready(outs)

    sweep()    # compile
    t0 = time.time()
    sweep()
    dt = time.time() - t0
    logging.info("%s decode batch=%d: %.2f ms/frame (%.1f FPS)",
                 arch, batch, 1000 * dt / n, n / dt)

    with profile_trace(trace_dir):
        sweep()
    for line in summarize_trace(trace_dir, top_k=25):
        print(line)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "hnerv",
         int(sys.argv[2]) if len(sys.argv) > 2 else 1)
