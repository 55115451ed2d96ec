"""Profile the network-wise calibration step on the real TPU.

Runs a shortened phase-2-dominated calibration (same per-step compute as the
21k run: batch 2, Hadamard, CW) under a jax.profiler trace and prints the
top device-op groups — compute (convolution/fusion) vs data movement (copy).
"""

import logging
import sys
import time

logging.basicConfig(stream=sys.stderr, level=logging.INFO)


def main(trace_dir="/tmp/nq_calib_trace"):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from neuroquant_tpu.config import get_config
    from neuroquant_tpu.data import VideoDataSet
    from neuroquant_tpu.models import build_model
    from neuroquant_tpu.quantization import init_quant_state, make_spec
    from neuroquant_tpu.quantization.calibrate import model_reconstruction
    from neuroquant_tpu.utils.profiling import profile_trace, summarize_trace

    cfg = get_config("configs/HNeRV/Bunny_1280x640_3M.yaml")
    ds = VideoDataSet(cfg, "/root/reference/bunny")
    model = build_model("hnerv", cfg)
    params = model.init(jax.random.PRNGKey(903), ds.frames[:1])
    cali = jax.jit(lambda p, x: model.apply(p, x, method="encode"))(params, ds.frames)
    spec = make_spec("hnerv", cfg, channel_wise=True, scale_method="max",
                     hadamard=True).with_bits([6, 5, 4, 5, 5, 6, 6])
    state = init_quant_state(params, spec)
    train_ind = list(range(len(ds)))

    def run(iters, dtype=None):
        t0 = time.time()
        model_reconstruction(model, params, spec, state, cali, ds.frames,
                             train_ind, batch_size=2, iters=iters,
                             weight=0.01, b_range=(20, 2), warmup=0.2,
                             lr=0.003, seed=903, log_fn=lambda m: None,
                             compute_dtype=dtype)
        return time.time() - t0

    run(132)                       # compile (phase1=0 epochs, phase2=2)
    logging.info("warm run fp32: %.1fs for 132 iters", run(132))
    with profile_trace(trace_dir):
        dt = run(264)
    print("fp32: %.1fs for 264 iters (%.1f it/s)" % (dt, 264 / dt))
    for ms, name in summarize_trace(trace_dir, top_k=25):
        print(f"{ms:10.1f} ms  {name}")

    run(132, jnp.bfloat16)         # compile
    dt = run(264, jnp.bfloat16)
    print("bf16: %.1fs for 264 iters (%.1f it/s)" % (dt, 264 / dt))
    with profile_trace(trace_dir + "_bf16"):
        run(132, jnp.bfloat16)
    for ms, name in summarize_trace(trace_dir + "_bf16", top_k=15):
        print(f"{ms:10.1f} ms  {name}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
