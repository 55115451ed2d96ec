"""Benchmark: network-wise calibration throughput on the real TPU.

Headline metric per BASELINE.json: calibration iters/sec for the HNeRV-Bunny
21k-iter network-wise calibration (precision [6,5,4,5,5,6,6], Hadamard,
channel-wise). Reference CUDA path: 21000 iters in 18m26s = 19.0 iters/s
(results/HNeRV.../hadamard-True.../20251014_050341.log); the v5e-8 target is
>= 5x. Here we run a shortened calibration (same per-step compute) and report
steady-state phase-2 iters/s on one chip.

Prints exactly ONE JSON line to stdout; progress goes to stderr.
"""

from __future__ import annotations

import json
import logging
import sys
import time

logging.basicConfig(stream=sys.stderr, level=logging.INFO)

BASELINE_ITERS_PER_SEC = 21000 / 1106.0   # 18m26s reference calib


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: repeated bench runs skip recompiles
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from neuroquant_tpu.data import VideoDataSet
    from neuroquant_tpu.models import build_model
    from neuroquant_tpu.quantization import init_quant_state, make_spec
    from neuroquant_tpu.quantization.calibrate import model_reconstruction

    cfg = dict(
        crop_h=640, crop_w=1280, diff_enc=False, stage_block=1,
        enc_strides=[5, 4, 4, 2, 2], enc_channel=[64, 64, 64, 64, 16],
        channel_reduce=1.2, channel_lbound=12, dec_in_channel=92,
        dec_kernels=[1, 3, 5, 5, 5], dec_strides=[5, 4, 4, 2, 2],
        dec_norm="none", dec_acts="gelu", out_bias="tanh", loss="l2",
        epoch=300, workers=0, eval_freq=30, batch_size=1, learning_rate=5e-4)

    logging.info("devices: %s", jax.devices())
    dataset = VideoDataSet(cfg, "/root/reference/bunny")
    model = build_model("hnerv", cfg)
    params = model.init(jax.random.PRNGKey(903), dataset.frames[:1])

    encode = jax.jit(lambda p, x: model.apply(p, x, method="encode"))
    t0 = time.time()
    cali_data = jax.block_until_ready(encode(params, dataset.frames))
    logging.info("encoded %s frames in %.1fs", cali_data.shape[0], time.time() - t0)

    spec = make_spec("hnerv", cfg, channel_wise=True, scale_method="max",
                     hadamard=True).with_bits([6, 5, 4, 5, 5, 6, 6])
    state = init_quant_state(params, spec)

    # shortened calibration with identical per-step compute as the 21k run
    batch_size = 2
    iters = 2112            # 1 phase-1 epoch + 31 phase-2 epochs at 66 steps
    train_ind = list(range(len(dataset)))

    timings = {}

    def log_fn(msg):
        logging.info(msg)
        if msg.startswith("[calib] phase 2"):
            timings["line"] = msg

    t0 = time.time()
    state, _ = model_reconstruction(
        model, params, spec, state, cali_data, dataset.frames, train_ind,
        arch="hnerv", batch_size=batch_size, iters=iters, weight=0.01,
        b_range=(20, 2), warmup=0.2, p=2.0, lr=0.003, seed=903, log_fn=log_fn)
    total = time.time() - t0

    # steady-state: re-run phase-2-equivalent epochs were already timed inside;
    # parse iters/s from the phase-2 log line
    import re
    m = re.search(r"\(([\d.]+) iters/s\)", timings.get("line", ""))
    iters_per_sec = float(m.group(1)) if m else (iters / total)
    logging.info("total calib wall: %.1fs; phase2 steady-state: %.2f iters/s",
                 total, iters_per_sec)

    print(json.dumps({
        "metric": "hnerv_bunny_network_calib_throughput",
        "value": round(iters_per_sec, 2),
        "unit": "iters/sec",
        "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
