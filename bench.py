"""Benchmark: network-wise calibration throughput on the real TPU.

Headline metric per BASELINE.json: calibration iters/sec for the HNeRV-Bunny
21k-iter network-wise calibration (precision [6,5,4,5,5,6,6], Hadamard,
channel-wise). Reference CUDA path: 21000 iters in 18m26s = 19.0 iters/s
(results/HNeRV.../hadamard-True.../20251014_050341.log). Here we run a
shortened calibration (identical per-step compute) and report steady-state
phase-2 iters/s.

Robustness: the parent process never imports jax. The measurement runs in a
child process that streams per-epoch throughput to a progress file; if the
child dies (e.g. a transient TPU-worker crash through the tunneled backend),
the parent retries once and, failing that, still emits the best partial
steady-state number observed. Exactly ONE JSON line goes to stdout; progress
goes to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

BASELINE_ITERS_PER_SEC = 21000 / 1106.0   # 18m26s reference calib

BENCH_BATCH = 2          # matches the reference calib batch
BENCH_ITERS = 2112       # 1 phase-1 epoch + 31 phase-2 epochs at 66 steps


def child(progress_path: str, batch_size: int, iters: int) -> None:
    """Run the shortened calibration and stream per-epoch iters/s."""
    import logging

    logging.basicConfig(stream=sys.stderr, level=logging.INFO)

    import jax
    import jax.numpy as jnp  # noqa: F401

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
    logging.info("encoded %s frames in %.1fs", cali_data.shape[0],
                 time.time() - t0)

    spec = make_spec("hnerv", cfg, channel_wise=True, scale_method="max",
                     hadamard=True).with_bits([6, 5, 4, 5, 5, 6, 6])
    state = init_quant_state(params, spec)

    train_ind = list(range(len(dataset)))
    steps_per_epoch = len(train_ind) // batch_size

    prog = open(progress_path, "a", buffering=1)
    last = {"t": None, "count": 0}

    def epoch_hook(e, count, st=None):
        # the calibration loop is sync-free (it dispatches epochs ahead of the
        # device); block on the epoch's output state so the per-epoch rate
        # measures device throughput, not host dispatch
        if st is not None:
            jax.block_until_ready(jax.tree_util.tree_leaves(st)[0])
        now = time.time()
        if last["t"] is not None:
            rate = (count - last["count"]) / max(now - last["t"], 1e-9)
            # first phase-2 epoch carries the compile; flag it
            prog.write(json.dumps({
                "phase": 2, "epoch": e, "count": count,
                "iters_per_sec": round(rate, 3),
                "steady": e > 0}) + "\n")
        last["t"], last["count"] = now, count

    from neuroquant_tpu.models import tail_plan_for
    from neuroquant_tpu.ops.tail_fused import border_mask, pack_targets

    cf_pack = None
    tp = tail_plan_for("hnerv", cfg)
    if tp is not None:
        plan, f, ch = tp
        cf_pack = {"gt": pack_targets(dataset.frames, plan, f),
                   "mask": border_mask(plan, ch=ch),
                   "denom": cfg["crop_h"] * cfg["crop_w"]}

    t0 = time.time()
    state, _ = model_reconstruction(
        model, params, spec, state, cali_data, dataset.frames, train_ind,
        arch="hnerv", batch_size=batch_size, iters=iters, weight=0.01,
        b_range=(20, 2), warmup=0.2, p=2.0, lr=0.003, seed=903,
        log_fn=logging.info, epoch_hook=epoch_hook, cf_pack=cf_pack)
    total = time.time() - t0
    logging.info("total calib wall: %.1fs (%d steps/epoch)", total,
                 steps_per_epoch)

    # BASELINE.md tracks three metrics; measure decode FPS/chip here too
    # (weight VALUES don't affect throughput) and stream it to the parent
    from neuroquant_tpu.methods.common import measure_decode_fps
    # n_iters=400 + RTT-corrected timing (methods/common.py measure_decode_fps)
    # so the number no longer depends on the container's tunnel latency —
    # the r3 driver bench read 333.9 vs the repo's 471.5 purely because its
    # per-invocation round trip was ~85 ms slower inside a 100-frame window
    fps = measure_decode_fps(model, params, cali_data, 1, n_iters=400)
    logging.info("decode fps (batch 1): %.1f", fps)
    prog.write(json.dumps({"decode_fps": round(float(fps), 1)}) + "\n")
    prog.write(json.dumps({"done": True, "total_s": round(total, 1)}) + "\n")
    prog.close()


def best_steady_rate(progress_path: str):
    """(median steady-state iters/s | None, decode_fps | None) from the
    progress stream."""
    rates, fps = [], None
    try:
        with open(progress_path) as f:
            for line in f:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if rec.get("steady") and "iters_per_sec" in rec:
                    rates.append(rec["iters_per_sec"])
                if "decode_fps" in rec:
                    fps = rec["decode_fps"]
    except OSError:
        return None, None
    if not rates:
        return None, fps
    rates.sort()
    return rates[len(rates) // 2], fps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--progress", type=str, default="")
    ap.add_argument("--batch_size", type=int, default=BENCH_BATCH)
    ap.add_argument("--iters", type=int, default=BENCH_ITERS)
    args = ap.parse_args()

    if args.child:
        child(args.progress, args.batch_size, args.iters)
        return

    progress_path = os.path.join(tempfile.gettempdir(),
                                 f"nq_bench_{os.getpid()}.jsonl")
    attempts = [args.iters, max(args.iters // 4, 264)]  # retry shorter
    note = ""
    for attempt, iters in enumerate(attempts):
        cmd = [sys.executable, os.path.abspath(__file__), "--child",
               "--progress", progress_path,
               "--batch_size", str(args.batch_size), "--iters", str(iters)]
        print(f"[bench] attempt {attempt + 1}: iters={iters}",
              file=sys.stderr)
        try:
            r = subprocess.run(cmd, timeout=3600,
                               cwd=os.path.dirname(os.path.abspath(__file__)))
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = -1
            note = "timeout"
        if rc == 0:
            break
        note = note or f"child rc={rc}"
        print(f"[bench] attempt {attempt + 1} failed ({note}); "
              f"{'retrying' if attempt + 1 < len(attempts) else 'giving up'}",
              file=sys.stderr)
        time.sleep(10)   # let a crashed TPU worker recover its claim

    rate, decode_fps = best_steady_rate(progress_path)
    result = {
        "metric": "hnerv_bunny_network_calib_throughput",
        "value": round(rate, 2) if rate is not None else 0.0,
        "unit": "iters/sec",
        "vs_baseline": (round(rate / BASELINE_ITERS_PER_SEC, 2)
                        if rate is not None else 0.0),
    }
    # BASELINE.md tracks three metrics (PSNR@bpp delta, calib iters/s,
    # decode FPS/chip) — carry the other two as extra fields in the same line
    if decode_fps is not None:
        result["decode_fps_per_chip"] = decode_fps
        result["decode_fps_vs_ref_gpu"] = round(decode_fps / 174.0, 2)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "results", "headline.json")) as f:
            head = json.load(f)
        result["psnr_at_bpp"] = head["hnerv"]["quantized_psnr_db"]
        result["bpp"] = head["hnerv"]["bpp"]
        result["psnr_at_bpp_delta_vs_ref_db"] = round(
            head["hnerv"]["quantized_psnr_db"]
            - head["hnerv"]["ref_quantized_psnr_db"], 3)
    except (OSError, KeyError, json.JSONDecodeError):
        pass
    if note and rate is not None:
        result["note"] = f"partial ({note})"
    elif note:
        result["note"] = f"failed ({note})"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
