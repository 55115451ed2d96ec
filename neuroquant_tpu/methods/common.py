"""Shared pipeline machinery for the three CLI stages.

The reference duplicates evaluate() in all three entry points
(methods/regress.py:74-148, bit_assign.py:223-271, calibrate_network.py:82-145);
here it is one function. Eval decodes are jitted with frames resident in HBM;
FPS is wall-clock around block_until_ready on the decode only, the TPU
equivalent of the reference's cuda.synchronize timing (models/HNeRV.py:67-68).
"""

from __future__ import annotations

import logging
import os
import random
import time
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from neuroquant_tpu.logging_utils import round_tensor
from neuroquant_tpu.metrics import msssim_fn_single, psnr_fn_single
from neuroquant_tpu.models import build_model, example_input, param_counts
from neuroquant_tpu.schedules import data_split

METRIC_NAMES = ["pred_seen_psnr", "pred_seen_ssim",
                "pred_unseen_psnr", "pred_unseen_ssim"]


def enable_persistent_cache(path: str = "/tmp/nq_jax_cache"):
    """Persistent XLA compile cache — repeat pipeline runs skip recompiles
    (compiles through a tunneled TPU can take minutes)."""
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception as e:  # pragma: no cover
        logging.warning("persistent compile cache unavailable: %s", e)


def seed_all(seed: int = 903):
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)


def model_input(arch: str, frames, norm_idx, idx):
    arch = arch.lower()
    if arch == "nerv":
        return norm_idx[idx]
    return frames[idx]


def setup_run(args, cfg, rng):
    """Build model + params, count parameters, fix the hyperparameter-encoded
    output directory (reference naming, regress.py:205-208)."""
    if args.arch.lower() == "nerv":
        # exact positional-encoding argument reduction over the frame grid;
        # mutate in place so the caller's cfg (and pickled artifacts) carry it
        cfg["n_frames"] = args.full_data_length
    model = build_model(args.arch, cfg)
    params = model.init(rng, example_input(args.arch, cfg, cfg["batch_size"]))
    final_size = cfg["crop_h"] * cfg["crop_w"]
    enc_p, dec_p, tot_p = param_counts(args.arch, cfg, params, final_size,
                                       args.full_data_length)
    args.encoder_param, args.decoder_param, args.total_param = enc_p, dec_p, tot_p
    args.outf = os.path.join(
        args.outf,
        f"Encoder_{round(enc_p, 2)}M_Decoder_{round(dec_p, 2)}M_Total_{round(tot_p, 2)}M")
    return model, params


def make_eval_fns(model, arch: str):
    arch = arch.lower()

    @jax.jit
    def encode(params, x):
        return model.apply(params, x, method="encode")

    @jax.jit
    def decode(params, emb):
        return model.apply(params, emb, method="decode")

    @jax.jit
    def metrics(pred, img):
        return psnr_fn_single(pred, img), msssim_fn_single(pred, img)

    return encode, decode, metrics


# Jitted program caches keyed on model identity + static shape config: a
# fresh @jax.jit per call would re-trace (and re-load the persistent compile
# cache) on every one of the 4+ eval blocks a calibration run performs —
# ~30 s each through the tunneled backend. Values pin the model object so an
# id() can't be recycled under us.
_PROG_CACHE: dict = {}


def _cached_prog(key, model, build):
    hit = _PROG_CACHE.get(key)
    if hit is not None and hit[0] is model:
        return hit[1]
    if len(_PROG_CACHE) > 32:
        _PROG_CACHE.clear()
    fn = build()
    _PROG_CACHE[key] = (model, fn)
    return fn


_NULL_RTT: list = []


def _null_rtt() -> float:
    """Median round trip of a null device program in this process (seconds).

    Every timed invocation of a jitted program pays one host->device->host
    dispatch/fetch round trip; through the tunneled backend this is a
    per-process CONSTANT that varies 25-110+ ms between containers
    (measured, scripts/fps_diag.py — the round-3 driver bench recorded
    333.9 decode FPS where this repo measured 467-471 purely because its
    container's round trip was ~85 ms slower inside a ~200 ms window).
    Cached per process."""
    if _NULL_RTT:
        return _NULL_RTT[0]
    one = jnp.float32(1.0)
    null = jax.jit(lambda x: x + 1.0)
    float(null(one))                     # compile + warm
    reps = []
    for _ in range(8):
        t0 = time.time()
        float(null(one))
        reps.append(time.time() - t0)
    reps.sort()
    _NULL_RTT.append(reps[len(reps) // 2])
    return _NULL_RTT[0]


def measure_decode_fps(model, params, embeds, batch_size: int = 1,
                       n_iters: int = 400, reps: int = 4):
    """Decode throughput: one jitted lax.scan over `n_iters` sequential
    decodes of rotating frame embeddings — a single device program, so the
    measurement excludes host dispatch overhead (the TPU analogue of the
    reference's 100x decode loop around cuda.synchronize,
    methods/regress.py:106-110).

    The timed window is corrected for the one fixed dispatch/fetch round
    trip it contains (see _null_rtt): fps = n / (min-of-reps wall − RTT).
    Validated: corrected rates at n_iters 100 and 400 agree within 1%
    (528-532 FPS) where raw rates differ 10% (466 vs 513) — the overhead is
    per-invocation constant, so subtracting it recovers device throughput
    irrespective of the container's tunnel latency."""
    n = embeds.shape[0]

    def build():
        idx = jnp.arange(n_iters * batch_size) % n

        @jax.jit
        def run(params, embeds):
            def body(acc, i):
                e = jax.lax.dynamic_index_in_dim(embeds, i, keepdims=True)
                out = model.apply(params, e, method="decode")
                return acc + out.mean(), None

            acc, _ = jax.lax.scan(body, 0.0, idx)
            return acc

        return run

    run = _cached_prog(("fps", id(model), n, batch_size, n_iters), model,
                       build)
    rtt = _null_rtt()
    float(run(params, embeds))          # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(run(params, embeds))
        best = min(best, time.time() - t0)
    # never correct beyond half the window: a pathological RTT estimate must
    # not manufacture throughput
    dt = max(best - rtt, best * 0.5)
    return n_iters * batch_size / dt


def _evaluate_device(model, params, dataset, args, cfg, eval_fps=False):
    """Whole-clip eval as ONE jitted device program.

    The per-batch host loop costs ~6 tunnel round-trips per batch (~55 s for
    132 frames on the tunneled backend — evals were ~40% of the calibration
    wall). Here a single lax.scan encodes, decodes, and scores every frame
    on device; the host fetches two length-N metric vectors, and the
    frame-order embedding array (stage-3 cali_data) never leaves HBM.
    Log-line format (Eval at Step [i/N], FPS, PSNR, MS-SSIM) is preserved
    from the fetched arrays.
    """
    frames, norm_idx = dataset.frames, dataset.norm_idx
    n = len(dataset)
    bs = cfg["batch_size"]
    arch = args.arch.lower()
    val_ind = set(args.val_ind_list)
    n_batches = (n + bs - 1) // bs
    idx_flat = np.minimum(np.arange(n_batches * bs), n - 1)
    batches = jnp.asarray(idx_flat.reshape(n_batches, bs), jnp.int32)

    def build():
        @jax.jit
        def run(params, frames, norm_idx, batches):
            def body(_, idx):
                inp = model_input(arch, frames, norm_idx, idx)
                emb = model.apply(params, inp, method="encode")
                out = model.apply(params, emb, method="decode")
                img = frames[idx]
                return None, (psnr_fn_single(out, img),
                              msssim_fn_single(out, img), emb)
            _, (ps, ss, embs) = jax.lax.scan(body, None, batches)
            embs = embs.reshape((n_batches * bs,) + embs.shape[2:])
            return ps.reshape(-1)[:n], ss.reshape(-1)[:n], embs[:n]

        return run

    run = _cached_prog(("eval", id(model), arch, n, bs, n_batches), model,
                       build)
    ps, ss, all_embeds = run(params, frames, norm_idx, batches)
    jax.block_until_ready(all_embeds)
    ps, ss = np.asarray(ps), np.asarray(ss)
    # decode-only FPS (warmed, excludes compile/encode/metrics) so the
    # reference-format eval lines carry the same semantics as the reference's
    # cuda.synchronize decode timing (models/HNeRV.py:67-68) — the fused-eval
    # wall time would fold one-time XLA compilation and metric compute into
    # the number (round-2 advisor finding)
    fps = measure_decode_fps(model, params, all_embeds, bs,
                             n_iters=min(400, 4 * n))

    metric_list = [[] for _ in METRIC_NAMES]
    for frame_id in range(n):
        start = 2 if frame_id in val_ind else 0
        metric_list[start + 0].append(ps[frame_id])
        metric_list[start + 1].append(ss[frame_id])

    # reference per-step log lines (regress.py:128-134) from the arrays
    seen_mask = np.array([f not in val_ind for f in range(n)])
    for i in list(range(0, n_batches, args.print_freq)) + [n_batches - 1]:
        upto = min((i + 1) * bs, n)
        m = seen_mask[:upto]
        p = ps[:upto][m].mean() if m.any() else 0.0
        s = ss[:upto][m].mean() if m.any() else 0.0
        logging.info("[{}], Eval at Step [{}/{}], FPS {}, PSNR {}, MS-SSIM {}".format(
            datetime.now().strftime("%Y/%m/%d %H:%M:%S"), i + 1, n_batches,
            round(fps, 1), round(float(p), 2), round(float(s), 4)))

    results = [np.mean(v) if len(v) else np.zeros(1) for v in metric_list]
    args.fps = fps
    if eval_fps:
        logging.info("[eval_fps] device decode throughput: {} FPS (batch {})".format(
            round(fps, 1), bs))
    h, w = cfg["crop_h"], cfg["crop_w"]
    return results, (h, w), all_embeds


def evaluate(model, params, dataset, args, cfg, dump_vis: bool = False,
             eval_fps: bool = False, visual_dir_name: str = "visualize_fp32"):
    """Full-clip eval in frame order. Returns (results_list, (h, w),
    embeddings) — embeddings concatenated in frame order become stage-3's
    calibration data (calibrate_network.py:229). Without --dump_vis the
    whole eval runs as one device program (_evaluate_device); the host loop
    below survives for the visualization path (decoded frames must come to
    the host anyway)."""
    if not dump_vis:
        return _evaluate_device(model, params, dataset, args, cfg, eval_fps)
    encode, decode, metrics = make_eval_fns(model, args.arch)
    frames, norm_idx = dataset.frames, dataset.norm_idx
    n = len(dataset)
    bs = cfg["batch_size"]
    val_ind = set(args.val_ind_list)

    if dump_vis:
        visual_dir = os.path.join(args.outf, visual_dir_name)
        logging.info(f"Saving predictions to {visual_dir}...")
        os.makedirs(visual_dir, exist_ok=True)

    metric_list = [[] for _ in METRIC_NAMES]
    embeds, dec_times = [], []
    n_batches = (n + bs - 1) // bs
    fps = 0.0

    for i in range(n_batches):
        idx = jnp.arange(i * bs, min((i + 1) * bs, n))
        inp = model_input(args.arch, frames, norm_idx, idx)
        img = frames[idx]
        emb = jax.block_until_ready(encode(params, inp))
        t0 = time.time()
        out = jax.block_until_ready(decode(params, emb))
        dec_times.append(time.time() - t0)
        embeds.append(emb)

        psnr, msssim = metrics(out, img)
        psnr, msssim = np.asarray(psnr), np.asarray(msssim)
        for bi, frame_id in enumerate(np.asarray(idx)):
            start = 2 if int(frame_id) in val_ind else 0
            metric_list[start + 0].append(psnr[bi])
            metric_list[start + 1].append(msssim[bi])

        if dump_vis:
            from PIL import Image
            arr = np.asarray(jnp.clip(out, 0, 1) * 255).astype(np.uint8)
            for bi, frame_id in enumerate(np.asarray(idx)):
                tag = str(round(float(psnr[bi]), 2))
                Image.fromarray(arr[bi]).save(
                    os.path.join(visual_dir, f"pred_{int(frame_id):04d}_{tag}.png"))

        if i % args.print_freq == 0 or i == n_batches - 1:
            avg_time = sum(dec_times) / len(dec_times)
            fps = bs / avg_time
            p = np.mean(metric_list[0]) if metric_list[0] else 0.0
            s = np.mean(metric_list[1]) if metric_list[1] else 0.0
            logging.info("[{}], Eval at Step [{}/{}], FPS {}, PSNR {}, MS-SSIM {}".format(
                datetime.now().strftime("%Y/%m/%d %H:%M:%S"), i + 1, n_batches,
                round(fps, 1), round(float(p), 2), round(float(s), 4)))

    results = [np.mean(v) if len(v) else np.zeros(1) for v in metric_list]
    args.fps = fps
    all_embeds = jnp.concatenate(embeds, axis=0)

    if eval_fps:
        # reference --eval_fps: 100 timed decodes (regress.py:106-110); here a
        # single jitted scan so the tunnel round trip doesn't pollute the number
        fps_dev = measure_decode_fps(model, params, all_embeds, bs)
        args.fps = fps_dev
        logging.info("[eval_fps] device decode throughput: {} FPS (batch {})".format(
            round(fps_dev, 1), bs))

    h, w = cfg["crop_h"], cfg["crop_w"]
    return results, (h, w), all_embeds


def split_dataset(args, dataset):
    args.final_size = dataset.final_size
    args.full_data_length = len(dataset)
    split = [int(x) for x in args.data_split.split("_")]
    train_ind, args.val_ind_list = data_split(
        list(range(args.full_data_length)), split, False, 0)
    return train_ind


def exp_id(args, cfg) -> str:
    return (f"{args.vid}_e{cfg['epoch']}_b{cfg['batch_size']}"
            f"_lr{cfg['learning_rate']}_{cfg['loss']}")


def best_metrics_str(results, best=None):
    out, best = "", best or [0.0] * len(METRIC_NAMES)
    for i, (name, value) in enumerate(zip(METRIC_NAMES, results)):
        best[i] = max(best[i], float(np.max(value)))
        digits = 2 if "psnr" in name else 4
        out += f"best_{name}: {round(best[i], digits)} | "
    return out, best
