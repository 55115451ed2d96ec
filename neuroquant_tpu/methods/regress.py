"""Stage 1 — FP32 per-video overfitting, TPU-first.

CLI-compatible with the reference (methods/regress.py: same flags, config
keys, output-directory scheme, log-line formats, and .pth checkpoints), but
the training loop is one jitted lax.scan per epoch over HBM-resident frames:
no DataLoader workers, no per-step host->device copies, per-step cosine lr
computed in-graph. Checkpoints are written as reference-layout .pth state
dicts (utils/torch_compat.py) so the two implementations interoperate.

Run:
  python -m neuroquant_tpu.methods.regress --config configs/HNeRV/Bunny_1280x640_3M.yaml \
      --arch hnerv --data_path /root/reference/bunny --vid Bunny --outf hnerv
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuroquant_tpu.config import get_config, validate_config
from neuroquant_tpu.data import VideoDataSet
from neuroquant_tpu.logging_utils import setup_logger
from neuroquant_tpu.metrics import loss_fn, psnr_fn_single
from neuroquant_tpu.methods import common
from neuroquant_tpu.schedules import make_lr_schedule
from neuroquant_tpu.utils.torch_compat import load_pth, save_pth


def parse_args(argv):
    parser = argparse.ArgumentParser(
        description="running parameters",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    # initial (reference regress.py:30-58)
    parser.add_argument("--seed", default=903, type=int,
                        help="random seed for results reproduction")
    parser.add_argument("--outf", default="unify",
                        help="folder to output images and model checkpoints")
    parser.add_argument("--config", type=str, help="config file path")
    parser.add_argument("--arch", type=str, help="the architecture of NeRV")
    # dataset
    parser.add_argument("--data_path", type=str, help="data path for vid")
    parser.add_argument("--vid", type=str, help="video id")
    parser.add_argument("--data_split", type=str, default="1_1_1",
                        help="Valid_train/total_train/all data split")
    # learning
    parser.add_argument("-p", "--print-freq", default=50, type=int)
    parser.add_argument("--lr_type", type=str, default="cosine_0.1_1_0.1",
                        help="learning rate type, default=cosine")
    # eval
    parser.add_argument("--weight", default="None", type=str, help="model for test")
    parser.add_argument("--eval_only", action="store_true", default=False)
    parser.add_argument("--dump_vis", action="store_true", default=False)
    parser.add_argument("--eval_fps", action="store_true", default=False)
    # QAT baselines (reference ships but never wires these quantizers,
    # quantization/quantizer.py:326-375; reachable here)
    parser.add_argument("--qat_mode", default="none", type=str,
                        choices=["none", "ffnerv", "hinerv"],
                        help="quantization-aware training of decoder weights")
    parser.add_argument("--qat_bits", default=8, type=int)
    parser.add_argument("--ckpt_freq", default=1, type=int,
                        help="save model_latest.pth every N epochs (the "
                             "reference saves every epoch; raise on tunneled "
                             "TPU setups where device->host is slow)")
    parser.add_argument("--matmul_precision", default="default", type=str,
                        choices=["default", "tensorfloat32", "bfloat16",
                                 "highest"],
                        help="TPU matmul/conv precision for training "
                             "(default = bf16 passes; tensorfloat32 = 3-pass; "
                             "highest = 6-pass fp32-equivalent)")
    parser.add_argument("--profile", action="store_true", default=False,
                        help="write a jax.profiler trace of epoch 2 to "
                             "<outf>/profile and log the top op groups")
    parser.add_argument("--mesh_devices", default=0, type=int,
                        help="data-parallel training over an N-device jax "
                             "mesh (frame batch sharded, gradient psum over "
                             "ICI); 0/1 = single device")
    parser.add_argument("--snapshot_freq", default=0, type=int,
                        help="also save epoch{N}.pth every N epochs (0 = "
                             "final only) — snapshots feed the loss-landscape "
                             "PCA trajectory (analysis.loss_landscape "
                             "--mode trajectory)")
    return parser.parse_args(argv)


def _qat_transform(arch, cfg, mode, bits):
    """params -> params with QAT-fake-quantized decoder conv weights."""
    from neuroquant_tpu.models import quant_layer_paths
    from neuroquant_tpu.ops.quant import qat_fake_quant
    from neuroquant_tpu.quantization.qmodel import _get, _set

    paths = quant_layer_paths(arch, cfg)

    def transform(params, rng=None, training=True):
        out = params
        for i, path in enumerate(paths):
            layer = dict(_get(params, path))
            r = jax.random.fold_in(rng, i) if rng is not None else None
            layer["kernel"] = qat_fake_quant(layer["kernel"], bits, mode,
                                             rng=r, training=training)
            out = _set(out, path, layer)
        return out

    return transform


def make_train_epoch(model, arch, loss_type, opt, frames, norm_idx,
                     steps_per_epoch, batch_size, train_ind,
                     qat_transform=None, mesh=None):
    """One jitted epoch: shuffle train indices, scan batches, Adam updates.

    `frames`/`norm_idx` flow through as jit arguments (closure capture would
    embed the whole clip as an HLO constant — fatal at full resolution).
    With `mesh`, the frame batch is sharded over the 'data' axis and XLA
    inserts the gradient psum over ICI (params replicated).
    """
    train_ind = jnp.asarray(train_ind, jnp.int32)

    def step_loss(params, frames, norm_idx, idx, qrng):
        inp = common.model_input(arch, frames, norm_idx, idx)
        img = frames[idx]
        p = (qat_transform(params, rng=qrng, training=True)
             if qat_transform is not None else params)
        pred = model.apply(p, inp)
        return loss_fn(pred, img, loss_type), pred

    @jax.jit
    def run_epoch_inner(params, opt_state, rng, frames, norm_idx):
        rng, qbase = jax.random.split(rng)
        perm = jax.random.permutation(rng, train_ind)
        batches = perm[:steps_per_epoch * batch_size].reshape(
            steps_per_epoch, batch_size)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            batches = jax.lax.with_sharding_constraint(
                batches, NamedSharding(mesh, P(None, "data")))

        def step(carry, inputs):
            sidx, idx = inputs
            params, opt_state = carry
            qrng = jax.random.fold_in(qbase, sidx)
            (loss, pred), grads = jax.value_and_grad(step_loss, has_aux=True)(
                params, frames, norm_idx, idx, qrng)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            psnr = psnr_fn_single(pred, frames[idx]).mean()
            return (params, opt_state), (loss, psnr)

        (params, opt_state), (losses, psnrs) = jax.lax.scan(
            step, (params, opt_state),
            (jnp.arange(steps_per_epoch), batches))
        return params, opt_state, losses, psnrs

    def run_epoch(params, opt_state, rng):
        return run_epoch_inner(params, opt_state, rng, frames, norm_idx)

    return run_epoch


def train(args, cfg):
    rng = common.seed_all(args.seed)
    args.metric_names = common.METRIC_NAMES
    best_metric_list = [0.0] * len(common.METRIC_NAMES)

    dataset = VideoDataSet(cfg, args.data_path)
    train_ind = common.split_dataset(args, dataset)

    rng, init_rng = jax.random.split(rng)
    model, params = common.setup_run(args, cfg, init_rng)
    os.makedirs(args.outf, exist_ok=True)

    try:
        from torch.utils.tensorboard import SummaryWriter
        writer = SummaryWriter(os.path.join(args.outf, "tensorboard"))
    except Exception:  # pragma: no cover - TB optional
        writer = None

    setup_logger(os.path.join(args.outf, time.strftime("%Y%m%d_%H%M%S") + ".log"))
    logging.info("[PID] %s" % os.getpid())
    logging.info("================== Model Architecture=================")
    logging.info(f"{args.arch} / {model.cfg}")
    logging.info(f"Encoder_{round(args.encoder_param, 2)}M_"
                 f"Decoder_{round(args.decoder_param, 2)}M_"
                 f"Total_{round(args.total_param, 2)}M")

    if args.weight != "None":
        logging.info("=> loading checkpoint '{}'".format(args.weight))
        params = load_pth(args.weight, args.arch, params)

    if args.eval_only:
        logging.info("Evaluation ... \n {} Results for checkpoint: {}\n".format(
            datetime.now().strftime("%Y_%m_%d_%H_%M_%S"), args.weight))
        results, _, _ = common.evaluate(model, params, dataset, args, cfg,
                                        args.dump_vis, args.eval_fps)
        print_str, _ = common.best_metrics_str(results, best_metric_list)
        logging.info(print_str)
        return params

    # optimizer: Adam, wd=0, per-step cosine lr (regress.py:240, utils.py:79-99)
    args.lr = cfg["learning_rate"]
    bs = cfg["batch_size"]
    steps_per_epoch = len(train_ind) // bs
    total_steps = cfg["epoch"] * steps_per_epoch
    schedule = make_lr_schedule(args.lr_type, args.lr, total_steps)
    opt = optax.adam(schedule, eps=1e-8)
    opt_state = opt.init(params)

    qat_transform = None
    if getattr(args, "qat_mode", "none") != "none":
        qat_transform = _qat_transform(args.arch, cfg, args.qat_mode,
                                       args.qat_bits)
        logging.info(f"QAT enabled: mode={args.qat_mode} bits={args.qat_bits}")

    mesh = None
    if getattr(args, "mesh_devices", 0) > 1:
        from neuroquant_tpu.parallel import make_mesh, replicate
        mesh = make_mesh(args.mesh_devices)
        if bs % args.mesh_devices:
            logging.warning("batch_size %d not divisible by mesh_devices %d",
                            bs, args.mesh_devices)
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        logging.info("data-parallel training over %d devices: %s",
                     args.mesh_devices, mesh)

    run_epoch = make_train_epoch(model, args.arch, cfg["loss"], opt,
                                 dataset.frames, dataset.norm_idx,
                                 steps_per_epoch, bs, train_ind,
                                 qat_transform=qat_transform, mesh=mesh)

    start = datetime.now()
    logging.info(f"begin training on {jax.devices()[0].platform}:{jax.devices()[0]}")
    for epoch in range(cfg["epoch"]):
        epoch_start = datetime.now()
        rng, erng = jax.random.split(rng)
        if getattr(args, "profile", False) and epoch == 1:
            from neuroquant_tpu.utils.profiling import profile_trace, summarize_trace
            prof_dir = os.path.join(args.outf, "profile")
            with profile_trace(prof_dir):
                params, opt_state, losses, psnrs = run_epoch(params, opt_state, erng)
                jax.block_until_ready(losses)
            for ms, name in summarize_trace(prof_dir, top_k=10):
                logging.info("[profile] %8.2f ms  %s", ms, name)
        else:
            params, opt_state, losses, psnrs = run_epoch(params, opt_state, erng)
        psnrs = np.asarray(psnrs)

        # reference logs running-mean PSNR every print_freq steps (regress.py:281-285)
        lr_now = float(schedule((epoch + 1) * steps_per_epoch - 1))
        for i in list(range(0, steps_per_epoch, args.print_freq)) + [steps_per_epoch - 1]:
            logging.info("[{}], Epoch[{}/{}], Step [{}/{}], lr:{:.2e} pred_PSNR: {}".format(
                datetime.now().strftime("%Y/%m/%d %H:%M:%S"), epoch + 1,
                cfg["epoch"], i + 1, steps_per_epoch, lr_now,
                round(float(psnrs[:i + 1].mean()), 2)))

        if writer is not None:
            h, w = cfg["crop_h"], cfg["crop_w"]
            writer.add_scalar(f"Train/pred_PSNR_{h}X{w}", float(psnrs.mean()), epoch + 1)
            writer.add_scalar("Train/lr", lr_now, epoch + 1)
        epoch_end = datetime.now()
        logging.info("Time/epoch: \tCurrent:{:.2f} \tAverage:{:.2f}".format(
            (epoch_end - epoch_start).total_seconds(),
            (epoch_end - start).total_seconds() / (epoch + 1)))

        if (epoch + 1) % cfg["eval_freq"] == 0 or (cfg["epoch"] - epoch) in [1, 3, 5]:
            results, hw, _ = common.evaluate(
                model, params, dataset, args, cfg,
                args.dump_vis if epoch == cfg["epoch"] - 1 else False)
            print_str = f"Eval at epoch {epoch + 1} for {hw}: "
            for i, (name, value) in enumerate(zip(common.METRIC_NAMES, results)):
                best_metric_list[i] = max(best_metric_list[i], float(np.max(value)))
                digits = 2 if "psnr" in name else 4
                if "seen" in name and writer is not None and "unseen" not in name:
                    writer.add_scalar(f"Val/{name}_{hw}", float(np.max(value)), epoch + 1)
                    writer.add_scalar(f"Val/best_{name}_{hw}", best_metric_list[i], epoch + 1)
                print_str += f"{name}: {round(float(np.max(value)), digits)} | "
            logging.info(print_str)

        if (epoch + 1) % getattr(args, "ckpt_freq", 1) == 0 \
                or epoch == cfg["epoch"] - 1:
            save_pth(os.path.join(args.outf, "model_latest.pth"),
                     args.arch, params)
        snap = getattr(args, "snapshot_freq", 0)
        if (epoch + 1) % cfg["epoch"] == 0 or (snap and (epoch + 1) % snap == 0):
            save_pth(os.path.join(args.outf, f"epoch{epoch + 1}.pth"),
                     args.arch, params)

    logging.info(f"Training complete in: {str(datetime.now() - start)}")
    return params


def main(argv):
    common.enable_persistent_cache()
    args = parse_args(argv)
    cfg = validate_config(get_config(args.config), args.arch)
    args.outf = os.path.join("results", args.outf)
    args.exp_id = common.exp_id(args, cfg)
    args.outf = os.path.join(args.outf, args.exp_id)
    prec = getattr(args, "matmul_precision", "default")
    if prec != "default":
        with jax.default_matmul_precision(prec):
            return train(args, cfg)
    return train(args, cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
