"""Network-wise PTQ calibration (NeuroQuant's key algorithm), TPU-first.

Reference: quantization/calib_model.py:92-240. Two phases over ground-truth
frames (not per-layer outputs — the paper's departure from BRECQ):

  Phase 1 — optimize every quantizer's scale (delta) with Adam(lr=1e-3) for
            int(0.05 * iters / steps_per_epoch) epochs, reconstruction loss only.
  Phase 2 — swap every quantizer for AdaRound (alphas initialized from the
            current rounding residues, deltas f16-cast) and optimize all alphas
            with Adam(--lr) for int(iters/steps) - phase1 epochs, adding the
            rounding regularizer weight * sum(1 - |2h(a)-1|^b) with
            LinearTempDecay b: b_start -> b_end after `warmup * iters` steps.

TPU design: the whole video + embeddings live in HBM; one epoch is a single
jitted lax.scan over shuffled frame batches (no host<->device copies in the
loop); phase switches are just different trainable-leaf subsets of the same
QuantState, so each phase compiles exactly once; the decode inside the loss
runs space-to-depth packed (ops/packed_decode.py). Measured: 38.1 it/s on
one v5e chip vs the reference CUDA GPU's 19.0 (2.0x single-chip); `mesh=`
shards the frame batch across chips for the remaining multiplier.
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuroquant_tpu.metrics import lp_loss
from neuroquant_tpu.quantization.qmodel import (
    adaround_upgrade, quantize_params, round_loss,
)
from neuroquant_tpu.quantization.spec import QuantSpec


class LinearTempDecay:
    """b: start_b until rel_start_decay * t_max, then linear to end_b
    (reference: quantization/data_utils.py:24-41). jit-safe on traced t."""

    def __init__(self, t_max: int, rel_start_decay: float = 0.2,
                 start_b: int = 10, end_b: int = 2):
        self.t_max = t_max
        self.start_decay = rel_start_decay * t_max
        self.start_b = start_b
        self.end_b = end_b

    def __call__(self, t):
        # rel_start_decay >= 1.0 makes the denominator 0: at t == t_max the
        # ratio is 0/0 = NaN, the round loss activates exactly at that step
        # (count >= iters), and the NaN gradient poisons Adam's moments even
        # at lr=0 (-0.0 * NaN = NaN) — verified to silently destroy every
        # alpha in a warmup=1.0 run (round-4 VERDICT bug). Decay never
        # starts in that regime, so the temperature is the constant start_b.
        if self.start_decay >= self.t_max:
            return jnp.full_like(jnp.asarray(t, jnp.float32), float(self.start_b))
        rel_t = (t - self.start_decay) / (self.t_max - self.start_decay)
        ramp = self.end_b + (self.start_b - self.end_b) * jnp.maximum(0.0, 1 - rel_t)
        return jnp.where(t < self.start_decay, float(self.start_b), ramp)


def _split_state(state: Dict, keys: Tuple[str, ...]):
    train = {ln: {k: v for k, v in s.items() if k in keys}
             for ln, s in state.items()}
    frozen = {ln: {k: v for k, v in s.items() if k not in keys}
              for ln, s in state.items()}
    return train, frozen


def _merge_state(train: Dict, frozen: Dict):
    return {ln: {**frozen[ln], **train[ln]} for ln in frozen}


def _run_phase(*, model, params, spec, state, cali_data, frames, train_ind,
               trainable_keys, mode, opt, epochs, steps_per_epoch, batch_size,
               p, rng, loss_extra=None, count_offset=0, log_every=500,
               log_fn=logging.info, phase_name="", compute_dtype=None,
               start_epoch=0, epoch_cb=None, mesh=None, cf_pack=None,
               opt_state0=None):
    """Jit one epoch (scan over shuffled batches) and loop it on the host."""
    if epochs <= 0:
        return state, count_offset
    train_ind = jnp.asarray(np.asarray(train_ind), jnp.int32)
    tstate, frozen = _split_state(state, trainable_keys)
    # opt_state0: resumed Adam moments (exact crash recovery) — leaves saved
    # by save_ckpt, re-hung on a freshly built treedef
    opt_state = opt.init(tstate) if opt_state0 is None else \
        jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(opt.init(tstate)),
            [jnp.asarray(l) for l in opt_state0])
    if cf_pack is not None:
        # packed channels-first loss: `frames` carries the pre-packed ground
        # truth (tail_fused.pack_targets) and the decode stops at the packed
        # head output (model.decode_cf) — the final depth-to-space is a
        # permutation, so the summed elementwise loss is identical while the
        # per-step unpack + NHWC transposes disappear from the hot loop.
        frames = cf_pack["gt"]
        cf_mask, cf_denom = cf_pack["mask"], float(cf_pack["denom"])

    # NOTE: frames/cali_data/params are explicit jit arguments, never closure
    # captures — closing over them would embed gigabytes of video as HLO
    # constants (huge trace memory + compile payloads).
    def loss_at(tstate, frozen, params, img, inputs, count):
        st = _merge_state(tstate, frozen)
        qp = quantize_params(params, spec, st, mode=mode, soft=True)
        if compute_dtype is not None:
            # run the decode in reduced precision (quant math stays fp32);
            # gradients w.r.t. qstate flow through the cast
            qp = jax.tree_util.tree_map(
                lambda x: x.astype(compute_dtype), qp)
            inputs = inputs.astype(compute_dtype)
        if cf_pack is not None:
            pred = model.apply(qp, inputs,
                               method="decode_cf").astype(jnp.float32)
            diff = (pred - img) * cf_mask
            d = diff * diff if p == 2.0 else jnp.abs(diff) ** p
            # == lp_loss(reduction='none') on the unpacked NHWC image:
            # sum over channels, mean over B*H*W (metrics.py:87-107)
            rec = d.sum() / (img.shape[0] * cf_denom)
        else:
            pred = model.apply(qp, inputs,
                               method="decode").astype(jnp.float32)
            rec = lp_loss(pred, img, p=p)
        if loss_extra is not None:
            rnd, b = loss_extra(st, count)
        else:
            rnd, b = 0.0, 0.0
        return rec + rnd, (rec, rnd, b)

    # donate the carried optimization state: alphas/deltas + Adam moments are
    # rewritten every epoch, so XLA can update them in place
    @partial(jax.jit, donate_argnums=(0, 2))
    def run_epoch(tstate, frozen, opt_state, count, erng, params, frames,
                  cali_data):
        perm = jax.random.permutation(erng, train_ind)
        n_use = steps_per_epoch * batch_size            # drop_last=True
        batches = perm[:n_use].reshape(steps_per_epoch, batch_size)
        # gather the epoch's GT/input batches ONCE, outside the scan: a
        # per-step frames[idx] gather makes XLA re-chunk the whole multi-GB
        # frame array inside the while loop (~4 ms/step at the bench shape);
        # scanning over the pre-gathered arrays slices them for free
        gt_ep = frames[batches]
        in_ep = cali_data[batches]
        if mesh is not None:
            # data parallel over the frame batch: each chip decodes
            # batch_size / n_devices frames; XLA inserts the gradient psum
            from jax.sharding import NamedSharding, PartitionSpec as P
            gt_ep = jax.lax.with_sharding_constraint(
                gt_ep, NamedSharding(mesh, P(None, "data")))
            in_ep = jax.lax.with_sharding_constraint(
                in_ep, NamedSharding(mesh, P(None, "data")))

        def step(carry, xs):
            tstate, opt_state, count = carry
            img, inputs = xs
            count = count + 1
            (loss, aux), grads = jax.value_and_grad(loss_at, has_aux=True)(
                tstate, frozen, params, img, inputs, count)
            updates, opt_state = opt.update(grads, opt_state, tstate)
            tstate = optax.apply_updates(tstate, updates)
            return (tstate, opt_state, count), (loss, *aux)

        (tstate, opt_state, count), logs = jax.lax.scan(
            step, (tstate, opt_state, count), (gt_ep, in_ep))
        return tstate, opt_state, count, logs

    count = jnp.asarray(count_offset, jnp.int32)
    next_log = count_offset - count_offset % log_every + log_every
    for e in range(start_epoch, epochs):
        # epoch rng derived from the absolute epoch index so a resumed run
        # replays the same shuffles
        erng = jax.random.fold_in(rng, e)
        tstate, opt_state, count, logs = run_epoch(
            tstate, frozen, opt_state, count, erng, params, frames, cali_data)
        # the step count is deterministic — compute it on the host instead of
        # fetching the device counter, so the loop dispatches epochs ahead
        # without a per-epoch tunnel round trip (the only blocking fetches
        # left are the every-500-step log lines, ~1 per 7 epochs at batch 2)
        c_end = count_offset + (e + 1 - start_epoch) * steps_per_epoch
        if epoch_cb is not None:
            epoch_cb(e, _merge_state(tstate, frozen), c_end, opt_state)
        # reproduce the reference's every-500-step loss lines (calib_model.py:86-88)
        c_start = c_end - steps_per_epoch
        while next_log <= c_end:
            i = next_log - c_start - 1
            total, rec, rnd, b = (float(x[i]) for x in logs)
            log_fn("Total loss:\t{:.4f} (rec:{:.4f}, round:{:.4f})\tb={:.2f}\tcount={}".format(
                total, rec, rnd, b, next_log))
            next_log += log_every
    state = _merge_state(tstate, frozen)
    state = jax.tree_util.tree_map(lambda x: x, state)
    return state, count_offset + (epochs - start_epoch) * steps_per_epoch


def model_reconstruction(model, params, spec: QuantSpec, state: Dict,
                         cali_data, frames, train_ind, arch: str = "hnerv",
                         batch_size: int = 8, iters: int = 20000,
                         weight: float = 0.01, opt_mode: str = "mse",
                         b_range: Tuple[int, int] = (20, 2),
                         warmup: float = 0.0, p: float = 2.0,
                         lr: float = 0.0015, seed: int = 903,
                         log_fn=logging.info, compute_dtype=None,
                         checkpoint_path: str | None = None,
                         ckpt_every_epochs: int = 25, mesh=None,
                         epoch_hook=None, cf_pack="auto",
                         rounding: str = "adaround",
                         adaround_only: tuple | None = None):
    """Returns (calibrated QuantState, mode). After return, decode quantized
    with quantize_params(..., mode=mode, soft=False).

    rounding="adaround" (default) runs both phases and returns
    mode='adaround'. rounding="nearest" runs ONLY phase 1 (scale
    optimization) and returns mode='uaq' — round-to-nearest with calibrated
    scales. This is a capability the reference lacks (it always runs
    AdaRound, calib_model.py:169-228); round-4 measurements showed PNeRV is
    better off WITHOUT phase 2 (35.27 nearest vs 35.05 AdaRound), and the
    lr=0 workaround used to emulate it triggered the warmup=1.0 NaN bug.

    compute_dtype=jnp.bfloat16 runs the decode in bf16 (quant math and the
    loss stay fp32) — measured quality- and speed-neutral vs fp32 on v5e
    (the fused tail already runs bf16 MXU operands; round-3 RESULTS).

    cf_pack: "auto" (default) derives the packed channels-first loss domain
    from (arch, model.cfg) when the fused tail applies — the NHWC loss path
    pays a whole-dataset relayout + per-step depth-to-space inside the scan
    (~6 ms/step at the bench shape). Pass None to force the NHWC loss, or a
    prebuilt {"gt", "mask", "denom"} dict (methods/calibrate_network.py).
    """
    assert opt_mode == "mse", "network-wise calibration uses the mse objective"
    assert rounding in ("adaround", "nearest"), rounding
    if rounding == "nearest":
        # phase 1 only — no phase-2 progress to checkpoint/resume
        checkpoint_path = None
    if isinstance(cf_pack, str) and cf_pack == "auto":
        cf_pack = None
        try:
            import dataclasses as _dc

            from neuroquant_tpu.models import tail_plan_for
            from neuroquant_tpu.ops.tail_fused import border_mask, pack_targets
            tp = tail_plan_for(arch, _dc.asdict(model.cfg))
            if tp is not None:
                plan, f, ch = tp
                cf_pack = {"gt": pack_targets(frames, plan, f),
                           "mask": border_mask(plan, ch=ch),
                           "denom": frames.shape[1] * frames.shape[2]}
                log_fn(f"[calib] cf_loss auto: packed-domain loss "
                       f"(f={f}, Mp={plan.mp})")
        except Exception as e:                       # noqa: BLE001
            log_fn(f"[calib] cf_loss auto unavailable ({e}); NHWC loss")
    rng = jax.random.PRNGKey(seed)
    steps_per_epoch = len(train_ind) // batch_size
    assert steps_per_epoch > 0, "batch_size larger than the training split"

    # crash recovery: the reference loses all calibration state on a crash
    # (only the final pickle is written, calibrate_network.py:305-308); here
    # phase-2 progress checkpoints periodically and resumes.
    import os
    import pickle

    resume = None
    if checkpoint_path and os.path.exists(checkpoint_path):
        with open(checkpoint_path, "rb") as f:
            resume = pickle.load(f)
        log_fn(f"[calib] resuming from {checkpoint_path}: "
               f"phase2 epoch {resume['epoch'] + 1}, count {resume['count']}")

    # crash-recovery checkpoints are written OFF the critical path: a real
    # 21k CLI run was 7% slower than the microbenchmark because the 24 MB
    # QuantState was synchronously fetched + pickled 12x per run (round-2
    # RESULTS roadmap item 2). The device->host fetch and pickle now run in
    # a daemon thread that overlaps the next epochs' device work; threads
    # are chained so at most one save is in flight and the tmp-file rename
    # keeps the on-disk checkpoint atomic.
    import threading

    save_thread = [None]
    # device-side snapshot before handing off: the live tstate buffers are
    # DONATED into the next epoch's jitted step, so the thread must read an
    # un-donated copy (one jitted copy program, ~instant for 24 MB)
    snapshot = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))

    def save_ckpt(epoch, st, count, opt_state):
        if checkpoint_path is None:
            return
        if save_thread[0] is not None:
            save_thread[0].join()
        st = snapshot(st)
        # Adam moments too: resume is then an EXACT continuation (same
        # shuffles via epoch-indexed fold_in, same count/temp-decay, same
        # optimizer state), not a moments-reset approximation. Snapshot on
        # device here (the live buffers are donated into the next epoch);
        # the D2H fetch happens inside the thread, off the critical path.
        opt_snap = snapshot(opt_state)

        def _write(epoch=epoch, st=st, count=count, opt_snap=opt_snap):
            opt_leaves = [np.asarray(x)
                          for x in jax.tree_util.tree_leaves(opt_snap)]
            with open(checkpoint_path + ".tmp", "wb") as f:
                pickle.dump({"epoch": epoch, "count": count,
                             "state": jax.tree_util.tree_map(np.asarray, st),
                             "opt_leaves": opt_leaves}, f)
            os.replace(checkpoint_path + ".tmp", checkpoint_path)

        save_thread[0] = threading.Thread(target=_write, daemon=True)
        save_thread[0].start()

    # ---- Phase 1: scales (calib_model.py:120-167) ----
    epochs1 = int(0.05 * iters / steps_per_epoch)
    t0 = time.time()
    rng, prng1 = jax.random.split(rng)
    if resume is None:
        state, _ = _run_phase(
            model=model, params=params, spec=spec, state=state,
            cali_data=cali_data, frames=frames, train_ind=train_ind,
            trainable_keys=("w_delta", "b_delta"), mode="uaq",
            opt=optax.adam(0.001, eps=1e-8), epochs=epochs1,
            steps_per_epoch=steps_per_epoch, batch_size=batch_size, p=p,
            rng=prng1, log_fn=log_fn, phase_name="phase1",
            compute_dtype=compute_dtype, mesh=mesh, cf_pack=cf_pack)
        log_fn(f"[calib] phase 1 (delta): {epochs1} epochs x {steps_per_epoch} "
               f"steps in {time.time() - t0:.1f}s")

    if rounding == "nearest":
        log_fn("[calib] rounding=nearest: phase 2 skipped; state stays UAQ "
               "(round-to-nearest with the phase-1-calibrated scales)")
        return state, "uaq"

    # ---- Phase 2: AdaRound alphas (calib_model.py:169-228) ----
    # adaround_only: mixed rounding — only these layers get alphas and
    # phase-2 optimization; the rest ship round-to-nearest with their
    # phase-1 scales (quantize_params keys the per-layer mode off alpha
    # presence). No reference counterpart (it upgrades every quantizer).
    opt_state0 = None
    if resume is None:
        state = adaround_upgrade(params, spec, state, only=adaround_only)
        if adaround_only is not None:
            log_fn(f"[calib] mixed rounding: adaround on "
                   f"{sorted(adaround_only)}; nearest elsewhere")
        start_epoch, count0 = 0, 0
    else:
        state = jax.tree_util.tree_map(jnp.asarray, resume["state"])
        start_epoch, count0 = resume["epoch"] + 1, resume["count"]
        opt_state0 = resume.get("opt_leaves")   # absent in older checkpoints
    temp = LinearTempDecay(iters, rel_start_decay=warmup,
                           start_b=b_range[0], end_b=b_range[1])
    loss_start = iters * warmup

    def loss_extra(st, count):
        b = temp(count)
        active = count >= loss_start
        b_eff = jnp.where(active, b, 0.0)
        rnd = jnp.where(active, round_loss(st, spec, b, weight), 0.0)
        return rnd, b_eff

    def epoch_cb(e, st, count, opt_state):
        # epoch_hook first: benchmark/throughput probes observe every phase-2
        # epoch boundary. The loop no longer syncs per epoch (count is a host
        # int), so hooks that time epochs receive the device state and must
        # block_until_ready on it themselves (bench.py does).
        if epoch_hook is not None:
            epoch_hook(e, count, st)
        if ckpt_every_epochs > 0 and (e + 1) % ckpt_every_epochs == 0:
            save_ckpt(e, st, count, opt_state)

    epochs2 = int(iters / steps_per_epoch) - epochs1
    t0 = time.time()
    rng, prng2 = jax.random.split(rng)
    state, count = _run_phase(
        model=model, params=params, spec=spec, state=state,
        cali_data=cali_data, frames=frames, train_ind=train_ind,
        trainable_keys=("w_alpha", "b_alpha"), mode="adaround",
        opt=optax.adam(lr, eps=1e-8), epochs=epochs2,
        steps_per_epoch=steps_per_epoch, batch_size=batch_size, p=p,
        rng=prng2, loss_extra=loss_extra, log_fn=log_fn, phase_name="phase2",
        compute_dtype=compute_dtype, start_epoch=start_epoch,
        count_offset=count0, epoch_cb=epoch_cb, mesh=mesh, cf_pack=cf_pack,
        opt_state0=opt_state0)
    dt = time.time() - t0
    log_fn(f"[calib] phase 2 (alpha): {epochs2} epochs x {steps_per_epoch} steps "
           f"in {dt:.1f}s ({epochs2 * steps_per_epoch / max(dt, 1e-9):.1f} iters/s)")
    if save_thread[0] is not None:
        save_thread[0].join()
    return state, "adaround"
