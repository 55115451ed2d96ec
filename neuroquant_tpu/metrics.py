"""Quality metrics and training losses (PSNR, SSIM/MS-SSIM, fusion losses).

Mirrors the reference metric surface (utils.py:104-188): per-image PSNR with
the same 1e-9 epsilon, MS-SSIM with pytorch_msssim's defaults, and the
l1/l2/ssim (+ Fusion1..12) loss zoo used by `--loss`. All functions are pure
jnp and jit-safe; images are NHWC float in [0, 1].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from neuroquant_tpu.ops.msssim import ms_ssim, ssim


def psnr_fn_single(output, gt):
    """Per-image PSNR over a batch: -10 log10(mse + 1e-9) (utils.py:148-151)."""
    err = (output - gt) ** 2
    mse = err.reshape(err.shape[0], -1).mean(axis=1)
    return -10.0 * jnp.log10(mse + 1e-9)


def psnr_fn_batch(output_list, gt):
    """Stacked per-image PSNR for a list of outputs (utils.py:153-155)."""
    return jnp.stack([psnr_fn_single(o, gt) for o in output_list], axis=0)


def msssim_fn_single(output, gt):
    """Per-image MS-SSIM over a batch (utils.py:158-160).

    Frames too small for the 5-level pyramid score 0, mirroring the
    reference's H < 160 guard (utils.py:181).
    """
    if min(output.shape[1], output.shape[2]) <= 160:
        return jnp.zeros((output.shape[0],), jnp.float32)
    return ms_ssim(output, gt, data_range=1.0, size_average=False)


def msssim_fn_batch(output_list, gt):
    return jnp.stack([msssim_fn_single(o, gt) for o in output_list], axis=0)


def psnr_fn(output_list, target_list):
    """Staged-output PSNR: per (output, target) stage, one scalar PSNR over
    the whole batch, broadcast to (batch, num_stage) (utils.py:167-176).

    Dead code in the reference (no caller in methods/ or draw/) — kept for
    API-surface parity with multi-stage NeRV variants.
    """
    cols = []
    for output, target in zip(output_list, target_list):
        mse = jnp.mean((output - target) ** 2)
        psnr = -10.0 * jnp.log10(mse + 1e-9)
        cols.append(jnp.broadcast_to(psnr.reshape(1, 1),
                                     (output.shape[0], 1)))
    return jnp.concatenate(cols, axis=1)


def msssim_fn(output_list, target_list):
    """Staged-output MS-SSIM, scalar per stage broadcast to
    (batch, num_stage); stages with H < 160 score 0 (utils.py:178-188).
    Dead code in the reference — see :func:`psnr_fn`.
    """
    vals = []
    for output, target in zip(output_list, target_list):
        if output.shape[-3] >= 160:
            vals.append(ms_ssim(output, target, data_range=1.0,
                                size_average=True).reshape(1))
        else:
            vals.append(jnp.zeros((1,), jnp.float32))
    row = jnp.concatenate(vals, axis=0).reshape(1, -1)
    return jnp.broadcast_to(row, (output_list[-1].shape[0], row.shape[1]))


def psnr2(img1, img2):
    """Elementwise PSNR map clamped to [0, 50] (utils.py:104-109)."""
    mse = (img1 - img2) ** 2
    return jnp.clip(-10.0 * jnp.log10(mse), 0.0, 50.0)


def _flat_mean(x):
    return x.reshape(x.shape[0], -1).mean(axis=1)


def loss_fn(pred, target, loss_type: str = "l2", batch_average: bool = True):
    """Training loss dispatch (utils.py:112-145). NHWC in [0,1]."""
    target = jax.lax.stop_gradient(target)
    l2 = lambda: _flat_mean((pred - target) ** 2)
    l1 = lambda: _flat_mean(jnp.abs(pred - target))
    dssim = lambda: 1.0 - ssim(pred, target, data_range=1.0, size_average=False)
    dmssim = lambda: 1.0 - ms_ssim(pred, target, data_range=1.0, size_average=False)

    table = {
        "l2": lambda: l2(),
        "l1": lambda: l1(),
        "ssim": lambda: dssim(),
        "Fusion1": lambda: 0.3 * l2() + 0.7 * dssim(),
        "Fusion2": lambda: 0.3 * l1() + 0.7 * dssim(),
        "Fusion3": lambda: 0.5 * l2() + 0.5 * dssim(),
        "Fusion4": lambda: 0.5 * l1() + 0.5 * dssim(),
        "Fusion5": lambda: 0.7 * l2() + 0.3 * dssim(),
        "Fusion6": lambda: 0.7 * l1() + 0.3 * dssim(),
        "Fusion7": lambda: 0.7 * l2() + 0.3 * l1(),
        "Fusion8": lambda: 0.5 * l2() + 0.5 * l1(),
        "Fusion9": lambda: 0.9 * l1() + 0.1 * dssim(),
        "Fusion10": lambda: 0.7 * l1() + 0.3 * dmssim(),
        "Fusion11": lambda: 0.9 * l1() + 0.1 * dmssim(),
        "Fusion12": lambda: 0.8 * l1() + 0.2 * dmssim(),
    }
    if loss_type not in table:
        raise KeyError(f"unknown loss type {loss_type!r}")
    loss = table[loss_type]()
    return loss.mean() if batch_average else loss


def lp_loss(pred, tgt, p: float = 2.0, reduction: str = "none"):
    """L_p calibration loss (reference: quantization/quantizer.py:66-73).

    With reduction='none' this sums over axis 1 and means over the rest —
    for NHWC images the reference (NCHW) sums over the channel axis, so here
    we sum over the last axis to match.
    """
    # |x| ** p with a float exponent lowers to exp(p*log|x|) on the VPU —
    # ~2 transcendentals per pixel, measured ~2 ms/step at the calibration
    # batch. The common integer exponents stay pure multiplies.
    diff = pred - tgt
    if p == 2.0:
        d = diff * diff
    elif p == 1.0:
        d = jnp.abs(diff)
    else:
        d = jnp.abs(diff) ** p
    if reduction == "none":
        if d.ndim == 4:  # NHWC image: channel axis is last
            return d.sum(axis=-1).mean()
        return d.sum(axis=1).mean()
    return d.mean()


# RGB <-> YCbCr (utils.py:194-258); NHWC layout.
def rgb_to_ycbcr(image):
    r, g, b = image[..., 0], image[..., 1], image[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = (b - y) * 0.564 + 0.5
    cr = (r - y) * 0.713 + 0.5
    return jnp.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(image):
    y, cb, cr = image[..., 0], image[..., 1] - 0.5, image[..., 2] - 0.5
    r = y + 1.403 * cr
    g = y - 0.714 * cr - 0.344 * cb
    b = y + 1.773 * cb
    return jnp.stack([r, g, b], axis=-1)
