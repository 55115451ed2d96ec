"""Test configuration: force CPU jax with a virtual 8-device mesh so sharding
tests run without TPU hardware, and build tiny video fixtures once."""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (the tunneled
# TPU), but tests must run on the host with a virtual device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter startup, which takes precedence over the env var — override
# it back so tests never touch the real TPU (slow remote compiles, bf16
# matmul precision).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")
FRAME_DIR = os.path.join(FIXTURE_DIR, "frames")

TINY_H, TINY_W, TINY_N = 80, 160, 8


def _make_frames():
    """8 deterministic 160x80 frames: gradient background + moving square."""
    from PIL import Image

    os.makedirs(FRAME_DIR, exist_ok=True)
    if len(os.listdir(FRAME_DIR)) == TINY_N:
        return
    yy, xx = np.mgrid[0:TINY_H, 0:TINY_W]
    for t in range(TINY_N):
        img = np.zeros((TINY_H, TINY_W, 3), np.float32)
        img[..., 0] = xx / TINY_W
        img[..., 1] = yy / TINY_H
        img[..., 2] = 0.5 + 0.5 * np.sin(2 * np.pi * t / TINY_N)
        cx, cy = 20 + 12 * t, 30 + 4 * t
        img[cy:cy + 16, cx:cx + 16] = [0.9, 0.1, 0.2]
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(FRAME_DIR, f"{t + 1:04d}.png"))


_make_frames()


@pytest.fixture(scope="session")
def frame_dir():
    return FRAME_DIR


@pytest.fixture(scope="session")
def tiny_hnerv_cfg():
    return dict(
        crop_h=TINY_H, crop_w=TINY_W, diff_enc=False, stage_block=1,
        enc_strides=[5, 4, 4], enc_channel=[16, 16, 8],
        channel_reduce=1.2, channel_lbound=4, dec_in_channel=24,
        dec_kernels=[1, 3, 3], dec_strides=[5, 4, 4], dec_norm="none",
        dec_acts="gelu", out_bias="tanh", loss="l2", epoch=4, workers=0,
        eval_freq=2, batch_size=2, learning_rate=0.002)


@pytest.fixture(scope="session")
def tiny_nerv_cfg():
    return dict(
        crop_h=TINY_H, crop_w=TINY_W, diff_enc=False, base=1.25, level=16,
        channel_reduce=2, channel_lbound=6, dec_in_channel=32,
        dec_kernels=[3, 3, 3], dec_strides=[5, 4, 4], dec_norm="none",
        dec_acts="gelu", out_bias="tanh", loss="l2", epoch=4, workers=0,
        eval_freq=2, batch_size=2, learning_rate=0.002)


@pytest.fixture(scope="session")
def tiny_pnerv_cfg():
    # exc block upsamples x10 from the (1, 2) embedding -> kfc grid (10, 20);
    # kfc_strides [2, 2, 2] then reach 80x160
    return dict(
        crop_h=TINY_H, crop_w=TINY_W, diff_enc=False, enc_channel=12,
        emd_channel=8, enc_strides=[5, 4, 4], kfc_h_w_c=[10, 20, 10],
        kfc_strides=[2, 2, 2], dec_norm="none", dec_acts="gelu",
        loss="l2", epoch=2, workers=0, eval_freq=2, batch_size=2,
        learning_rate=0.002)
