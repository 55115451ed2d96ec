"""Video frame dataset, TPU-first: decode once, keep the whole clip in HBM.

The reference streams PNG frames through a 4-worker torch DataLoader per epoch
(videosets/datasets.py:8-54, configs `workers: 4`). On TPU the entire Bunny
clip is ~1.3 GB fp32 — far below HBM capacity — so we decode every frame once
on the host, center-crop, normalize, and park a single (N, H, W, 3) device
array next to the compute. Training/eval then index it on-device: zero
host<->device traffic in the hot loop (this is a large part of the calibration
speedup the baseline asks for).

Keeps the reference's observable semantics: sorted directory listing, uint8
PNG -> /255., torchvision-style center crop, per-frame norm_idx = idx / N,
and `final_size` from frame 0, plus the diff-mode (previous/future frame)
sample dict (videosets/datasets.py:34-47).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def _read_image(path: str) -> np.ndarray:
    """uint8 HWC image. PIL decode matches torchvision read_image pixels."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def center_crop(img: np.ndarray, crop_hw: Tuple[int, int]) -> np.ndarray:
    """torchvision center_crop semantics for HWC arrays (crop <= image)."""
    ch, cw = crop_hw
    h, w = img.shape[:2]
    if (h, w) == (ch, cw):
        return img
    top = int(round((h - ch) / 2.0))
    left = int(round((w - cw) / 2.0))
    if top < 0 or left < 0:
        pad_h, pad_w = max(ch - h, 0), max(cw - w, 0)
        img = np.pad(img, ((pad_h // 2, pad_h - pad_h // 2),
                           (pad_w // 2, pad_w - pad_w // 2), (0, 0)))
        h, w = img.shape[:2]
        top = int(round((h - ch) / 2.0))
        left = int(round((w - cw) / 2.0))
    return img[top:top + ch, left:left + cw]


class VideoDataSet:
    """All frames of one clip as a device-resident NHWC float32 array.

    Attributes:
      frames:    jnp (N, crop_h, crop_w, 3) float32 in [0, 1] on device
      norm_idx:  jnp (N,) float32, idx / N
      final_size: crop_h * crop_w (reference: videosets/datasets.py:15)
    """

    def __init__(self, cfg: dict, data_path: str, device=None):
        import jax
        import jax.numpy as jnp

        names = sorted(os.listdir(data_path))
        self.paths = [os.path.join(data_path, x) for x in names]
        self.crop_h, self.crop_w = cfg["crop_h"], cfg["crop_w"]
        self.diff = bool(cfg.get("diff_enc", False))

        frames_u8 = np.stack([
            center_crop(_read_image(p), (self.crop_h, self.crop_w))
            for p in self.paths
        ])

        self.final_size = self.crop_h * self.crop_w
        # upload uint8 (4x fewer host->device bytes) and normalize on-device;
        # the fp32 copy lives in HBM next to the compute
        u8 = jax.device_put(jnp.asarray(frames_u8), device)
        self.frames = (u8.astype(jnp.float32) / 255.0).block_until_ready()
        del u8
        n = len(self.paths)
        self.norm_idx = jax.device_put(
            jnp.arange(n, dtype=jnp.float32) / n, device)

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int) -> dict:
        """Reference-compatible sample dict (videosets/datasets.py:33-54)."""
        if self.diff:
            id_p = idx - 1 if idx != 0 else idx
            id_f = idx + 1 if idx != len(self) - 1 else idx
            return {
                "img_id": idx,
                "img_gt": self.frames[idx],
                "img_p": self.frames[id_p],
                "img_f": self.frames[id_f],
            }
        return {"img": self.frames[idx], "idx": idx,
                "norm_idx": float(idx) / len(self)}

    def batches(self, batch_size: int, indices=None, drop_last: bool = False):
        """Host-side iterator of (frame_batch, norm_idx_batch, idx_batch)."""
        import jax.numpy as jnp

        idxs = np.asarray(indices if indices is not None else np.arange(len(self)))
        n = len(idxs)
        stop = n - n % batch_size if drop_last else n
        for s in range(0, stop, batch_size):
            sel = jnp.asarray(idxs[s:s + batch_size])
            yield self.frames[sel], self.norm_idx[sel], sel
