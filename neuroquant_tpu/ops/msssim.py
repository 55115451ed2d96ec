"""SSIM / MS-SSIM in pure JAX (NHWC), replacing the reference's pytorch_msssim
dependency (utils.py:12) with the same algorithm: 11-tap Gaussian window
(sigma 1.5), K=(0.01, 0.03), valid-padding separable filtering, 5 MS levels
with weights [0.0448, 0.2856, 0.3001, 0.2363, 0.1333], and torch-style 2x2
average-pool downsampling (zero pad on odd dims, count_include_pad).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gauss_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _gaussian_filter(x, win):
    """Separable valid-padding Gaussian blur, per channel. x: NHWC.

    Runs at HIGHEST precision: the SSIM variance terms are computed as
    E[x^2] - E[x]^2, which catastrophically cancels under the TPU's default
    bf16 matmul passes (observed as MS-SSIM ~0.75 instead of ~0.96 on
    decodes whose fp32 value is fine).
    """
    c = x.shape[-1]
    kh = win.reshape(-1, 1, 1, 1)          # (K,1,1,1) HWIO for depthwise
    kw = win.reshape(1, -1, 1, 1)
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    kh = jnp.tile(kh, (1, 1, 1, c))
    kw = jnp.tile(kw, (1, 1, 1, c))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    return x


def _avg_pool2_torch(x):
    """torch F.avg_pool2d(x, 2, padding=[h%2, w%2]) with count_include_pad."""
    n, h, w, c = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return s / 4.0


def _ssim_maps(x, y, data_range, win, k=(0.01, 0.03)):
    k1, k2 = k
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu1 = _gaussian_filter(x, win)
    mu2 = _gaussian_filter(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _gaussian_filter(x * x, win) - mu1_sq
    sigma2_sq = _gaussian_filter(y * y, win) - mu2_sq
    sigma12 = _gaussian_filter(x * y, win) - mu1_mu2

    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    # per-image, per-channel means over the valid spatial window
    ssim_pc = ssim_map.mean(axis=(1, 2))
    cs_pc = cs_map.mean(axis=(1, 2))
    return ssim_pc, cs_pc


def ssim(x, y, data_range: float = 1.0, size_average: bool = True,
         win_size: int = 11, win_sigma: float = 1.5, k=(0.01, 0.03)):
    """Single-scale SSIM. x, y: NHWC in [0, data_range]."""
    win = jnp.asarray(_gauss_window(win_size, win_sigma))
    ssim_pc, _ = _ssim_maps(x, y, data_range, win, k)
    per_image = ssim_pc.mean(axis=-1)
    return per_image.mean() if size_average else per_image


def ms_ssim(x, y, data_range: float = 1.0, size_average: bool = True,
            win_size: int = 11, win_sigma: float = 1.5,
            weights=_MS_WEIGHTS, k=(0.01, 0.03)):
    """Multi-scale SSIM. Smallest side must exceed (win_size-1) * 2**4."""
    assert x.shape == y.shape, (x.shape, y.shape)
    levels = len(weights)
    smaller = min(x.shape[1], x.shape[2])
    assert smaller > (win_size - 1) * (2 ** (levels - 1)), (
        f"image too small for {levels}-level ms-ssim: {x.shape}")

    win = jnp.asarray(_gauss_window(win_size, win_sigma))
    w = jnp.asarray(weights)

    mcs = []
    for i in range(levels):
        ssim_pc, cs_pc = _ssim_maps(x, y, data_range, win, k)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs_pc))
            x = _avg_pool2_torch(x)
            y = _avg_pool2_torch(y)
    ssim_pc = jax.nn.relu(ssim_pc)
    stack = jnp.stack(mcs + [ssim_pc], axis=0)          # (levels, N, C)
    val = jnp.prod(stack ** w[:, None, None], axis=0)   # (N, C)
    per_image = val.mean(axis=-1)
    return per_image.mean() if size_average else per_image
