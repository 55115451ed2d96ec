"""Per-layer weight statistics plots of a trained decoder.

Equivalent of draw/draw_weight.py:107-176: channel-wise min/max bar charts
plus weight histograms/KDE per quantizable layer, from a .pth checkpoint.

Run:
  python -m neuroquant_tpu.analysis.draw_weight --config <yaml> --arch hnerv \
      --ckpt <epoch300.pth> --out plots/
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def channel_minmax(w_hwio: np.ndarray):
    """(min, max) per output channel of an HWIO conv weight."""
    flat = w_hwio.reshape(-1, w_hwio.shape[-1])
    return flat.min(axis=0), flat.max(axis=0)


def plot_layer(name: str, w_hwio: np.ndarray, out_dir: str):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cmin, cmax = channel_minmax(w_hwio)
    fig, axes = plt.subplots(1, 2, figsize=(11, 4))
    idx = np.arange(len(cmin))
    axes[0].bar(idx, cmax, color="#4c72b0", label="max")
    axes[0].bar(idx, cmin, color="#dd8452", label="min")
    axes[0].set_title(f"{name}: per-channel range")
    axes[0].set_xlabel("output channel")
    axes[0].legend()

    vals = w_hwio.ravel()
    axes[1].hist(vals, bins=101, density=True, color="#55a868", alpha=0.8)
    axes[1].set_title(f"{name}: weight distribution "
                      f"(std={vals.std():.4f}, kurt~{_kurtosis(vals):.2f})")
    axes[1].set_xlabel("weight value")
    fig.tight_layout()
    path = os.path.join(out_dir, f"weights_{name.replace('/', '_')}.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def _kurtosis(x):
    x = x - x.mean()
    return float((x ** 4).mean() / (x ** 2).mean() ** 2)


def main(argv):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--arch", type=str, required=True)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--out", type=str, default="plots")
    args = parser.parse_args(argv)

    import jax

    from neuroquant_tpu.config import get_config
    from neuroquant_tpu.models import build_model, example_input, quant_layer_paths
    from neuroquant_tpu.quantization.qmodel import _get
    from neuroquant_tpu.utils.torch_compat import load_pth

    cfg = get_config(args.config)
    model = build_model(args.arch, cfg)
    params = model.init(jax.random.PRNGKey(0), example_input(args.arch, cfg, 1))
    params = load_pth(args.ckpt, args.arch, params)

    os.makedirs(args.out, exist_ok=True)
    paths = []
    for p in quant_layer_paths(args.arch, cfg):
        w = np.asarray(_get(params, tuple(p))["kernel"])
        paths.append(plot_layer("/".join(p), w, args.out))
    print("\n".join(paths))
    return paths


if __name__ == "__main__":
    main(sys.argv[1:])
