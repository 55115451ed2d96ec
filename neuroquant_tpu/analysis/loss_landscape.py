"""Loss-landscape surfaces around a trained (optionally one-layer-quantized)
decoder, TPU-parallel.

Re-designs the vendored loss-landscape fork (draw/loss-landscape-master/
plot_hnerv_surface.py): filter-normalized random directions
(net_plotter.py:99-146), optional symmetric quantization of ONE chosen layer
(`Handle_Parameter`, plot_hnerv_surface.py:149-168), MSE loss over an
(alpha, beta) grid, h5 output with the same keys, contour plot.

The reference parallelizes the grid with MPI ranks + a static job scheduler
(mpi4pytorch.py, scheduler.py:37-60). Here the grid is embarrassingly
parallel on-device: grid points are vmapped in chunks (one XLA program
evaluates a whole chunk of perturbed decoders), and chunks shard over a
jax mesh when multiple chips are available — no collectives beyond the
implicit gather.

Run:
  python -m neuroquant_tpu.analysis.loss_landscape --config <yaml> --arch hnerv \
      --ckpt <epoch300.pth> --data_path <frames> --x=-1:1:21 --y=-1:1:21 \
      [--lid 3 --b_w 4]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np


def parse_range(spec: str):
    lo, hi, num = spec.split(":")
    return float(lo), float(hi), int(num)


def filter_normalized_direction(rng, params_leaves):
    """Random direction with per-filter norm matched to the weights
    (net_plotter.py:99-146: d_filter *= ||w_filter|| / ||d_filter||).
    For HWIO conv kernels a 'filter' is one output channel; biases get a
    zero direction (the tool ignores 1-D params)."""
    import jax
    import jax.numpy as jnp

    dirs = []
    for i, w in enumerate(params_leaves):
        k = jax.random.fold_in(rng, i)
        d = jax.random.normal(k, w.shape, w.dtype)
        if w.ndim <= 1:
            dirs.append(jnp.zeros_like(w))
            continue
        flat_w = w.reshape(-1, w.shape[-1])
        flat_d = d.reshape(-1, w.shape[-1])
        norm_w = jnp.linalg.norm(flat_w, axis=0)
        norm_d = jnp.linalg.norm(flat_d, axis=0) + 1e-10
        dirs.append((flat_d * (norm_w / norm_d)).reshape(w.shape))
    return dirs


def symmetric_quantize_layer(w, n_bits: int):
    """Simple symmetric round of one layer (plot_hnerv_surface.py:149-168)."""
    import jax.numpy as jnp

    scale = jnp.abs(w).max() / (2 ** (n_bits - 1) - 1)
    return jnp.round(w / scale) * scale


def compute_surface(model, params, spec_paths, frames, norm_idx, arch,
                    xs, ys, batch_idx, chunk: int = 8, lid: int = -1,
                    b_w: int = 0, seed: int = 123):
    import jax
    import jax.numpy as jnp

    from neuroquant_tpu.quantization.qmodel import _get, _set

    # quantize one chosen layer before building directions (reference order)
    if lid >= 0 and b_w > 0:
        path = spec_paths[lid]
        layer = dict(_get(params, path))
        layer["kernel"] = symmetric_quantize_layer(layer["kernel"], b_w)
        params = _set(params, path, layer)

    kernels = [_get(params, p)["kernel"] for p in spec_paths]
    rng = jax.random.PRNGKey(seed)
    r1, r2 = jax.random.split(rng)
    d1 = filter_normalized_direction(r1, kernels)
    d2 = filter_normalized_direction(r2, kernels)

    img = frames[batch_idx]
    inp = norm_idx[batch_idx] if arch == "nerv" else img

    def loss_at(alpha, beta):
        p = params
        for path, w, a, b in zip(spec_paths, kernels, d1, d2):
            layer = dict(_get(p, path))
            layer["kernel"] = w + alpha * a + beta * b
            p = _set(p, path, layer)
        pred = model.apply(p, inp)
        return jnp.mean((pred - img) ** 2)

    # grid points split over the device mesh (the TPU replacement for the
    # reference's MPI rank split, scheduler.py:37-60): shard_map hands each
    # chip chunk/n_devices perturbed decoders to vmap locally; the result
    # gather is implicit. (Plain input sharding can't express this: vmap over
    # kernels lowers to a grouped conv whose groups must divide C_out.)
    if len(jax.devices()) > 1:
        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        from neuroquant_tpu.parallel import make_mesh
        mesh = make_mesh()
        n_dev = len(jax.devices())
        chunk = max(chunk, n_dev)
        chunk -= chunk % n_dev
        eval_chunk = jax.jit(shard_map(
            jax.vmap(loss_at), mesh=mesh, in_specs=(P("data"), P("data")),
            out_specs=P("data"), check_rep=False))
    else:
        eval_chunk = jax.jit(jax.vmap(loss_at))

    coords = np.stack(np.meshgrid(xs, ys, indexing="ij"), -1).reshape(-1, 2)
    losses = []
    for s in range(0, len(coords), chunk):
        c = coords[s:s + chunk]
        pad = chunk - len(c)
        if pad:
            c = np.concatenate([c, np.zeros((pad, 2), c.dtype)])
        a, b = jnp.asarray(c[:, 0]), jnp.asarray(c[:, 1])
        out = np.asarray(eval_chunk(a, b))
        losses.append(out[:chunk - pad] if pad else out)
        logging.info("surface: %d/%d points", min(s + chunk, len(coords)),
                     len(coords))
    return np.concatenate(losses).reshape(len(xs), len(ys))


def main(argv):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--arch", type=str, required=True)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--x", default="-1:1:11", type=str)
    parser.add_argument("--y", default="-1:1:11", type=str)
    parser.add_argument("--lid", default=-1, type=int,
                        help="layer index to pre-quantize (-1: none)")
    parser.add_argument("--b_w", default=0, type=int, help="bits for --lid")
    parser.add_argument("--batch", default=4, type=int,
                        help="frames in the loss batch")
    parser.add_argument("--chunk", default=8, type=int,
                        help="grid points per vmapped device program")
    parser.add_argument("--out", default="plots/surface", type=str)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp

    from neuroquant_tpu.config import get_config
    from neuroquant_tpu.data import VideoDataSet
    from neuroquant_tpu.models import build_model, example_input, quant_layer_paths
    from neuroquant_tpu.utils.torch_compat import load_pth

    cfg = get_config(args.config)
    dataset = VideoDataSet(cfg, args.data_path)
    model = build_model(args.arch, cfg)
    params = model.init(jax.random.PRNGKey(0), example_input(args.arch, cfg, 1))
    params = load_pth(args.ckpt, args.arch, params)
    spec_paths = [tuple(p) for p in quant_layer_paths(args.arch, cfg)]

    x0, x1, xn = parse_range(args.x)
    y0, y1, yn = parse_range(args.y)
    xs, ys = np.linspace(x0, x1, xn), np.linspace(y0, y1, yn)
    batch_idx = jnp.arange(min(args.batch, len(dataset)))

    surface = compute_surface(model, params, spec_paths, dataset.frames,
                              dataset.norm_idx, args.arch, xs, ys, batch_idx,
                              chunk=args.chunk, lid=args.lid, b_w=args.b_w)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    import h5py
    h5_path = args.out + ".h5"
    with h5py.File(h5_path, "w") as f:           # same keys as the tool
        f["xcoordinates"] = xs
        f["ycoordinates"] = ys
        f["train_loss"] = surface
    logging.info("wrote %s", h5_path)

    if len(xs) >= 2 and len(ys) >= 2:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(6, 5))
        cs = ax.contour(xs, ys, surface.T, levels=15)
        ax.clabel(cs, inline=True, fontsize=7)
        ax.set_title(f"loss surface ({args.arch}, lid={args.lid}, b_w={args.b_w})")
        fig.savefig(args.out + ".png", dpi=130)
        logging.info("wrote %s.png", args.out)
    return surface


if __name__ == "__main__":
    main(sys.argv[1:])
