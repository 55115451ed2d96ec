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
                    b_w: int = 0, seed: int = 123, dirs=None):
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
    if dirs is not None:
        d1, d2 = dirs   # e.g. PCA directions from the optimization path
    else:
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

        from neuroquant_tpu.parallel import make_mesh
        mesh = make_mesh()
        n_dev = len(jax.devices())
        chunk = max(chunk, n_dev)
        chunk -= chunk % n_dev
        eval_chunk = jax.jit(jax.shard_map(
            jax.vmap(loss_at), mesh=mesh, in_specs=(P("data"), P("data")),
            out_specs=P("data"), check_vma=False))
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


def compute_line(model, params, spec_paths, frames, norm_idx, arch, xs,
                 batch_idx, chunk: int = 8, lid: int = -1, b_w: int = 0,
                 seed: int = 123):
    """1-D loss/PSNR curve along one filter-normalized direction (the
    reference fork's plot_1D.py loss/accuracy line; PSNR stands in for the
    classification accuracy axis)."""
    import jax
    import jax.numpy as jnp

    from neuroquant_tpu.quantization.qmodel import _get, _set

    if lid >= 0 and b_w > 0:
        path = spec_paths[lid]
        layer = dict(_get(params, path))
        layer["kernel"] = symmetric_quantize_layer(layer["kernel"], b_w)
        params = _set(params, path, layer)

    kernels = [_get(params, p)["kernel"] for p in spec_paths]
    d1 = filter_normalized_direction(jax.random.PRNGKey(seed), kernels)
    img = frames[batch_idx]
    inp = norm_idx[batch_idx] if arch == "nerv" else img

    def loss_at(alpha):
        p = params
        for path, w, a in zip(spec_paths, kernels, d1):
            layer = dict(_get(p, path))
            layer["kernel"] = w + alpha * a
            p = _set(p, path, layer)
        pred = model.apply(p, inp)
        return jnp.mean((pred - img) ** 2)

    eval_chunk = jax.jit(jax.vmap(loss_at))
    losses = []
    for s in range(0, len(xs), chunk):
        c = np.asarray(xs[s:s + chunk], np.float32)
        pad = chunk - len(c)
        if pad:
            c = np.concatenate([c, np.zeros(pad, c.dtype)])
        out = np.asarray(eval_chunk(jnp.asarray(c)))
        losses.append(out[:chunk - pad] if pad else out)
        logging.info("line: %d/%d points", min(s + chunk, len(xs)), len(xs))
    losses = np.concatenate(losses)
    psnr = -10.0 * np.log10(losses + 1e-9)
    return losses, psnr


def flatten_dirlist(dirs):
    return np.concatenate([np.asarray(d).reshape(-1) for d in dirs])


def pca_directions(ckpt_files, final_kernels, arch, params_template,
                   spec_paths):
    """PCA(2) of the optimization path w_i - w_final over the decoder conv
    kernels (the reference's setup_PCA_directions, projection.py:179-240;
    biases ignored = its 'biasbn' mode). Returns (d1_list, d2_list,
    explained_variance_ratio)."""
    from neuroquant_tpu.quantization.qmodel import _get
    from neuroquant_tpu.utils.torch_compat import load_pth

    mat = []
    for f in ckpt_files:
        p = load_pth(f, arch, params_template)
        ks = [_get(p, path)["kernel"] for path in spec_paths]
        mat.append(flatten_dirlist([np.asarray(k) - np.asarray(w)
                                    for k, w in zip(ks, final_kernels)]))
    mat = np.stack(mat)                      # (n_ckpts, n_params)
    mat = mat - mat.mean(axis=0, keepdims=True)
    _, svals, vt = np.linalg.svd(mat, full_matrices=False)
    var = svals ** 2
    evr = var / var.sum()
    pc1, pc2 = vt[0], vt[1]

    def unflatten(vec):
        out, off = [], 0
        for w in final_kernels:
            n = int(np.prod(np.asarray(w).shape))
            out.append(vec[off:off + n].reshape(np.asarray(w).shape)
                       .astype(np.float32))
            off += n
        return out

    return unflatten(pc1), unflatten(pc2), evr[:2]


def project_trajectory(ckpt_files, final_kernels, d1, d2, arch,
                       params_template, spec_paths):
    """Cosine projection of each snapshot's (w_i - w_final) onto the two
    directions (projection.py project_1D/project_2D 'cos')."""
    from neuroquant_tpu.quantization.qmodel import _get
    from neuroquant_tpu.utils.torch_compat import load_pth

    fx = flatten_dirlist(d1)
    fy = flatten_dirlist(d2)
    xs, ys = [], []
    for f in ckpt_files:
        p = load_pth(f, arch, params_template)
        ks = [_get(p, path)["kernel"] for path in spec_paths]
        d = flatten_dirlist([np.asarray(k) - np.asarray(w)
                             for k, w in zip(ks, final_kernels)])
        xs.append(float(np.dot(d, fx) / (np.linalg.norm(fx) + 1e-12)))
        ys.append(float(np.dot(d, fy) / (np.linalg.norm(fy) + 1e-12)))
    return np.asarray(xs), np.asarray(ys)


def export_vtp(xs, ys, surface, out_path, log: bool = False,
               zmax: float = -1.0):
    """Write the surface as a ParaView-readable vtkPolyData .vtp (XML): grid
    points at (x, y, z=loss) with a 'zvalue' point-data array and quad cells
    — the reference fork's h52vtp.py output, rebuilt as a direct XML emit."""
    z = np.asarray(surface, np.float64).copy()
    if zmax > 0:
        z = np.minimum(z, zmax)
    if log:
        z = np.log(z + 0.1)
    nx, ny = len(xs), len(ys)
    xx, yy = np.meshgrid(np.asarray(xs), np.asarray(ys), indexing="ij")
    pts = np.stack([xx.reshape(-1), yy.reshape(-1), z.reshape(-1)], -1)
    n_pts = nx * ny

    # quad connectivity over the grid
    quads = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a = i * ny + j
            quads.append((a, a + 1, a + ny + 1, a + ny))
    quads = np.asarray(quads, np.int64)

    def arr(tag, name, data, ncomp, dtype="Float32"):
        flat = np.asarray(data).reshape(-1)
        body = "\n".join(" ".join(str(v) for v in flat[k:k + 9])
                         for k in range(0, len(flat), 9))
        return (f'<DataArray type="{dtype}" Name="{name}" '
                f'NumberOfComponents="{ncomp}" format="ascii" '
                f'RangeMin="{flat.min()}" RangeMax="{flat.max()}">\n'
                f"{body}\n</DataArray>\n")

    with open(out_path, "w") as f:
        f.write('<VTKFile type="PolyData" version="1.0" '
                'byte_order="LittleEndian" header_type="UInt64">\n'
                "<PolyData>\n"
                f'<Piece NumberOfPoints="{n_pts}" NumberOfVerts="0" '
                'NumberOfLines="0" NumberOfStrips="0" '
                f'NumberOfPolys="{len(quads)}">\n')
        f.write('<PointData Scalars="zvalue">\n')
        f.write(arr("PointData", "zvalue", pts[:, 2], 1))
        f.write("</PointData>\n<Points>\n")
        f.write(arr("Points", "Points", pts, 3))
        f.write("</Points>\n<Polys>\n")
        f.write(arr("Polys", "connectivity", quads, 1, "Int64"))
        offsets = np.arange(1, len(quads) + 1, dtype=np.int64) * 4
        f.write(arr("Polys", "offsets", offsets, 1, "Int64"))
        f.write("</Polys>\n</Piece>\n</PolyData>\n</VTKFile>\n")
    logging.info("wrote %s (%d points, %d quads)", out_path, n_pts, len(quads))
    return out_path


def main(argv):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--arch", type=str, required=True)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--mode", default="surface", type=str,
                        choices=["surface", "line", "trajectory"],
                        help="2-D surface (plot_surface), 1-D loss/PSNR line "
                             "(plot_1D), or PCA trajectory over snapshots "
                             "(projection.py)")
    parser.add_argument("--ckpt_glob", default="", type=str,
                        help="trajectory mode: glob of snapshot .pth files "
                             "in training order (regress --snapshot_freq)")
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
    parser.add_argument("--export_vtp", action="store_true", default=False,
                        help="also write a ParaView .vtp of the surface "
                             "(the fork's h52vtp.py)")
    parser.add_argument("--vtp_log", action="store_true", default=False)
    parser.add_argument("--vtp_zmax", default=-1.0, type=float)
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
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    import h5py

    if args.mode == "line":
        losses, psnr = compute_line(
            model, params, spec_paths, dataset.frames, dataset.norm_idx,
            args.arch, xs, batch_idx, chunk=args.chunk, lid=args.lid,
            b_w=args.b_w)
        with h5py.File(args.out + "_1d.h5", "w") as f:
            f["xcoordinates"] = xs
            f["train_loss"] = losses
            f["train_psnr"] = psnr     # the accuracy axis of plot_1D.py
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax1 = plt.subplots(figsize=(6, 4))
        ax2 = ax1.twinx()
        ax1.semilogy(xs, losses, "b-", label="Training loss")
        ax2.plot(xs, psnr, "r-", label="PSNR (dB)")
        ax1.set_xlabel("alpha")
        ax1.set_ylabel("Loss", color="b")
        ax2.set_ylabel("PSNR (dB)", color="r")
        ax1.set_title(f"1-D loss line ({args.arch}, lid={args.lid}, b_w={args.b_w})")
        fig.savefig(args.out + "_1d.png", dpi=130, bbox_inches="tight")
        logging.info("wrote %s_1d.{h5,png}", args.out)
        return losses

    dirs = None
    traj = None
    if args.mode == "trajectory":
        import glob as globmod

        from neuroquant_tpu.quantization.qmodel import _get
        files = sorted(globmod.glob(args.ckpt_glob))
        assert len(files) >= 3, \
            f"trajectory mode needs >=3 snapshots, got {len(files)} from {args.ckpt_glob!r}"
        final_kernels = [_get(params, p)["kernel"] for p in spec_paths]
        d1, d2, evr = pca_directions(files, final_kernels, args.arch, params,
                                     spec_paths)
        logging.info("PCA explained variance: %.1f%% / %.1f%%",
                     100 * evr[0], 100 * evr[1])
        px, py = project_trajectory(files, final_kernels, d1, d2, args.arch,
                                    params, spec_paths)
        with h5py.File(args.out + "_dirs.h5", "w") as f:
            for i, d in enumerate(d1):
                f[f"xdirection/{i}"] = d
            for i, d in enumerate(d2):
                f[f"ydirection/{i}"] = d
            f["explained_variance_ratio_"] = evr
        with h5py.File(args.out + "_proj_cos.h5", "w") as f:
            f["proj_xcoord"] = px
            f["proj_ycoord"] = py
        # widen the grid to cover the trajectory (net_plotter convention)
        xs = np.linspace(min(x0, px.min() * 1.1), max(x1, px.max() * 1.1), xn)
        ys = np.linspace(min(y0, py.min() * 1.1), max(y1, py.max() * 1.1), yn)
        dirs = ([jnp.asarray(d) for d in d1], [jnp.asarray(d) for d in d2])
        traj = (px, py)

    surface = compute_surface(model, params, spec_paths, dataset.frames,
                              dataset.norm_idx, args.arch, xs, ys, batch_idx,
                              chunk=args.chunk, lid=args.lid, b_w=args.b_w,
                              dirs=dirs)

    h5_path = args.out + ".h5"
    with h5py.File(h5_path, "w") as f:           # same keys as the tool
        f["xcoordinates"] = xs
        f["ycoordinates"] = ys
        f["train_loss"] = surface
    logging.info("wrote %s", h5_path)
    if args.export_vtp:
        export_vtp(xs, ys, surface, args.out + ".vtp", log=args.vtp_log,
                   zmax=args.vtp_zmax)

    if len(xs) >= 2 and len(ys) >= 2:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(6, 5))
        cs = ax.contour(xs, ys, surface.T, levels=15)
        ax.clabel(cs, inline=True, fontsize=7)
        if traj is not None:
            ax.plot(traj[0], traj[1], marker=".", color="r", linewidth=1,
                    label="optimization path")
            ax.legend(fontsize=8)
        ax.set_title(f"loss surface ({args.arch}, lid={args.lid}, b_w={args.b_w})")
        fig.savefig(args.out + ".png", dpi=130)
        logging.info("wrote %s.png", args.out)
    return surface


if __name__ == "__main__":
    main(sys.argv[1:])
