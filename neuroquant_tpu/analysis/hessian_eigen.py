"""Extremal Hessian eigenvalues of the reconstruction loss w.r.t. decoder
weights.

Equivalent of draw/loss-landscape-master/hess_vec_prod.py:49-148 (double
backprop + scipy eigsh LinearOperator): here the HVP is
jax.jvp(jax.grad(loss)) — one jitted program per matvec — and scipy's eigsh
runs on the host around it. Also exports a per-layer Hessian-interaction
matrix like the paper's 7x7 heatmap (draw/draw_hessian.ipynb): M[i, j] =
v_i' H v_j with v_k the quantization perturbation of layer k.

Run:
  python -m neuroquant_tpu.analysis.hessian_eigen --config <yaml> --arch hnerv \
      --ckpt <pth> --data_path <frames> [--layer_matrix]
"""

from __future__ import annotations

import argparse
import logging
import sys

import numpy as np


def make_hvp(model, params, spec_paths, frames, norm_idx, arch, batch_idx):
    """Returns (matvec(flat_v) -> flat_Hv, total_dim, unflatten)."""
    import jax
    import jax.numpy as jnp

    from neuroquant_tpu.quantization.qmodel import _get, _set

    kernels = {i: _get(params, p)["kernel"] for i, p in enumerate(spec_paths)}
    shapes = {i: k.shape for i, k in kernels.items()}
    sizes = {i: int(np.prod(s)) for i, s in shapes.items()}
    total = sum(sizes.values())

    img = frames[batch_idx]
    inp = norm_idx[batch_idx] if arch == "nerv" else img

    def loss_fn(ks):
        p = params
        for i, path in enumerate(spec_paths):
            layer = dict(_get(p, path))
            layer["kernel"] = ks[i]
            p = _set(p, path, layer)
        pred = model.apply(p, inp)
        return jnp.mean((pred - img) ** 2)

    @jax.jit
    def hvp(vs):
        # reverse-over-forward (grad of the directional derivative): the
        # only composition that passes through the fused tail's custom_jvp
        # 'pallas_hvp' execution (sensitivity.py); identical for XLA paths
        def dirderiv(ks):
            _, dl = jax.jvp(loss_fn, (ks,), (vs,))
            return dl
        return jax.grad(dirderiv)(kernels)

    def unflatten(flat):
        out, off = {}, 0
        for i in sorted(shapes):
            out[i] = jnp.asarray(flat[off:off + sizes[i]]).reshape(shapes[i])
            off += sizes[i]
        return out

    def matvec(flat_v):
        hv = hvp(unflatten(np.asarray(flat_v, np.float32)))
        return np.concatenate([np.asarray(hv[i]).ravel()
                               for i in sorted(shapes)])

    import jax.numpy as jnp  # noqa: F811 (used in closures above)
    return matvec, total, unflatten, hvp, kernels


def extremal_eigenvalues(matvec, dim, k: int = 1, tol: float = 1e-2):
    """(max_eig, min_eig) via scipy eigsh on the implicit operator
    (hess_vec_prod.py min/max strategy: LA then shifted)."""
    from scipy.sparse.linalg import LinearOperator, eigsh

    op = LinearOperator((dim, dim), matvec=matvec, dtype=np.float32)
    max_eig = float(eigsh(op, k=k, which="LA", tol=tol,
                          return_eigenvectors=False)[0])
    shift = abs(max_eig)
    shifted = LinearOperator(
        (dim, dim), matvec=lambda v: matvec(v) - shift * np.asarray(v),
        dtype=np.float32)
    min_eig = float(eigsh(shifted, k=k, which="LA", tol=tol,
                          return_eigenvectors=False)[0]) + shift
    # LA on the shifted operator still finds the most-positive of (H - shift);
    # for the minimum use SA instead:
    min_eig2 = float(eigsh(op, k=k, which="SA", tol=tol,
                           return_eigenvectors=False)[0])
    return max_eig, min(min_eig, min_eig2)


def main(argv):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--arch", type=str, required=True)
    parser.add_argument("--ckpt", type=str, required=True)
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--batch", default=4, type=int)
    parser.add_argument("--tol", default=1e-2, type=float)
    parser.add_argument("--layer_matrix", action="store_true",
                        help="also compute the per-layer v_i' H v_j matrix "
                             "(draw_hessian.ipynb heatmap)")
    parser.add_argument("--out", default="plots/hessian", type=str)
    parser.add_argument("--hvp_impl", default="auto", type=str,
                        choices=["auto", "pallas", "xla"],
                        help="HVP execution: fused Pallas kernels via the "
                             "reverse-over-forward custom_jvp composition, "
                             "or the XLA packed path; 'auto' = pallas on a "
                             "real TPU, xla elsewhere (Pallas interpret "
                             "mode is orders of magnitude slower on CPU)")
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
    # the HVP runs reverse-over-forward through the fused kernels'
    # custom_jvp execution (make_hvp; same composition as bit_assign)
    use_pallas = (args.hvp_impl == "pallas"
                  or (args.hvp_impl == "auto"
                      and jax.default_backend() == "tpu"))
    cfg["fused_tail"] = "pallas_hvp" if use_pallas else "off"
    model = build_model(args.arch, cfg)
    params = model.init(jax.random.PRNGKey(0), example_input(args.arch, cfg, 1))
    params = load_pth(args.ckpt, args.arch, params)
    spec_paths = [tuple(p) for p in quant_layer_paths(args.arch, cfg)]
    batch_idx = jnp.arange(min(args.batch, len(dataset)))

    matvec, dim, unflatten, hvp, kernels = make_hvp(
        model, params, spec_paths, dataset.frames, dataset.norm_idx,
        args.arch, batch_idx)
    logging.info("Hessian dim: %d", dim)
    max_eig, min_eig = extremal_eigenvalues(matvec, dim, tol=args.tol)
    print(f"max_eig={max_eig:.6e} min_eig={min_eig:.6e} "
          f"ratio={abs(min_eig) / max(abs(max_eig), 1e-12):.4f}")

    if args.layer_matrix:
        # per-layer interaction matrix with unit-norm random layer directions
        n = len(spec_paths)
        rng = jax.random.PRNGKey(0)
        vs = []
        for i, (_, k) in enumerate(sorted(kernels.items())):
            r = jax.random.fold_in(rng, i)
            d = jax.random.normal(r, k.shape)
            vs.append(d / jnp.linalg.norm(d))
        M = np.zeros((n, n))
        for j in range(n):
            tang = {i: (vs[i] if i == j else jnp.zeros_like(vs[i]))
                    for i in range(n)}
            hv = hvp(tang)
            for i in range(n):
                M[i, j] = float(jnp.vdot(vs[i], hv[i]))
        import os
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        np.save(args.out + "_layer_matrix.npy", M)
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(5.5, 4.5))
        im = ax.imshow(np.log10(np.abs(M) + 1e-12), cmap="viridis")
        fig.colorbar(im, ax=ax, label="log10 |v_i' H v_j|")
        ax.set_title(f"layer-wise Hessian interaction ({args.arch})")
        fig.savefig(args.out + "_layer_matrix.png", dpi=130)
        logging.info("wrote %s_layer_matrix.png", args.out)
    return max_eig, min_eig


if __name__ == "__main__":
    main(sys.argv[1:])
