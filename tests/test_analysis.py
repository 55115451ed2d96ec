"""Smoke tests for the analysis/visualization suite (draw_weight, loss
landscape, Hessian eigenvalues, RD curves)."""

import glob
import os

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory, frame_dir, tiny_hnerv_cfg):
    """A 1-epoch checkpoint + config yaml for analysis tools."""
    from neuroquant_tpu.methods import regress

    d = tmp_path_factory.mktemp("analysis")
    cfg = dict(tiny_hnerv_cfg, epoch=4, eval_freq=4, batch_size=1,
               learning_rate=0.004)
    cfg_path = str(d / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    cwd = os.getcwd()
    os.chdir(d)
    try:
        regress.main(["--config", cfg_path, "--arch", "hnerv",
                      "--data_path", frame_dir, "--vid", "t", "--outf", "a",
                      "--snapshot_freq", "1"])
    finally:
        os.chdir(cwd)
    ckpt = glob.glob(str(d / "results/**/epoch4.pth"), recursive=True)[0]
    return ckpt, cfg_path, d


class TestDrawWeight:
    def test_plots_written(self, tiny_ckpt):
        from neuroquant_tpu.analysis import draw_weight
        ckpt, cfg_path, d = tiny_ckpt
        out = str(d / "plots")
        paths = draw_weight.main(["--config", cfg_path, "--arch", "hnerv",
                                  "--ckpt", ckpt, "--out", out])
        assert len(paths) == 5
        for p in paths:
            assert os.path.exists(p) and os.path.getsize(p) > 1000


class TestLossLandscape:
    def test_surface_h5_and_plot(self, tiny_ckpt, frame_dir):
        from neuroquant_tpu.analysis import loss_landscape
        import h5py
        ckpt, cfg_path, d = tiny_ckpt
        out = str(d / "plots/surf")
        surface = loss_landscape.main([
            "--config", cfg_path, "--arch", "hnerv", "--ckpt", ckpt,
            "--data_path", frame_dir, "--x=-0.5:0.5:3", "--y=-0.5:0.5:3",
            "--batch", "2", "--chunk", "3", "--out", out])
        assert surface.shape == (3, 3)
        assert np.isfinite(surface).all()
        # center of the grid is the trained model: lowest (or near-lowest) loss
        assert surface[1, 1] <= surface.min() + 1e-6 or \
            surface[1, 1] < np.median(surface)
        with h5py.File(out + ".h5") as f:
            assert "train_loss" in f and "xcoordinates" in f
        assert os.path.exists(out + ".png")

    def test_quantize_one_layer_changes_surface(self, tiny_ckpt, frame_dir):
        import jax
        import jax.numpy as jnp
        from neuroquant_tpu.analysis import loss_landscape
        from neuroquant_tpu.analysis.loss_landscape import symmetric_quantize_layer

        # Handle_Parameter semantics: <= 2^b - 1 distinct symmetric levels
        w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 4, 5))
        for b in (2, 3, 4):
            wq = symmetric_quantize_layer(w, b)
            assert len(np.unique(np.asarray(wq))) <= 2 ** b - 1 + 1

        ckpt, cfg_path, d = tiny_ckpt
        s_fp = loss_landscape.main([
            "--config", cfg_path, "--arch", "hnerv", "--ckpt", ckpt,
            "--data_path", frame_dir, "--x", "0:0:1", "--y", "0:0:1",
            "--batch", "2", "--out", str(d / "plots/s0")])
        s_q2 = loss_landscape.main([
            "--config", cfg_path, "--arch", "hnerv", "--ckpt", ckpt,
            "--data_path", frame_dir, "--x", "0:0:1", "--y", "0:0:1",
            "--batch", "2", "--lid", "1", "--b_w", "2",
            "--out", str(d / "plots/s2")])
        assert s_q2[0, 0] != s_fp[0, 0]  # quantizing layer 1 perturbs the loss


class TestLossLine1D:
    def test_line_h5_and_plot(self, tiny_ckpt, frame_dir):
        """plot_1D.py analogue: 1-D loss (log axis) + PSNR curve."""
        import h5py
        from neuroquant_tpu.analysis import loss_landscape

        ckpt, cfg_path, d = tiny_ckpt
        out = str(d / "plots/line")
        losses = loss_landscape.main([
            "--config", cfg_path, "--arch", "hnerv", "--ckpt", ckpt,
            "--data_path", frame_dir, "--mode", "line", "--x=-0.5:0.5:5",
            "--batch", "2", "--chunk", "5", "--out", out])
        assert losses.shape == (5,)
        assert np.isfinite(losses).all()
        # the (briefly) trained model at alpha=0 sits near the bottom of the
        # line — the 4-epoch fixture is too undertrained for a strict minimum
        assert losses[2] <= min(losses[0], losses[4]) + 5e-3
        assert losses.max() > losses.min()     # direction actually perturbs
        with h5py.File(out + "_1d.h5") as f:
            assert "train_loss" in f and "train_psnr" in f
        assert os.path.exists(out + "_1d.png")


class TestTrajectoryProjection:
    def test_pca_trajectory(self, tiny_ckpt, frame_dir):
        """projection.py analogue: PCA directions over snapshots, cosine
        projection, contour + path plot."""
        import h5py
        from neuroquant_tpu.analysis import loss_landscape

        ckpt, cfg_path, d = tiny_ckpt
        snap_glob = os.path.join(os.path.dirname(ckpt), "epoch*.pth")
        assert len(glob.glob(snap_glob)) >= 4   # --snapshot_freq 1
        out = str(d / "plots/traj")
        surface = loss_landscape.main([
            "--config", cfg_path, "--arch", "hnerv", "--ckpt", ckpt,
            "--data_path", frame_dir, "--mode", "trajectory",
            "--ckpt_glob", snap_glob, "--x=-0.2:0.2:3", "--y=-0.2:0.2:3",
            "--batch", "2", "--chunk", "3", "--out", out])
        assert surface.shape == (3, 3) and np.isfinite(surface).all()
        with h5py.File(out + "_proj_cos.h5") as f:
            px, py = f["proj_xcoord"][:], f["proj_ycoord"][:]
        assert len(px) == len(glob.glob(snap_glob))
        # the final snapshot IS the center model: projects to ~origin
        assert abs(px[-1]) < 1e-3 and abs(py[-1]) < 1e-3
        # earlier snapshots are farther from the final model along PC1
        assert abs(px[0]) > abs(px[-1])
        with h5py.File(out + "_dirs.h5") as f:
            evr = f["explained_variance_ratio_"][:]
        assert evr[0] >= evr[1] > 0
        assert os.path.exists(out + ".png")


class TestVtpExport:
    def test_vtp_is_valid_polydata(self, tmp_path):
        """h52vtp.py analogue: grid surface -> ParaView vtkPolyData XML."""
        import xml.etree.ElementTree as ET

        from neuroquant_tpu.analysis.loss_landscape import export_vtp

        xs = np.linspace(-1, 1, 4)
        ys = np.linspace(-1, 1, 3)
        surf = np.random.RandomState(0).rand(4, 3)
        out = export_vtp(xs, ys, surf, str(tmp_path / "s.vtp"), log=True)
        root = ET.parse(out).getroot()
        assert root.tag == "VTKFile" and root.get("type") == "PolyData"
        piece = root.find("PolyData/Piece")
        assert int(piece.get("NumberOfPoints")) == 12
        assert int(piece.get("NumberOfPolys")) == 3 * 2
        pts = piece.find("Points/DataArray").text.split()
        assert len(pts) == 12 * 3
        conn = piece.find("Polys/DataArray[@Name='connectivity']").text.split()
        assert len(conn) == 6 * 4 and max(int(c) for c in conn) == 11


class TestHessianEigen:
    def test_eigenvalues(self, tiny_ckpt, frame_dir):
        from neuroquant_tpu.analysis import hessian_eigen
        ckpt, cfg_path, d = tiny_ckpt
        max_eig, min_eig = hessian_eigen.main([
            "--config", cfg_path, "--arch", "hnerv", "--ckpt", ckpt,
            "--data_path", frame_dir, "--batch", "2", "--tol", "0.1",
            "--out", str(d / "plots/hess")])
        assert np.isfinite(max_eig) and np.isfinite(min_eig)
        assert max_eig > 0 and min_eig <= max_eig


class TestRDCurves:
    def test_bd_rate_vr_saves_rate(self, tmp_path):
        from neuroquant_tpu.analysis.rd_curves import (
            PUBLISHED_UVG, bd_psnr, bd_rate, plot,
        )
        a, t = PUBLISHED_UVG["NeRV"], PUBLISHED_UVG["NeRV-VR"]
        r = bd_rate(a["bpp"], a["psnr"], t["bpp"], t["psnr"])
        # the paper's headline: variable-rate NeuroQuant saves rate vs NeRV
        assert r < 0, r
        p = bd_psnr(a["bpp"], a["psnr"], t["bpp"], t["psnr"])
        assert np.isfinite(p)
        out = str(tmp_path / "rd.png")
        plot(out)
        assert os.path.getsize(out) > 5000

    def test_bd_rate_identity_zero(self):
        from neuroquant_tpu.analysis.rd_curves import PUBLISHED_UVG, bd_rate
        a = PUBLISHED_UVG["HNeRV-VR"]
        assert abs(bd_rate(a["bpp"], a["psnr"], a["bpp"], a["psnr"])) < 1e-6
