"""CLI-driven data parallelism: --mesh_devices on regress and
calibrate_network must produce the same quality as single-device runs
(VERDICT round-1 item 4 — the 8-chip speedup must be a reachable
configuration, not an extrapolation). Runs on the conftest virtual
8-CPU-device mesh."""

import glob
import os
import re

import pytest
import yaml


def _write_cfg(d, name, cfg):
    path = str(d / f"{name}.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def _final_psnr(outdir):
    logs = sorted(glob.glob(os.path.join(outdir, "**/*.log"), recursive=True))
    text = open(logs[-1]).read()
    vals = re.findall(r"pred_seen_psnr: ([\d.]+)", text)
    assert vals, text[-2000:]
    return float(vals[-1])


class TestRegressDP:
    def test_mesh_matches_single_device(self, tmp_path, frame_dir,
                                        tiny_hnerv_cfg):
        from neuroquant_tpu.methods import regress

        cfg = dict(tiny_hnerv_cfg, epoch=4, eval_freq=4, batch_size=4,
                   learning_rate=0.004)
        cfg_path = _write_cfg(tmp_path, "hnerv", cfg)
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            regress.main([
                "--config", cfg_path, "--arch", "hnerv", "--data_path",
                frame_dir, "--vid", "tiny", "--outf", "single"])
            regress.main([
                "--config", cfg_path, "--arch", "hnerv", "--data_path",
                frame_dir, "--vid", "tiny", "--outf", "dp",
                "--mesh_devices", "4"])
        finally:
            os.chdir(cwd)
        p1 = _final_psnr(str(tmp_path / "results/single"))
        p2 = _final_psnr(str(tmp_path / "results/dp"))
        # same shuffles, same math; only float reduction order differs
        assert abs(p1 - p2) < 0.15, (p1, p2)


class TestCalibrateDP:
    def test_mesh_calibration_matches(self, tmp_path, frame_dir,
                                      tiny_hnerv_cfg):
        from neuroquant_tpu.methods import calibrate_network, regress

        cfg = dict(tiny_hnerv_cfg, epoch=4, eval_freq=4, batch_size=1,
                   learning_rate=0.004)
        cfg_path = _write_cfg(tmp_path, "hnerv", cfg)
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            regress.main([
                "--config", cfg_path, "--arch", "hnerv", "--data_path",
                frame_dir, "--vid", "tiny", "--outf", "t1"])
            ckpt = glob.glob(str(tmp_path / "results/t1/**/epoch4.pth"),
                             recursive=True)[0]
            common_args = [
                "--config", cfg_path, "--arch", "hnerv", "--data_path",
                frame_dir, "--vid", "tiny", "--ckpt", ckpt,
                "--precision", "6", "5", "4", "5", "6", "--channel_wise",
                "--hadamard", "--batch_size", "4", "--iters_w", "24",
                "--lr", "0.003", "--warmup", "0.2", "--calib_ckpt_freq", "0"]
            calibrate_network.main(common_args + ["--outf", "c_single"])
            calibrate_network.main(common_args + ["--outf", "c_dp",
                                                  "--mesh_devices", "4"])
        finally:
            os.chdir(cwd)

        def qopt_psnr(outdir):
            logs = sorted(glob.glob(os.path.join(outdir, "**/*.log"),
                                    recursive=True))
            text = open(logs[-1]).read()
            vals = re.findall(r"best_pred_seen_psnr: ([\d.]+)", text)
            assert len(vals) >= 4, text[-2000:]
            return float(vals[3])   # 4th eval block: quantized w/ opt

        p1 = qopt_psnr(str(tmp_path / "results/c_single"))
        p2 = qopt_psnr(str(tmp_path / "results/c_dp"))
        assert abs(p1 - p2) < 0.2, (p1, p2)
