"""PNeRV full pipeline: regress -> bit_assign -> calibrate -> compress.

The reference never shipped a working PNeRV path (dead import,
models/__init__.py:3 vs methods/regress.py:21, and no PNeRV config);
BASELINE.json config 5 demands the full pipeline, exercised here on the tiny
fixture."""

import glob
import os
import pickle

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def pnerv_ckpt(tmp_path_factory, frame_dir, tiny_pnerv_cfg):
    from neuroquant_tpu.methods import regress

    d = tmp_path_factory.mktemp("pnerv")
    cfg = dict(tiny_pnerv_cfg, epoch=3, eval_freq=3, batch_size=1,
               learning_rate=0.004)
    cfg_path = str(d / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    cwd = os.getcwd()
    os.chdir(d)
    try:
        regress.main(["--config", cfg_path, "--arch", "pnerv",
                      "--data_path", frame_dir, "--vid", "t", "--outf", "p1"])
    finally:
        os.chdir(cwd)
    ckpt = glob.glob(str(d / "results/**/epoch3.pth"), recursive=True)
    assert ckpt, "pnerv regress produced no checkpoint"
    return ckpt[0], cfg_path, d


N_LAYERS = 14  # tiny cfg: exc + 3 dec + 2 bsm_z + 2 bsm_r + 2 bsm_h + head... computed in test


class TestPNeRVPipeline:
    def test_quant_layer_count(self, tiny_pnerv_cfg):
        from neuroquant_tpu.models import quant_layer_paths
        n = len(quant_layer_paths("pnerv", tiny_pnerv_cfg))
        # kfc_strides has 3 entries -> 1 exc + 3 dec + 3*(n-1=2) bsm + 1 head
        assert n == 1 + 3 + 3 * 2 + 1

    def test_bit_assign(self, pnerv_ckpt, frame_dir, tiny_pnerv_cfg):
        from neuroquant_tpu.methods import bit_assign
        from neuroquant_tpu.models import quant_layer_paths
        ckpt, cfg_path, d = pnerv_ckpt
        n = len(quant_layer_paths("pnerv", tiny_pnerv_cfg))
        lo = ",".join(["2"] * n)
        hi = ",".join(["6"] * n)
        cwd = os.getcwd()
        os.chdir(d)
        try:
            _, best_bits, score = bit_assign.main([
                "--config", cfg_path, "--arch", "pnerv", "--data_path",
                frame_dir, "--vid", "t", "--outf", "p2", "--ckpt", ckpt,
                "--batch_size", "2", "--channel_wise",
                "--candidates", f"{lo};{hi}"])
        finally:
            os.chdir(cwd)
        assert best_bits == [6] * n
        assert np.isfinite(score)

    def test_calibrate_and_compress(self, pnerv_ckpt, frame_dir,
                                    tiny_pnerv_cfg):
        from neuroquant_tpu.methods import calibrate_network, compress
        from neuroquant_tpu.models import quant_layer_paths
        ckpt, cfg_path, d = pnerv_ckpt
        n = len(quant_layer_paths("pnerv", tiny_pnerv_cfg))
        cwd = os.getcwd()
        os.chdir(d)
        try:
            out_path, state, spec = calibrate_network.main([
                "--config", cfg_path, "--arch", "pnerv", "--data_path",
                frame_dir, "--vid", "t", "--outf", "p3", "--ckpt", ckpt,
                "--precision"] + ["4"] * n + [
                "--channel_wise", "--batch_size", "2", "--iters_w", "40",
                "--warmup", "0.2", "--lr", "0.003"])
        finally:
            os.chdir(cwd)
        out_path = str(d / out_path)
        assert os.path.exists(out_path)
        with open(out_path, "rb") as f:
            artifact = pickle.load(f)
        assert len(artifact["int_codes"]) == n
        assert artifact["embeddings"] is not None  # content-conditioned arch

        report = compress.main(["--artifact", out_path,
                                "--data_path", frame_dir])
        assert 0 < report["bpp"] < 24
