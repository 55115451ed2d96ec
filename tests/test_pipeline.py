"""End-to-end pipeline test: regress -> bit_assign -> calibrate_network on the
tiny fixture clip, through the real CLI entry points."""

import glob
import os
import pickle

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipeline")
    os.makedirs(d / "cfg", exist_ok=True)
    return d


def _write_cfg(workdir, name, cfg):
    path = str(workdir / "cfg" / f"{name}.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


@pytest.fixture(scope="module")
def trained_ckpt(workdir, frame_dir, tiny_hnerv_cfg, request):
    """Run stage 1 once for the module; later stages consume the checkpoint."""
    from neuroquant_tpu.methods import regress

    cfg = dict(tiny_hnerv_cfg, epoch=6, eval_freq=3, batch_size=1,
               learning_rate=0.004)
    cfg_path = _write_cfg(workdir, "hnerv", cfg)
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        regress.main([
            "--config", cfg_path, "--arch", "hnerv", "--data_path", frame_dir,
            "--vid", "tiny", "--outf", "t1", "--lr_type", "cosine_0.1_1_0.1"])
    finally:
        os.chdir(cwd)
    ckpts = glob.glob(str(workdir / "results/t1/**/epoch6.pth"), recursive=True)
    assert len(ckpts) == 1
    return ckpts[0], cfg_path


class TestRegress:
    def test_checkpoints_and_learning(self, workdir, trained_ckpt):
        ckpt, _ = trained_ckpt
        outdir = os.path.dirname(ckpt)
        assert os.path.exists(os.path.join(outdir, "model_latest.pth"))
        # hyperparameter-encoded dir name (reference regress.py:206)
        assert "Encoder_" in outdir and "_Total_" in outdir
        logs = glob.glob(os.path.join(outdir, "*.log"))
        assert logs
        text = open(logs[0]).read()
        assert "Eval at Step" in text
        # training must actually improve PSNR over 6 epochs on 8 frames
        import re
        psnrs = [float(m) for m in re.findall(r"pred_PSNR: ([\d.]+)", text)]
        assert psnrs[-1] > psnrs[0] + 1.0, psnrs

    def test_eval_only_reproduces(self, workdir, frame_dir, trained_ckpt):
        from neuroquant_tpu.methods import regress
        ckpt, cfg_path = trained_ckpt
        cwd = os.getcwd()
        os.chdir(workdir)
        try:
            regress.main([
                "--config", cfg_path, "--arch", "hnerv", "--data_path", frame_dir,
                "--vid", "tiny", "--outf", "t1_eval", "--weight", ckpt,
                "--eval_only"])
        finally:
            os.chdir(cwd)


class TestBitAssign:
    def test_omega_selects_candidate(self, workdir, frame_dir, trained_ckpt):
        from neuroquant_tpu.methods import bit_assign
        ckpt, cfg_path = trained_ckpt
        cwd = os.getcwd()
        os.chdir(workdir)
        try:
            best_candidate, best_bits, best_score = bit_assign.main([
                "--config", cfg_path, "--arch", "hnerv", "--data_path", frame_dir,
                "--vid", "tiny", "--outf", "t2", "--ckpt", ckpt,
                "--batch_size", "2", "--channel_wise", "--init", "max",
                "--mode", "omega", "--candidates", "2,2,2,2,2;6,6,6,6,6"])
        finally:
            os.chdir(cwd)
        # 6-bit everywhere must beat 2-bit everywhere on the omega criterion
        assert best_bits == [6, 6, 6, 6, 6]
        assert np.isfinite(best_score) and best_score > 0

    def test_fisher_diag_runs(self, workdir, frame_dir, trained_ckpt):
        from neuroquant_tpu.methods import bit_assign
        ckpt, cfg_path = trained_ckpt
        cwd = os.getcwd()
        os.chdir(workdir)
        try:
            _, best_bits, _ = bit_assign.main([
                "--config", cfg_path, "--arch", "hnerv", "--data_path", frame_dir,
                "--vid", "tiny", "--outf", "t2f", "--ckpt", ckpt,
                "--batch_size", "2", "--channel_wise", "--mode", "fisher_diag",
                "--candidates", "2,2,2,2,2;6,6,6,6,6"])
        finally:
            os.chdir(cwd)
        assert best_bits == [6, 6, 6, 6, 6]


@pytest.fixture(scope="module")
def calibrated(workdir, frame_dir, trained_ckpt):
    from neuroquant_tpu.methods import calibrate_network
    ckpt, cfg_path = trained_ckpt
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        out_path, state, spec = calibrate_network.main([
            "--config", cfg_path, "--arch", "hnerv", "--data_path", frame_dir,
            "--vid", "tiny", "--outf", "t3", "--ckpt", ckpt,
            "--precision", "4", "4", "4", "4", "4", "--channel_wise",
            "--hadamard", "--batch_size", "2", "--iters_w", "80",
            "--b_start", "20", "--b_end", "2", "--warmup", "0.2",
            "--lr", "0.003"])
    finally:
        os.chdir(cwd)
    return str(workdir / out_path), state, spec


class TestCalibrate:
    def test_network_calibration_recovers_psnr(self, workdir, frame_dir,
                                               trained_ckpt, calibrated):
        out_path, state, spec = calibrated
        assert os.path.exists(out_path)
        with open(out_path, "rb") as f:
            artifact = pickle.load(f)
        assert artifact["arch"] == "hnerv"
        assert len(artifact["int_codes"]) == 5
        for name, c in artifact["int_codes"].items():
            assert c["w"].dtype == np.int32
            assert c["w"].min() >= 0 and c["w"].max() <= 15  # 4-bit
        # calibration log records the four eval blocks
        logs = glob.glob(os.path.join(os.path.dirname(out_path), "*.log"))
        text = open(sorted(logs)[-1]).read()
        for block in ("Full-precision model", "Close quantization model",
                      "Weight quantization model w/o opt",
                      "Weight quantization model w/ opt"):
            assert block in text, block

        # PSNR after optimization must beat the unoptimized quantized model
        import re
        psnrs = [float(m) for m in re.findall(r"best_pred_seen_psnr: ([\d.]+)", text)]
        assert len(psnrs) >= 4
        fp32, qoff, qunopt, qopt = psnrs[:4]
        assert abs(qoff - fp32) < 0.2   # quant off == fp32 modulo eval noise
        assert qopt >= qunopt - 0.05, psnrs


class TestCompress:
    def test_bitstream_and_bpp(self, workdir, frame_dir, calibrated):
        from neuroquant_tpu.methods import compress
        out_path, _, _ = calibrated
        report = compress.main(["--artifact", out_path,
                                "--data_path", frame_dir])
        assert os.path.exists(report["bitstream"])
        assert 0 < report["bpp"] < 24.0
        assert report["weight_stream_bytes"] > 0
        # 4-bit codes + skewed dist: stream must be well under raw 4 bits/w
        n_params = sum(
            np.prod(np.asarray(c["w"]).shape) + len(np.asarray(c["b"]))
            for c in pickle.load(open(out_path, "rb"))["int_codes"].values())
        assert report["weight_stream_bytes"] * 8 < 4.3 * n_params

    def test_eval_from_bitstream(self, workdir, frame_dir, calibrated):
        from neuroquant_tpu.methods import compress, eval_quantized
        out_path, _, _ = calibrated
        stream_path = out_path + ".nqtb"
        if not os.path.exists(stream_path):
            compress.main(["--artifact", out_path, "--data_path", frame_dir])
        results = eval_quantized.main([
            "--artifact", out_path, "--data_path", frame_dir,
            "--from_bitstream", stream_path, "-p", "50"])
        assert float(np.max(results[0])) > 5.0  # decodes to real frames




class TestUnitScopeCLI:
    """--scope block|layer: the BRECQ/AdaRound per-unit baselines are
    runnable end-to-end from the stage-3 CLI (VERDICT r3 item 8)."""

    @pytest.mark.parametrize("scope,extra", [
        ("block", []),
        ("layer", ["--opt_mode", "fisher_diag", "--input_prob", "0.5"]),
    ])
    def test_unit_scope_runs(self, workdir, frame_dir, trained_ckpt,
                             scope, extra):
        from neuroquant_tpu.methods import calibrate_network
        ckpt, cfg_path = trained_ckpt
        cwd = os.getcwd()
        os.chdir(workdir)
        try:
            out_path, state, spec = calibrate_network.main([
                "--config", cfg_path, "--arch", "hnerv",
                "--data_path", frame_dir, "--vid", "tiny",
                "--outf", f"t3{scope}", "--ckpt", ckpt,
                "--precision", "4", "4", "4", "4", "4", "--channel_wise",
                "--batch_size", "2", "--iters_w", "40",
                "--b_start", "20", "--b_end", "2", "--warmup", "0.2",
                "--lr", "0.003", "--scope", scope] + extra)
        finally:
            os.chdir(cwd)
        out_path = str(workdir / out_path)
        assert f"{scope}-wise_calib" in out_path
        with open(out_path, "rb") as f:
            artifact = pickle.load(f)
        assert len(artifact["int_codes"]) == 5
        # every unit got an AdaRound state (alpha present and finite)
        for name in spec.layer_names:
            assert "w_alpha" in state[name], name
            assert np.isfinite(np.asarray(state[name]["w_alpha"])).all()
        logs = glob.glob(os.path.join(os.path.dirname(out_path), "*.log"))
        text = open(sorted(logs)[-1]).read()
        assert "Reconstruction for" in text
        assert "Weight quantization model w/ opt" in text

    def test_network_scope_rejects_qdrop(self, workdir, frame_dir,
                                         trained_ckpt):
        from neuroquant_tpu.methods import calibrate_network
        ckpt, cfg_path = trained_ckpt
        with pytest.raises(SystemExit):
            calibrate_network.parse_args([
                "--config", cfg_path, "--arch", "hnerv",
                "--ckpt", ckpt, "--input_prob", "0.5"])


class TestLagrangianSearch:
    def test_candidate_generator(self):
        """Pure-function properties: budget respected, monotone curves push
        cheap layers to low bits, best-surrogate proposal included."""
        from neuroquant_tpu.methods.bit_assign import lagrangian_candidates
        # layer 0: insensitive (flat curve), layer 1: very sensitive
        curves = {b: [1e-6 * (8 - b), 1e-1 * (8 - b) ** 2] for b in range(2, 9)}
        p_l = [1000, 1000]
        cands = lagrangian_candidates(curves, p_l, list(range(2, 9)), 5.0)
        assert cands
        for c in cands:
            avg = sum(p * b for p, b in zip(p_l, c)) / sum(p_l)
            assert avg <= 5.0 + 1e-9
        # the sensitive layer should get >= bits of the insensitive one in
        # the best proposal
        best = cands[0]
        assert best[1] >= best[0]

    def test_search_cli(self, workdir, frame_dir, trained_ckpt):
        from neuroquant_tpu.methods import bit_assign
        ckpt, cfg_path = trained_ckpt
        cwd = os.getcwd()
        os.chdir(workdir)
        try:
            _, best_bits, score = bit_assign.main([
                "--config", cfg_path, "--arch", "hnerv",
                "--data_path", frame_dir, "--vid", "tiny", "--outf", "t2s",
                "--ckpt", ckpt, "--batch_size", "2", "--channel_wise",
                "--search", "lagrangian", "--target_avg_bits", "4.5",
                "--bit_range", "3", "6", "--hvp_impl", "xla"])
        finally:
            os.chdir(cwd)
        assert len(best_bits) == 5
        assert all(3 <= b <= 6 for b in best_bits)
        assert np.isfinite(score)
