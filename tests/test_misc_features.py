"""Coverage for secondary features: QAT training, diff-mode dataset,
dump_vis/eval_fps flags, config validation, lr schedules."""

import glob
import os

import numpy as np
import pytest
import yaml


class TestQAT:
    def test_qat_training_runs(self, tmp_path, frame_dir, tiny_hnerv_cfg):
        from neuroquant_tpu.methods import regress
        cfg = dict(tiny_hnerv_cfg, epoch=2, eval_freq=2)
        cfg_path = str(tmp_path / "cfg.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            for mode in ("ffnerv", "hinerv"):
                regress.main(["--config", cfg_path, "--arch", "hnerv",
                              "--data_path", frame_dir, "--vid", "q",
                              "--outf", f"qat_{mode}", "--qat_mode", mode,
                              "--qat_bits", "6"])
                logs = glob.glob(str(tmp_path / f"results/qat_{mode}/**/*.log"),
                                 recursive=True)
                text = open(sorted(logs)[-1]).read()
                assert f"QAT enabled: mode={mode}" in text
        finally:
            os.chdir(cwd)


class TestDiffMode:
    def test_diff_enc_samples(self, frame_dir, tiny_hnerv_cfg):
        from neuroquant_tpu.data import VideoDataSet
        cfg = dict(tiny_hnerv_cfg, diff_enc=True)
        ds = VideoDataSet(cfg, frame_dir)
        s = ds[0]
        assert set(s) == {"img_id", "img_gt", "img_p", "img_f"}
        # boundary clamping (videosets/datasets.py:35-36)
        np.testing.assert_array_equal(np.asarray(s["img_p"]),
                                      np.asarray(s["img_gt"]))
        s_last = ds[len(ds) - 1]
        np.testing.assert_array_equal(np.asarray(s_last["img_f"]),
                                      np.asarray(s_last["img_gt"]))


class TestEvalFlags:
    def test_dump_vis_and_eval_fps(self, tmp_path, frame_dir, tiny_hnerv_cfg):
        from neuroquant_tpu.methods import regress
        cfg = dict(tiny_hnerv_cfg, epoch=1, eval_freq=1)
        cfg_path = str(tmp_path / "cfg.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            regress.main(["--config", cfg_path, "--arch", "hnerv",
                          "--data_path", frame_dir, "--vid", "v",
                          "--outf", "vis"])
            ckpt = glob.glob(str(tmp_path / "results/vis/**/epoch1.pth"),
                             recursive=True)[0]
            regress.main(["--config", cfg_path, "--arch", "hnerv",
                          "--data_path", frame_dir, "--vid", "v",
                          "--outf", "vis_eval", "--weight", ckpt,
                          "--eval_only", "--dump_vis"])
            pngs = glob.glob(str(tmp_path / "results/vis_eval/**/visualize_fp32/pred_*.png"),
                             recursive=True)
            assert len(pngs) == 8   # one per fixture frame
        finally:
            os.chdir(cwd)


class TestConfigValidation:
    def test_missing_key_raises(self):
        from neuroquant_tpu.config import validate_config
        with pytest.raises(KeyError, match="dec_in_channel"):
            validate_config({"crop_h": 64}, "nerv")
        with pytest.raises(ValueError, match="unknown arch"):
            validate_config({}, "resnet")


class TestBenchContract:
    def test_headline_json_carries_bench_keys(self):
        """bench.py publishes PSNR@bpp from results/headline.json; a key
        rename there would silently drop the metric from BENCH_r{N}.json."""
        import json
        import os

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "results", "headline.json")) as f:
            head = json.load(f)
        h = head["hnerv"]
        for key in ("quantized_psnr_db", "bpp", "ref_quantized_psnr_db"):
            # int allowed: a regenerated headline may serialize e.g. 37.0 as 37
            assert isinstance(h[key], (int, float)), key
        # the headline RD point must stay within the BASELINE quality bar
        assert abs(h["quantized_psnr_db"] - h["ref_quantized_psnr_db"]) < 0.06


class TestSchedules:
    def test_cosine_matches_reference_formula(self):
        import math
        from neuroquant_tpu.schedules import lr_multiplier
        # reference formula (utils.py:86-92) evaluated directly
        up_ratio, up_pow, min_lr, eta_min = 0.1, 1.0, 0.1, 0.05
        for t in (0.0, 0.05, 0.1, 0.3, 0.7, 0.95, 0.999):
            if t < up_ratio:
                want = min_lr + (1 - min_lr) * (t / up_ratio) ** up_pow
            else:
                want = max(0.5 * (math.cos(math.pi * (t - up_ratio) / (1 - up_ratio)) + 1),
                           eta_min)
            got = float(lr_multiplier("cosine_0.1_1_0.1", t))
            assert got == pytest.approx(want, rel=1e-6), t

    def test_hybrid(self):
        from neuroquant_tpu.schedules import lr_multiplier
        got = float(lr_multiplier("hybrid_0.2_1_1_0.1_0.05", 0.1))
        assert 0.1 < got < 1.0
        got_end = float(lr_multiplier("hybrid_0.2_1_1_0.1_0.05", 0.99))
        assert got_end < 0.1

    def test_data_split(self):
        from neuroquant_tpu.schedules import data_split
        train, val = data_split(list(range(10)), [1, 1, 2], False)
        assert train == [0, 2, 4, 6, 8]
        assert val == [1, 3, 5, 7, 9]
        train, val = data_split(list(range(6)), [1, 1, 1], False)
        assert train == [0, 1, 2, 3, 4, 5] and val == []


class TestDecodeFPS:
    def test_measure_decode_fps(self, tiny_hnerv_cfg, frame_dir):
        import jax
        from neuroquant_tpu.data import VideoDataSet
        from neuroquant_tpu.methods.common import measure_decode_fps
        from neuroquant_tpu.models import build_model

        ds = VideoDataSet(tiny_hnerv_cfg, frame_dir)
        model = build_model("hnerv", tiny_hnerv_cfg)
        params = model.init(jax.random.PRNGKey(0), ds.frames[:1])
        emb = model.apply(params, ds.frames, method="encode")
        fps = measure_decode_fps(model, params, emb, batch_size=1, n_iters=8)
        assert fps > 0


class TestFusedEvalParity:
    def test_device_eval_matches_host_loop(self, tmp_path, frame_dir,
                                           tiny_hnerv_cfg):
        """evaluate()'s single-program device path must produce the same
        metrics and embeddings as the per-batch host loop (the --dump_vis
        path), which is the reference-shaped implementation."""
        import types

        import jax
        import jax.numpy as jnp

        from neuroquant_tpu.data import VideoDataSet
        from neuroquant_tpu.methods import common
        from neuroquant_tpu.models import build_model

        cfg = dict(tiny_hnerv_cfg, batch_size=2)
        ds = VideoDataSet(cfg, frame_dir)
        model = build_model("hnerv", cfg)
        params = model.init(jax.random.PRNGKey(0), ds.frames[:1])

        def run(dump_vis):
            args = types.SimpleNamespace(
                arch="hnerv", val_ind_list=[2, 5], print_freq=2, fps=0.0,
                outf=str(tmp_path))
            return common.evaluate(model, params, ds, args, cfg,
                                   dump_vis=dump_vis)

        res_dev, hw_dev, emb_dev = run(False)
        res_host, hw_host, emb_host = run(True)
        assert hw_dev == hw_host
        for a, b in zip(res_dev, res_host):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(emb_dev), np.asarray(emb_host),
                                   rtol=1e-5, atol=1e-6)


class TestCalibResume:
    def test_checkpoint_resume_continues(self, tmp_path, tiny_hnerv_cfg,
                                         frame_dir):
        """Crash-recovery resume is an EXACT continuation: checkpoints carry
        the QuantState AND the Adam moments, the epoch rng is fold_in(rng, e)
        on the absolute epoch index, and count/temp-decay resume from the
        saved count — so resuming from the epoch-3 snapshot reproduces the
        uninterrupted run's final state."""
        import jax
        import numpy as np
        from neuroquant_tpu.data import VideoDataSet
        from neuroquant_tpu.models import build_model
        from neuroquant_tpu.quantization import (
            init_quant_state, make_spec, model_reconstruction,
        )

        ds = VideoDataSet(tiny_hnerv_cfg, frame_dir)
        model = build_model("hnerv", tiny_hnerv_cfg)
        params = model.init(jax.random.PRNGKey(0), ds.frames[:1])
        emb = model.apply(params, ds.frames, method="encode")
        spec = make_spec("hnerv", tiny_hnerv_cfg, channel_wise=True,
                         scale_method="max").with_bits([4] * 5)
        state0 = init_quant_state(params, spec)

        # 6 phase-2 epochs of 2 steps; checkpoint every 2 epochs
        kw = dict(arch="hnerv", batch_size=4, iters=12, warmup=0.2,
                  lr=0.003, seed=903, log_fn=lambda m: None)
        ckpt = str(tmp_path / "calib_ckpt.pkl")
        s_full, _ = model_reconstruction(
            model, params, spec, state0, emb, ds.frames, list(range(8)),
            checkpoint_path=ckpt, ckpt_every_epochs=2, **kw)
        assert os.path.exists(ckpt)

        import pickle
        saved = pickle.load(open(ckpt, "rb"))
        assert saved["epoch"] == 5          # last multiple-of-2 epoch index
        assert saved["count"] == 12

        # roll the checkpoint back to epoch 3 (simulating a crash at epoch 4)
        # by re-saving an earlier snapshot: rerun with ckpt_every=4 so the
        # last save is epoch 3, then resume and compare to the full run
        ckpt2 = str(tmp_path / "calib_ckpt2.pkl")
        model_reconstruction(
            model, params, spec, state0, emb, ds.frames, list(range(8)),
            checkpoint_path=ckpt2, ckpt_every_epochs=4, **kw)
        saved2 = pickle.load(open(ckpt2, "rb"))
        assert saved2["epoch"] == 3 and saved2["count"] == 8

        logs = []
        s_res, _ = model_reconstruction(
            model, params, spec, state0, emb, ds.frames, list(range(8)),
            checkpoint_path=ckpt2, ckpt_every_epochs=100,
            **{**kw, "log_fn": logs.append})
        assert any("resuming" in str(m) for m in logs)
        # resumed state == uninterrupted final state (same shuffles, same
        # count, restored Adam moments)
        for ln in spec.layer_names:
            for k in s_full[ln]:
                a, b = np.asarray(s_full[ln][k]), np.asarray(s_res[ln][k])
                assert np.all(np.isfinite(b))
                np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


class TestTempDecayAndNearestRounding:
    def test_temp_decay_warmup1_is_finite(self):
        """rel_start_decay=1.0 used to divide 0/0 at t == t_max -> NaN temp
        at the exact step the round loss activates (round-4 VERDICT bug)."""
        import numpy as np
        from neuroquant_tpu.quantization.calibrate import LinearTempDecay

        t = LinearTempDecay(132, rel_start_decay=1.0, start_b=20, end_b=2)
        for step in (0, 131, 132):
            v = float(t(step))
            assert np.isfinite(v), step
            assert v == 20.0
        # the normal schedule is unchanged
        t2 = LinearTempDecay(100, rel_start_decay=0.2, start_b=20, end_b=2)
        assert float(t2(0)) == 20.0
        assert abs(float(t2(100)) - 2.0) < 1e-6
        assert 2.0 < float(t2(60)) < 20.0

    def test_warmup1_lr0_leaves_alphas_bit_identical(self, tiny_hnerv_cfg,
                                                     frame_dir):
        """The regression the NaN poisoned: warmup=1.0 + lr=0.0 must leave
        every alpha finite and bit-identical to its AdaRound init (Adam with
        finite gradients and lr=0 applies exact -0.0 updates)."""
        import jax
        import numpy as np
        from neuroquant_tpu.data import VideoDataSet
        from neuroquant_tpu.models import build_model
        from neuroquant_tpu.quantization import (
            init_quant_state, make_spec, model_reconstruction,
        )
        from neuroquant_tpu.quantization.qmodel import adaround_upgrade

        ds = VideoDataSet(tiny_hnerv_cfg, frame_dir)
        model = build_model("hnerv", tiny_hnerv_cfg)
        params = model.init(jax.random.PRNGKey(0), ds.frames[:1])
        emb = model.apply(params, ds.frames, method="encode")
        spec = make_spec("hnerv", tiny_hnerv_cfg, channel_wise=True,
                        scale_method="max").with_bits([4] * 5)
        state0 = init_quant_state(params, spec)

        # iters=12, batch 4, 8 frames -> 2 steps/epoch, phase-1 epochs =
        # int(0.05*12/2) = 0, so alphas init straight from state0
        s, mode = model_reconstruction(
            model, params, spec, state0, emb, ds.frames, list(range(8)),
            arch="hnerv", batch_size=4, iters=12, warmup=1.0, lr=0.0,
            seed=903, log_fn=lambda m: None)
        assert mode == "adaround"
        expect = adaround_upgrade(params, spec, state0)
        for ln in spec.layer_names:
            for k in ("w_alpha", "b_alpha"):
                got = np.asarray(s[ln][k])
                assert np.all(np.isfinite(got)), (ln, k)
                np.testing.assert_array_equal(got, np.asarray(expect[ln][k]))

    def test_nearest_rounding_mode(self, tiny_hnerv_cfg, frame_dir):
        """rounding='nearest' runs phase 1 only and returns a UAQ state
        (no alphas) whose int codes round-trip through quantize_params."""
        import jax
        import numpy as np
        from neuroquant_tpu.data import VideoDataSet
        from neuroquant_tpu.models import build_model
        from neuroquant_tpu.quantization import (
            collect_int_codes, init_quant_state, make_spec,
            model_reconstruction, quantize_params,
        )

        ds = VideoDataSet(tiny_hnerv_cfg, frame_dir)
        model = build_model("hnerv", tiny_hnerv_cfg)
        params = model.init(jax.random.PRNGKey(0), ds.frames[:1])
        emb = model.apply(params, ds.frames, method="encode")
        spec = make_spec("hnerv", tiny_hnerv_cfg, channel_wise=True,
                        scale_method="max").with_bits([4] * 5)
        state0 = init_quant_state(params, spec)
        # the phase-1 jit donates the state buffers — snapshot before
        state0_np = jax.tree_util.tree_map(np.asarray, state0)

        logs = []
        s, mode = model_reconstruction(
            model, params, spec, state0, emb, ds.frames, list(range(8)),
            arch="hnerv", batch_size=4, iters=40, warmup=0.2, lr=0.003,
            seed=903, log_fn=logs.append, rounding="nearest")
        assert mode == "uaq"
        assert any("nearest" in str(m) for m in logs)
        for ln in spec.layer_names:
            assert "w_alpha" not in s[ln]
            for k, v in s[ln].items():
                assert np.all(np.isfinite(np.asarray(v))), (ln, k)
        # phase 1 DID run: deltas moved off their init values
        moved = any(
            not np.array_equal(np.asarray(s[ln]["w_delta"]),
                               state0_np[ln]["w_delta"])
            for ln in spec.layer_names)
        assert moved
        # the saved state decodes (mode='uaq', hard) and codes are in range
        qp = quantize_params(params, spec, s, mode="uaq", soft=False)
        out = model.apply(qp, emb[:2], method="decode")
        assert np.all(np.isfinite(np.asarray(out)))
        codes = collect_int_codes(params, spec, s, mode="uaq")
        for ln in spec.layer_names:
            w = np.asarray(codes[ln]["w"])
            assert w.min() >= 0 and w.max() <= 15


class TestMixedRounding:
    def test_adaround_subset(self, tiny_hnerv_cfg, frame_dir):
        """adaround_only: only the named layers get alphas/phase-2; the
        rest save nearest UAQ codes. quantize_params / collect_int_codes /
        round_loss resolve the per-layer mode from alpha presence."""
        import jax
        import numpy as np
        from neuroquant_tpu.data import VideoDataSet
        from neuroquant_tpu.models import build_model
        from neuroquant_tpu.quantization import (
            collect_int_codes, init_quant_state, make_spec,
            model_reconstruction, quantize_params,
        )

        ds = VideoDataSet(tiny_hnerv_cfg, frame_dir)
        model = build_model("hnerv", tiny_hnerv_cfg)
        params = model.init(jax.random.PRNGKey(0), ds.frames[:1])
        emb = model.apply(params, ds.frames, method="encode")
        spec = make_spec("hnerv", tiny_hnerv_cfg, channel_wise=True,
                         scale_method="max").with_bits([4] * 5)
        state0 = init_quant_state(params, spec)

        sub = (spec.layer_names[1], spec.layer_names[3])
        s, mode = model_reconstruction(
            model, params, spec, state0, emb, ds.frames, list(range(8)),
            arch="hnerv", batch_size=4, iters=40, warmup=0.2, lr=0.01,
            seed=903, log_fn=lambda m: None, adaround_only=sub)
        assert mode == "adaround"
        for i, ln in enumerate(spec.layer_names):
            has = "w_alpha" in s[ln]
            assert has == (ln in sub), (i, ln)
            for k, v in s[ln].items():
                assert np.all(np.isfinite(np.asarray(v))), (ln, k)
        # decode + codes work on the mixed state
        qp = quantize_params(params, spec, s, mode="adaround", soft=False)
        out = model.apply(qp, emb[:2], method="decode")
        assert np.all(np.isfinite(np.asarray(out)))
        codes = collect_int_codes(params, spec, s, mode="adaround")
        for ln in spec.layer_names:
            w = np.asarray(codes[ln]["w"])
            assert w.min() >= 0 and w.max() <= 15, ln
