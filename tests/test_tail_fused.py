"""Fused channels-first Pallas tail (ops/tail_fused.py): exact equivalence
with the packed XLA path, custom-VJP gradient parity, and the packed-domain
calibration loss identity. Runs on CPU: the Pallas kernels execute in
interpreter mode (fp32-exact), so tolerances are float-roundoff, not bf16."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuroquant_tpu.models import build_model, tail_plan_for
from neuroquant_tpu.ops import tail_fused as tf
from neuroquant_tpu.ops.packed_decode import (
    depth_to_space, packed_conv, upsample_conv_packed)

RNG = np.random.RandomState(0)
B, H, W = 2, 8, 12


def _gelu(v):
    return jax.nn.gelu(v, approximate=False)


@pytest.fixture(scope="module")
def tail_case():
    w0 = jnp.asarray(RNG.randn(5, 5, 5, 16) * 0.3, jnp.float32)
    b0 = jnp.asarray(RNG.randn(16) * 0.1, jnp.float32)
    w1 = jnp.asarray(RNG.randn(3, 3, 4, 12) * 0.3, jnp.float32)
    b1 = jnp.asarray(RNG.randn(12) * 0.1, jnp.float32)
    wh = jnp.asarray(RNG.randn(3, 3, 3, 3) * 0.3, jnp.float32)
    bh = jnp.asarray(RNG.randn(3) * 0.1, jnp.float32)
    x = jnp.asarray(RNG.randn(B, H, W, 5), jnp.float32)
    return x, (w0, b0, w1, b1, wh, bh)


def _oracle(x, w0, b0, w1, b1, wh, bh):
    """The round-2 packed XLA composition (exact-equivalence tested against
    the literal conv+shuffle chain in tests/test_packed_decode.py)."""
    y, perm = upsample_conv_packed(x, w0, b0, 1, (2, 2))
    y = _gelu(y)
    y, perm = upsample_conv_packed(y, w1, b1, 2, (2, 2), in_perm=perm)
    y = _gelu(y)
    y = packed_conv(y, wh, bh, 4, in_perm=perm)
    return depth_to_space(y, 4)


def _fused(x, w0, b0, w1, b1, wh, bh, apply_fn):
    plan, kks, bms, f, ch = tf.plan_and_pack(
        H, W, [(w0, b0, 2), (w1, b1, 2)], (wh, bh), tm=128)
    z = apply_fn(plan, tf.nhwc_to_cf(x, plan), kks, bms)
    return depth_to_space(tf.cf_to_nhwc(z, plan, ch), f)


class TestOpsEquivalence:
    def test_forward_jnp(self, tail_case):
        x, ws = tail_case
        ref = _oracle(x, *ws)
        out = _fused(x, *ws, apply_fn=tf.tail_apply_jnp)
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_forward_pallas_interpret(self, tail_case):
        x, ws = tail_case
        ref = _oracle(x, *ws)
        out = _fused(x, *ws, apply_fn=tf.tail_apply)
        np.testing.assert_allclose(out, ref, atol=2e-5)

    @pytest.mark.parametrize("apply_fn", [tf.tail_apply, tf.tail_apply_jnp],
                             ids=["pallas", "jnp"])
    def test_gradients(self, tail_case, apply_fn):
        x, ws = tail_case
        cot = jnp.asarray(RNG.randn(B, 4 * H, 4 * W, 3), jnp.float32)

        g_o = jax.grad(lambda a: jnp.sum(_oracle(*a) * cot))((x, *ws))
        g_f = jax.grad(lambda a: jnp.sum(
            _fused(*a, apply_fn=apply_fn) * cot))((x, *ws))
        for a, b in zip(jax.tree_util.tree_leaves(g_o),
                        jax.tree_util.tree_leaves(g_f)):
            scale = float(jnp.abs(a).max()) + 1e-12
            assert float(jnp.abs(a - b).max()) / scale < 1e-5

    def test_gradients_qpatches(self, tail_case):
        """Sparse-aware mode on the mid layer: fwd + dx + dw (incl. the
        canonical-dkk scatter) must match the dense oracle's gradients."""
        import os
        x, ws = tail_case
        cot = jnp.asarray(RNG.randn(B, 4 * H, 4 * W, 3), jnp.float32)
        g_o = jax.grad(lambda a: jnp.sum(_oracle(*a) * cot))((x, *ws))
        tf._exec_cfg.cache_clear()
        os.environ["NQ_TAIL_MODE"] = "16x48=qpatches@128"
        try:
            g_f = jax.grad(lambda a: jnp.sum(
                _fused(*a, apply_fn=tf.tail_apply) * cot))((x, *ws))
        finally:
            del os.environ["NQ_TAIL_MODE"]
            tf._exec_cfg.cache_clear()
        for a, b in zip(jax.tree_util.tree_leaves(g_o),
                        jax.tree_util.tree_leaves(g_f)):
            scale = float(jnp.abs(a).max()) + 1e-12
            assert float(jnp.abs(a - b).max()) / scale < 1e-5

    def test_all_exec_modes_match(self, tail_case):
        """Force each kernel mode on the mid layer; outputs must agree."""
        import os
        x, ws = tail_case
        ref = _fused(x, *ws, apply_fn=tf.tail_apply_jnp)
        for mode in ("patches", "ppatches", "dpatches", "taps", "kn2row",
                     "qpatches"):
            tf._exec_cfg.cache_clear()
            os.environ["NQ_TAIL_MODE"] = f"16x48={mode}@128"
            try:
                out = _fused(x, *ws, apply_fn=tf.tail_apply)
            finally:
                del os.environ["NQ_TAIL_MODE"]
                tf._exec_cfg.cache_clear()
            np.testing.assert_allclose(out, ref, atol=2e-5, err_msg=mode)


class TestUnpackFrames:
    """The fused unpack kernel (tail + out_img + depth-to-space in one
    device pass) against the XLA composition it replaces."""

    @pytest.mark.parametrize("out_bias", ["sigmoid", "tanh", "0.5"])
    def test_unpack_matches_xla(self, tail_case, out_bias):
        x, (w0, b0, w1, b1, wh, bh) = tail_case
        blocks, head = [(w0, b0, 2), (w1, b1, 2)], (wh, bh)
        out = tf.run_fused_tail_frames(x, blocks, head, out_bias,
                                       impl="pallas", tm=128)
        plan, kks, bms, f, ch = tf.plan_and_pack(H, W, blocks, head, tm=128)
        z = tf.tail_apply_jnp(plan, tf.nhwc_to_cf(x, plan), kks, bms)
        ref = tf._unpack_jnp(z, plan, f, ch, out_bias, x.dtype)
        assert out.shape == ref.shape == (B, 4 * H, 4 * W, 3)
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_unpack_gradients(self, tail_case):
        """Training differentiates through decode: the unpack custom VJP
        (backward = VJP of the XLA composition) must match pure autodiff."""
        x, ws = tail_case
        cot = jnp.asarray(RNG.randn(B, 4 * H, 4 * W, 3), jnp.float32)

        def loss(a, impl):
            xx, w0, b0, w1, b1, wh, bh = a
            out = tf.run_fused_tail_frames(
                xx, [(w0, b0, 2), (w1, b1, 2)], (wh, bh), "sigmoid",
                impl=impl, tm=128)
            return jnp.sum(out * cot)

        g_ref = jax.grad(lambda a: loss(a, "jnp"))((x, *ws))
        g_out = jax.grad(lambda a: loss(a, "pallas"))((x, *ws))
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_out)):
            scale = float(jnp.abs(a).max()) + 1e-12
            assert float(jnp.abs(a - b).max()) / scale < 1e-5


def _small_cfg(extra=None):
    cfg = dict(
        crop_h=40, crop_w=80, diff_enc=False, stage_block=1,
        enc_strides=[5, 2, 2], enc_channel=[12, 12, 6],
        channel_reduce=1.2, channel_lbound=4, dec_in_channel=16,
        dec_kernels=[1, 3, 3], dec_strides=[5, 2, 2], dec_norm="none",
        dec_acts="gelu", out_bias="tanh", loss="l2", epoch=1, workers=0,
        eval_freq=1, batch_size=2, learning_rate=5e-4, packed_tail=1)
    cfg.update(extra or {})
    return cfg


class TestModelIntegration:
    @pytest.mark.parametrize("impl", ["jnp", "pallas"])
    def test_hnerv_decode_matches_xla_path(self, impl):
        cfg = _small_cfg()
        img = jnp.asarray(RNG.rand(2, 40, 80, 3), jnp.float32)
        m_ref = build_model("hnerv", dict(cfg, fused_tail="off"))
        params = m_ref.init(jax.random.PRNGKey(0), img)
        ref = m_ref.apply(params, img)
        m_fused = build_model("hnerv", dict(cfg, fused_tail=impl))
        out = m_fused.apply(params, img)
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_nerv_decode_matches_xla_path(self):
        cfg = _small_cfg(dict(base=1.25, level=8, n_frames=4,
                              dec_in_channel=12))
        del cfg["enc_strides"], cfg["enc_channel"], cfg["stage_block"]
        idx = jnp.asarray([0.0, 0.25])
        m_ref = build_model("nerv", dict(cfg, fused_tail="off"))
        params = m_ref.init(jax.random.PRNGKey(0), idx)
        ref = m_ref.apply(params, idx)
        out = build_model("nerv", dict(cfg, fused_tail="jnp")).apply(
            params, idx)
        np.testing.assert_allclose(out, ref, atol=2e-5)

    @pytest.mark.parametrize("impl", ["jnp", "pallas"])
    def test_decode_cf_loss_identity(self, impl):
        """The packed-domain loss == lp_loss(reduction='none') on the
        unpacked decode — the identity quantization/calibrate.py relies on."""
        from neuroquant_tpu.metrics import lp_loss

        cfg = _small_cfg(dict(fused_tail=impl))
        img = jnp.asarray(RNG.rand(2, 40, 80, 3), jnp.float32)
        model = build_model("hnerv", cfg)
        params = model.init(jax.random.PRNGKey(0), img)
        emb = model.apply(params, img, method="encode")

        pred = model.apply(params, emb, method="decode")
        ref_loss = lp_loss(pred, img, p=2.0)

        plan, f, ch = tail_plan_for("hnerv", cfg)
        gt = tf.pack_targets(img, plan, f)
        mask = tf.border_mask(plan)
        pred_cf = model.apply(params, emb, method="decode_cf")
        diff = (pred_cf - gt) * mask
        cf_loss = (diff * diff).sum() / (2 * 40 * 80)
        np.testing.assert_allclose(float(cf_loss), float(ref_loss),
                                   rtol=2e-5)

    def test_fused_auto_off_on_cpu(self):
        """'auto' must resolve to the XLA path off-TPU (tests force 'jnp'
        or 'pallas' explicitly)."""
        assert tf.resolve_impl("auto") is None
        assert tf.resolve_impl("off") is None
        assert tf.resolve_impl("pallas") == "pallas"


class TestVmemFeasibilityFallback:
    """A plan whose kernels cannot fit any Pallas execution mode in VMEM
    must downgrade to the jnp twin instead of failing at trace time
    (_exec_cfg raises; run_fused_tail* gate on plan_feasible)."""

    def _big_case(self):
        # 25-tap 256->1024 kernel: resident weights alone are 25MB fp32 /
        # 13MB bf16 -- over the 9MB budget in every mode.
        w0 = jnp.asarray(RNG.randn(5, 5, 256, 1024) * 0.02, jnp.float32)
        b0 = jnp.asarray(RNG.randn(1024) * 0.01, jnp.float32)
        wh = jnp.asarray(RNG.randn(3, 3, 256, 3) * 0.02, jnp.float32)
        bh = jnp.asarray(RNG.randn(3) * 0.01, jnp.float32)
        x = jnp.asarray(RNG.randn(1, H, W, 256) * 0.1, jnp.float32)
        return x, [(w0, b0, 2)], (wh, bh)

    def test_plan_infeasible_detected(self):
        x, blocks, head = self._big_case()
        plan, kks, bms, f, ch = tf.plan_and_pack(H, W, blocks, head, tm=128)
        assert not tf.plan_feasible(plan, itemsize=2)
        with pytest.raises(ValueError, match="VMEM"):
            tf._exec_cfg(plan, plan.layers[0], 2, "fwd1")
        assert tf._effective_impl("pallas", plan, jnp.float32) == "jnp"

    def test_entry_point_falls_back(self):
        x, blocks, head = self._big_case()
        with pytest.warns(UserWarning, match="VMEM"):
            out, f = tf.run_fused_tail(x, blocks, head, impl="pallas", tm=128)
        ref, f2 = tf.run_fused_tail(x, blocks, head, impl="jnp", tm=128)
        assert f == f2
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_small_plan_feasible(self, tail_case):
        x, (w0, b0, w1, b1, wh, bh) = tail_case
        plan, *_ = tf.plan_and_pack(H, W, [(w0, b0, 2), (w1, b1, 2)],
                                    (wh, bh), tm=128)
        assert tf.plan_feasible(plan, itemsize=2)
        assert tf._effective_impl("pallas", plan, jnp.float32) == "pallas"
