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

    def test_gradients_pupatches(self, tail_case):
        """Pipelined union-sparse mode: fwd + dx + dw must match the dense
        oracle (same union layout as upatches, split-K two-slot pipeline)."""
        import os
        x, ws = tail_case
        cot = jnp.asarray(RNG.randn(B, 4 * H, 4 * W, 3), jnp.float32)
        g_o = jax.grad(lambda a: jnp.sum(_oracle(*a) * cot))((x, *ws))
        tf._exec_cfg.cache_clear()
        os.environ["NQ_TAIL_MODE"] = "16x48=pupatches@128,48x16=pupatches@128"
        try:
            out = _fused(x, *ws, apply_fn=tf.tail_apply)
            g_f = jax.grad(lambda a: jnp.sum(
                _fused(*a, apply_fn=tf.tail_apply) * cot))((x, *ws))
        finally:
            del os.environ["NQ_TAIL_MODE"]
            tf._exec_cfg.cache_clear()
        np.testing.assert_allclose(out, _oracle(x, *ws), atol=2e-5)
        for a, b in zip(jax.tree_util.tree_leaves(g_o),
                        jax.tree_util.tree_leaves(g_f)):
            scale = float(jnp.abs(a).max()) + 1e-12
            assert float(jnp.abs(a - b).max()) / scale < 1e-5

    def test_gradients_upatches(self, tail_case):
        """Union-sparse mode on the mid layer: fwd + dx + dw (incl. the
        union canonical-dkk scatter) must match the dense oracle's gradients
        w.r.t. the ORIGINAL weights (the pack-gather VJP only reads packed
        positions, so the union rows parked at structurally-zero canonical
        positions are immaterial)."""
        import os
        x, ws = tail_case
        cot = jnp.asarray(RNG.randn(B, 4 * H, 4 * W, 3), jnp.float32)
        g_o = jax.grad(lambda a: jnp.sum(_oracle(*a) * cot))((x, *ws))
        tf._exec_cfg.cache_clear()
        os.environ["NQ_TAIL_MODE"] = "16x48=upatches@128"
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
                     "qpatches", "upatches"):
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


class TestUnionBlocks:
    """The 'upatches' union K structure: each axis of a packed k x k conv
    takes k + f - 1 distinct (subposition + tap offset) values, so the
    union over all f^2 output groups is (k + f - 1)^2 blocks — vs the
    dense kernel's (kp*f)^2-ish and qpatches' f^2 * k^2 with multiplicity."""

    @pytest.mark.parametrize("k,f", [(3, 4), (3, 2), (5, 2), (5, 3)])
    def test_union_count(self, k, f):
        from neuroquant_tpu.ops.packed_decode import packed_sparse_taps
        qt_fwd, qt_t = packed_sparse_taps(k, f, None)
        sparse = (k, 7, 5, qt_fwd)               # cin_o/cout_o arbitrary
        ub = tf._union_blocks(sparse)
        assert len(ub) == (k + f - 1) ** 2
        assert len(set(ub)) == len(ub)           # distinct, sorted
        assert list(ub) == sorted(ub)
        # every group's taps are contained in the union
        for taps in qt_fwd:
            assert set(taps) <= set(ub)


class TestVmemFeasibilityFallback:
    """A plan with a layer no Pallas execution can fit in VMEM — one call
    OR a cout-row split — must downgrade to the jnp twin instead of failing
    at trace time (_split_parts raises; run_fused_tail* gate on
    plan_feasible). cin cannot be split (the conv contracts over it), so a
    layer whose double-buffered input tile alone exceeds the budget is the
    genuinely-infeasible case."""

    def _huge_cin_case(self):
        # input tile 2 * 16384 * span * 2B > 11.25MB at every lane tile:
        # infeasible in every mode, split or not
        w0 = jnp.asarray(RNG.randn(5, 5, 16384, 8) * 0.02, jnp.float32)
        b0 = jnp.asarray(RNG.randn(8) * 0.01, jnp.float32)
        wh = jnp.asarray(RNG.randn(3, 3, 2, 3) * 0.02, jnp.float32)
        bh = jnp.asarray(RNG.randn(3) * 0.01, jnp.float32)
        return [(w0, b0, 2)], (wh, bh)

    def test_plan_infeasible_detected(self):
        blocks, head = self._huge_cin_case()
        plan, kks, bms, f, ch = tf.plan_and_pack(H, W, blocks, head, tm=128)
        assert not tf.plan_feasible(plan, itemsize=2)
        with pytest.raises(ValueError, match="VMEM"):
            tf._split_parts(plan, plan.layers[0], 2, "fwd1")
        assert tf._effective_impl("pallas", plan, jnp.float32) == "jnp"

    def test_entry_point_falls_back(self):
        blocks, head = self._huge_cin_case()
        x = jnp.asarray(RNG.randn(1, H, W, 16384) * 0.1, jnp.float32)
        with pytest.warns(UserWarning, match="VMEM"):
            out, f = tf.run_fused_tail(x, blocks, head, impl="pallas", tm=128)
        ref, f2 = tf.run_fused_tail(x, blocks, head, impl="jnp", tm=128)
        assert f == f2
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestCoutSplit:
    """A layer too large for one pallas_call but feasible as a cout-row
    split (the UVG f=6 head-dW situation, RESULTS.md) must run the Pallas
    path — multi-call, exact — not demote to jnp."""

    def _case(self):
        # 25-tap 256->1024: resident weights 25MB fp32 / 13MB bf16 exceed
        # the 11.25MB budget in one call; a 2-part cout split fits.
        w0 = jnp.asarray(RNG.randn(5, 5, 256, 1024) * 0.02, jnp.float32)
        b0 = jnp.asarray(RNG.randn(1024) * 0.01, jnp.float32)
        wh = jnp.asarray(RNG.randn(3, 3, 256, 3) * 0.02, jnp.float32)
        bh = jnp.asarray(RNG.randn(3) * 0.01, jnp.float32)
        x = jnp.asarray(RNG.randn(1, H, W, 256) * 0.1, jnp.float32)
        return x, [(w0, b0, 2)], (wh, bh)

    def test_split_feasible_and_used(self):
        x, blocks, head = self._case()
        plan, kks, bms, f, ch = tf.plan_and_pack(H, W, blocks, head, tm=128)
        assert tf.plan_feasible(plan, itemsize=4)   # fp32 on CPU interpret
        # one-call-only feasibility (diagnostics knob) rejects this plan
        assert not tf.plan_feasible(plan, itemsize=4, allow_split=False)
        parts = tf._split_parts(plan, plan.layers[0], 4, "fwd1")
        assert parts is not None and len(parts) >= 2
        assert sum(s for _, s, _ in parts) == plan.layers[0].cout
        assert tf._effective_impl("pallas", plan, jnp.float32) == "pallas"

    def test_forward_and_gradients_match_jnp(self):
        x, blocks, head = self._case()
        plan, kks, bms, f, ch = tf.plan_and_pack(H, W, blocks, head, tm=128)

        def run(apply_fn, xx, kk_list, bm_list):
            z = apply_fn(plan, tf.nhwc_to_cf(xx, plan), tuple(kk_list),
                         tuple(bm_list))
            return tf.cf_to_nhwc(z, plan, ch)

        out = run(tf.tail_apply, x, kks, bms)
        ref = run(tf.tail_apply_jnp, x, kks, bms)
        np.testing.assert_allclose(out, ref, atol=2e-5)

        cot = jnp.asarray(RNG.randn(*ref.shape), jnp.float32)
        gp = jax.grad(lambda a: jnp.sum(run(tf.tail_apply, *a) * cot))(
            (x, kks, bms))
        gj = jax.grad(lambda a: jnp.sum(run(tf.tail_apply_jnp, *a) * cot))(
            (x, kks, bms))
        for a, b in zip(jax.tree_util.tree_leaves(gj),
                        jax.tree_util.tree_leaves(gp)):
            scale = float(jnp.abs(a).max()) + 1e-12
            assert float(jnp.abs(a - b).max()) / scale < 1e-5

    def test_sparse_group_split_matches(self):
        """Force a split on a packed (sparse) layer via a tiny budget:
        group-boundary parts + qtaps subsetting + the per-part dkk scatter
        must stay exact (fwd + grads vs the jnp twin).

        Gradients compare wrt the ORIGINAL hwio weights, through the
        differentiable plan_and_pack gathers — the production contract.
        The intermediate canonical dkk is NOT compared directly: an
        original element that pack_conv_kernel replicates into several
        packed slots only has a well-defined SUM of slot cotangents (the
        pack-gather VJP adds them), and the qpatches dW kernel splits that
        sum across duplicate slots differently from XLA's autodiff on this
        geometry (verified sum-equivalent; see _conv_cf_dw docstring)."""
        w0 = jnp.asarray(RNG.randn(5, 5, 16, 64) * 0.1, jnp.float32)
        b0 = jnp.asarray(RNG.randn(64) * 0.05, jnp.float32)
        w1 = jnp.asarray(RNG.randn(3, 3, 16, 48) * 0.1, jnp.float32)
        b1 = jnp.asarray(RNG.randn(48) * 0.05, jnp.float32)
        wh = jnp.asarray(RNG.randn(3, 3, 12, 3) * 0.1, jnp.float32)
        bh = jnp.asarray(RNG.randn(3) * 0.05, jnp.float32)
        x = jnp.asarray(RNG.randn(1, H, W, 16) * 0.2, jnp.float32)

        def full(apply_fn, inputs):
            xx, w0_, b0_, w1_, b1_, wh_, bh_ = inputs
            plan, kks, bms, f, ch = tf.plan_and_pack(
                H, W, [(w0_, b0_, 2), (w1_, b1_, 2)], (wh_, bh_), tm=128)
            z = apply_fn(plan, tf.nhwc_to_cf(xx, plan), kks, bms)
            return tf.cf_to_nhwc(z, plan, ch)

        inputs = (x, w0, b0, w1, b1, wh, bh)
        plan, *_ = tf.plan_and_pack(
            H, W, [(w0, b0, 2), (w1, b1, 2)], (wh, bh), tm=128)

        import unittest.mock as mock
        budget = 768 * 1024   # forces splits on the sparse head (4-part
        # fwd+dw) while every part stays feasible. Raised from 600K when
        # the boundary-clamped streaming landed: the 128-aligned guard
        # adds ~(128-g) lanes per side to the irreducible input tile
        tf._exec_cfg.cache_clear()
        tf._split_parts.cache_clear()
        try:
            with mock.patch.object(tf, "_VMEM_BUDGET", budget):
                assert any(
                    tf._split_parts(plan, L, 4, k)
                    for L in plan.layers if L.sparse is not None
                    for k in ("fwd1", "dw"))
                out = full(tf.tail_apply, inputs)
                cot = jnp.asarray(RNG.randn(*out.shape), jnp.float32)
                gp = jax.grad(lambda a: jnp.sum(
                    full(tf.tail_apply, a) * cot))(inputs)
        finally:
            tf._exec_cfg.cache_clear()
            tf._split_parts.cache_clear()

        ref = full(tf.tail_apply_jnp, inputs)
        np.testing.assert_allclose(out, ref, atol=2e-5)
        gj = jax.grad(lambda a: jnp.sum(
            full(tf.tail_apply_jnp, a) * cot))(inputs)
        for a, b in zip(gj, gp):
            scale = float(jnp.abs(a).max()) + 1e-12
            assert float(jnp.abs(a - b).max()) / scale < 1e-5

    def test_small_plan_feasible(self, tail_case):
        x, (w0, b0, w1, b1, wh, bh) = tail_case
        plan, *_ = tf.plan_and_pack(H, W, [(w0, b0, 2), (w1, b1, 2)],
                                    (wh, bh), tm=128)
        assert tf.plan_feasible(plan, itemsize=2)
        assert tf._effective_impl("pallas", plan, jnp.float32) == "pallas"


class TestHVPTail:
    """HVP-capable execution (tail_apply_fo / conv_p): forward + first
    gradients match the jnp twin, jax.jvp works through the Pallas kernels
    (custom_jvp rule), and grad-of-jvp — the omega Hv — matches
    jvp-over-grad on the pure-jnp oracle."""

    def test_forward(self, tail_case):
        x, ws = tail_case
        ref = _oracle(x, *ws)
        out = _fused(x, *ws, apply_fn=tf.tail_apply_fo)
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_jvp_matches_oracle(self, tail_case):
        """Forward-mode through the Pallas kernels (the custom_jvp rule)
        must equal jax's own jvp of the jnp oracle, tangents on every
        weight AND the input."""
        x, ws = tail_case
        v = tuple(jnp.asarray(RNG.randn(*a.shape) * 0.01, jnp.float32)
                  for a in (x, *ws))
        _, d_ref = jax.jvp(lambda *a: _oracle(*a), (x, *ws), v)
        _, d_fo = jax.jvp(lambda *a: _fused(*a, apply_fn=tf.tail_apply_fo),
                          (x, *ws), v)
        scale = float(jnp.abs(d_ref).max()) + 1e-12
        assert float(jnp.abs(d_ref - d_fo).max()) / scale < 1e-5

    def test_hvp_grad_of_jvp(self, tail_case):
        """grad(w -> jvp(L, w, v)) through the Pallas path == jvp(grad L)
        on the pure-jnp oracle, w.r.t. the conv weights (omega's Hv)."""
        x, ws = tail_case
        tgt = jnp.asarray(RNG.randn(B, 4 * H, 4 * W, 3), jnp.float32)
        v = tuple(jnp.asarray(RNG.randn(*w.shape) * 0.01, jnp.float32)
                  for w in ws)

        def loss_oracle(ws_):
            return jnp.mean((_oracle(x, *ws_) - tgt) ** 2)

        def loss_fo(ws_):
            return jnp.mean(
                (_fused(x, *ws_, apply_fn=tf.tail_apply_fo) - tgt) ** 2)

        _, hv_ref = jax.jvp(jax.grad(loss_oracle), (ws,), (v,))

        def dirderiv(ws_):
            _, dl = jax.jvp(loss_fo, (ws_,), (v,))
            return dl

        hv_fo = jax.grad(dirderiv)(ws)
        for a, b in zip(jax.tree_util.tree_leaves(hv_ref),
                        jax.tree_util.tree_leaves(hv_fo)):
            scale = float(jnp.abs(a).max()) + 1e-12
            assert float(jnp.abs(a - b).max()) / scale < 2e-4, scale


class TestFusedPrefix:
    """The last pre-tail block through the 1-layer CF plan
    (layers.run_prefix_blocks / tail_fused.run_fused_prefix_block): decode
    and decode_cf must match the XLA prefix exactly, for values, gradients,
    and the HVP path's jvp."""

    @pytest.fixture(autouse=True)
    def _small_grid(self, monkeypatch):
        # production gates the fused prefix to grids >= 1024 positions; the
        # tiny fixture's last prefix block is far smaller
        from neuroquant_tpu.models import layers
        monkeypatch.setattr(layers, "PREFIX_MIN_GRID", 1)

    def _models(self, tiny_cfg, arch):
        base = dict(tiny_cfg)
        base["fused_tail"] = "pallas"
        on = build_model(arch, {**base, "fused_prefix": "auto"})
        off = build_model(arch, {**base, "fused_prefix": "off"})
        return on, off

    @pytest.mark.parametrize("arch", ["hnerv", "nerv"])
    def test_decode_parity(self, tiny_hnerv_cfg, tiny_nerv_cfg, arch):
        cfg = tiny_hnerv_cfg if arch == "hnerv" else tiny_nerv_cfg
        if arch == "nerv":
            cfg = {**cfg, "n_frames": 8}
        m_on, m_off = self._models(cfg, arch)
        rng = jax.random.PRNGKey(0)
        if arch == "hnerv":
            x = jnp.asarray(RNG.randn(2, 80, 160, 3), jnp.float32)
        else:
            x = jnp.asarray([0.25, 0.75], jnp.float32)
        params = m_off.init(rng, x)
        emb = m_off.apply(params, x, method="encode")
        d_off = m_off.apply(params, emb, method="decode")
        d_on = m_on.apply(params, emb, method="decode")
        np.testing.assert_allclose(d_on, d_off, atol=3e-5)
        z_off = m_off.apply(params, emb, method="decode_cf")
        z_on = m_on.apply(params, emb, method="decode_cf")
        np.testing.assert_allclose(z_on, z_off, atol=3e-5)

    def test_gradient_parity(self, tiny_hnerv_cfg):
        m_on, m_off = self._models(tiny_hnerv_cfg, "hnerv")
        rng = jax.random.PRNGKey(0)
        x = jnp.asarray(RNG.randn(2, 80, 160, 3), jnp.float32)
        params = m_off.init(rng, x)
        emb = m_off.apply(params, x, method="encode")
        tgt = m_off.apply(params, emb, method="decode_cf") * 0.9

        def loss(m):
            def f(p):
                z = m.apply(p, emb, method="decode_cf")
                return jnp.mean((z - tgt) ** 2)
            return f

        g_off = jax.grad(loss(m_off))(params)
        g_on = jax.grad(loss(m_on))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_off),
                        jax.tree_util.tree_leaves(g_on)):
            scale = float(jnp.abs(a).max()) + 1e-10
            assert float(jnp.abs(a - b).max()) / scale < 2e-5

    def test_hvp_impl_jvp_parity(self, tiny_hnerv_cfg):
        """pallas_hvp routes the fused prefix through tail_apply_fo: jvp
        through the whole decode must match the XLA prefix's jvp."""
        base = dict(tiny_hnerv_cfg)
        m_hvp = build_model("hnerv", {**base, "fused_tail": "pallas_hvp",
                                      "fused_prefix": "auto"})
        m_off = build_model("hnerv", {**base, "fused_tail": "off"})
        rng = jax.random.PRNGKey(0)
        x = jnp.asarray(RNG.randn(2, 80, 160, 3), jnp.float32)
        params = m_off.init(rng, x)
        emb = m_off.apply(params, x, method="encode")
        v = jax.tree_util.tree_map(
            lambda a: jnp.asarray(RNG.randn(*a.shape) * 0.01, a.dtype),
            params)

        def f(m):
            return lambda p: jnp.mean(
                m.apply(p, emb, method="decode") ** 2)

        p_ref, d_ref = jax.jvp(f(m_off), (params,), (v,))
        p_fo, d_fo = jax.jvp(f(m_hvp), (params,), (v,))
        assert abs(p_ref - p_fo) / (abs(p_ref) + 1e-12) < 1e-5
        assert abs(d_ref - d_fo) / (abs(d_ref) + 1e-12) < 1e-4
