"""Fused upsample-conv equivalence, Pallas fake-quant kernel (interpret mode),
unit (block/layer) reconstruction, and data-parallel mesh tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuroquant_tpu.ops.fused_upsample import (
    conv_pixel_shuffle, conv_pixel_shuffle_perm,
)
from neuroquant_tpu.ops.pixelshuffle import pixel_shuffle


def _naive(x, w, b, r):
    k = w.shape[0]
    p = (k - 1) // 2
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, w, (1, 1), [(p, p), (p, p)],
                                     dimension_numbers=dn) + b
    return pixel_shuffle(y, r)


class TestFusedUpsample:
    @pytest.mark.parametrize("k,rh,rw", [(1, 5, 5), (3, 2, 2), (5, 2, 2),
                                         (3, 4, 4), (1, 2, 4), (1, 1, 1)])
    def test_both_fused_paths_match_naive(self, k, rh, rw):
        rng = np.random.RandomState(0)
        cin, cout = 6, 3
        x = jnp.asarray(rng.randn(2, 4, 5, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(k, k, cin, cout * rh * rw).astype(np.float32))
        b = jnp.asarray(rng.randn(cout * rh * rw).astype(np.float32))
        want = _naive(x, w, b, (rh, rw))
        got_perm = conv_pixel_shuffle_perm(x, w, b, (rh, rw))
        got_dil = conv_pixel_shuffle(x, w, b, (rh, rw))
        np.testing.assert_allclose(np.asarray(got_perm), np.asarray(want), atol=1e-4)
        np.testing.assert_allclose(np.asarray(got_dil), np.asarray(want), atol=1e-4)

    def test_gradients_match(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(1, 4, 4, 5).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 5, 3 * 4).astype(np.float32))
        b = jnp.asarray(rng.randn(12).astype(np.float32))
        g_naive = jax.grad(lambda w: (_naive(x, w, b, 2) ** 2).sum())(w)
        g_perm = jax.grad(
            lambda w: (conv_pixel_shuffle_perm(x, w, b, 2) ** 2).sum())(w)
        np.testing.assert_allclose(np.asarray(g_perm), np.asarray(g_naive),
                                   rtol=1e-4, atol=1e-4)


class TestPallasFakeQuant:
    """Interpret-mode checks of the fused FWHT->quant->FWHT kernel against
    the jnp path in quantization/qmodel.py."""

    def _jnp_reference(self, w, delta, zp, bits, hadamard, alpha=None, soft=True):
        from neuroquant_tpu.ops import quant as Q
        from neuroquant_tpu.ops.hadamard import fwht, pad_cin_to_pow2
        cin = w.shape[2]
        x = fwht(pad_cin_to_pow2(w), axis=2) if hadamard else w
        if alpha is None:
            xq = Q.uaq_fake_quant(x, delta, zp, bits)
        else:
            xq = Q.adaround_fake_quant(x, delta, zp, alpha, bits, soft=soft)
        if hadamard:
            xq = fwht(xq, axis=2)[:, :, :cin, :]
        return xq

    @pytest.mark.parametrize("hadamard", [True, False])
    def test_uaq_kernel(self, hadamard):
        from neuroquant_tpu.ops.pallas_fakequant import fused_fake_quant_hwio
        from neuroquant_tpu.ops import quant as Q
        from neuroquant_tpu.ops.hadamard import fwht, pad_cin_to_pow2

        w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 5, 6))
        dom = fwht(pad_cin_to_pow2(w), axis=2) if hadamard else w
        delta, zp = Q.init_weight_scale(dom, 4, True, "max")
        got = fused_fake_quant_hwio(w, delta, zp, 4, hadamard=hadamard,
                                    interpret=True)
        want = self._jnp_reference(w, delta, zp, 4, hadamard)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_adaround_kernel(self):
        from neuroquant_tpu.ops.pallas_fakequant import fused_fake_quant_hwio
        from neuroquant_tpu.ops import quant as Q
        from neuroquant_tpu.ops.hadamard import fwht, pad_cin_to_pow2

        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 4))
        dom = fwht(w, axis=2)
        delta, zp = Q.init_weight_scale(dom, 6, True, "max")
        alpha = Q.adaround_init_alpha(dom, delta)
        for soft in (True, False):
            got = fused_fake_quant_hwio(w, delta, zp, 6, hadamard=True,
                                        alpha=alpha, soft=soft, interpret=True)
            want = self._jnp_reference(w, delta, zp, 6, True, alpha, soft)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-3, atol=1e-3)


class TestUnitReconstruction:
    def test_block_recon_improves_block_output(self, tiny_hnerv_cfg):
        from neuroquant_tpu.models import build_model, example_input
        from neuroquant_tpu.quantization import init_quant_state, make_spec
        from neuroquant_tpu.quantization.calib_unit import (
            block_reconstruction, harvest_unit_io,
        )
        from neuroquant_tpu.quantization.qmodel import quantize_params

        model = build_model("hnerv", tiny_hnerv_cfg)
        x = example_input("hnerv", tiny_hnerv_cfg, 4)
        params = model.init(jax.random.PRNGKey(0), x)
        emb = model.apply(params, x, method="encode")
        spec = make_spec("hnerv", tiny_hnerv_cfg, channel_wise=True,
                         scale_method="max").with_bits([3] * 5)
        state = init_quant_state(params, spec)

        state2 = block_reconstruction(model, params, spec, state, 1, emb,
                                      iters=120, batch_size=2, lr=0.01,
                                      log_fn=lambda m: None)
        assert "w_alpha" in state2[spec.layer_names[1]]
        # the other layers' state is untouched
        assert "w_alpha" not in state2[spec.layer_names[0]]

    def test_layer_recon_runs(self, tiny_hnerv_cfg):
        from neuroquant_tpu.models import build_model, example_input
        from neuroquant_tpu.quantization import init_quant_state, make_spec
        from neuroquant_tpu.quantization.calib_unit import layer_reconstruction

        model = build_model("hnerv", tiny_hnerv_cfg)
        x = example_input("hnerv", tiny_hnerv_cfg, 2)
        params = model.init(jax.random.PRNGKey(0), x)
        emb = model.apply(params, x, method="encode")
        spec = make_spec("hnerv", tiny_hnerv_cfg, channel_wise=True,
                         scale_method="max").with_bits([4] * 5)
        state = init_quant_state(params, spec)
        state2 = layer_reconstruction(model, params, spec, state, 0, emb,
                                      iters=60, batch_size=2,
                                      log_fn=lambda m: None)
        assert "w_alpha" in state2[spec.layer_names[0]]

    def test_nerv_block_recon_runs(self, tiny_nerv_cfg):
        # NeRV fuses the fc-grid shuffle into decoder0; the tap harvest must
        # still produce consistent unit inputs/outputs
        from neuroquant_tpu.models import build_model, example_input
        from neuroquant_tpu.quantization import init_quant_state, make_spec
        from neuroquant_tpu.quantization.calib_unit import (
            block_reconstruction, harvest_unit_io,
        )

        model = build_model("nerv", tiny_nerv_cfg)
        x = example_input("nerv", tiny_nerv_cfg, 4)
        params = model.init(jax.random.PRNGKey(0), x)
        emb = model.apply(params, x, method="encode")
        spec = make_spec("nerv", tiny_nerv_cfg, channel_wise=True,
                         scale_method="max").with_bits([4] * 5)
        io = harvest_unit_io(model, params, "", spec, emb)
        # every tap's input feeds the next unit: shapes must chain
        for u in range(len(spec.layer_names)):
            assert io[u][0].shape[0] == emb.shape[0]
        state = init_quant_state(params, spec)
        state2 = block_reconstruction(model, params, spec, state, 1, emb,
                                      iters=40, batch_size=2,
                                      log_fn=lambda m: None)
        assert "w_alpha" in state2[spec.layer_names[1]]

    def test_fisher_and_qdrop_modes(self, tiny_hnerv_cfg):
        from neuroquant_tpu.models import build_model, example_input
        from neuroquant_tpu.quantization import init_quant_state, make_spec
        from neuroquant_tpu.quantization.calib_unit import (
            block_reconstruction, harvest_unit_grads,
        )

        model = build_model("hnerv", tiny_hnerv_cfg)
        x = example_input("hnerv", tiny_hnerv_cfg, 4)
        params = model.init(jax.random.PRNGKey(0), x)
        emb = model.apply(params, x, method="encode")
        spec = make_spec("hnerv", tiny_hnerv_cfg, channel_wise=True,
                         scale_method="max").with_bits([3] * 5)
        state = init_quant_state(params, spec)

        g = harvest_unit_grads(model, params, spec, state, 1, emb)
        assert g.shape[0] == emb.shape[0]
        assert float(g.min()) >= 1.0          # |grad| + 1 (data_utils.py:231)
        assert np.isfinite(np.asarray(g)).all()

        for mode in ("fisher_diag", "fisher_full"):
            st = block_reconstruction(model, params, spec, state, 1, emb,
                                      iters=40, batch_size=2, opt_mode=mode,
                                      log_fn=lambda m: None)
            assert "w_alpha" in st[spec.layer_names[1]]

        st = block_reconstruction(model, params, spec, state, 1, emb,
                                  iters=40, batch_size=2, input_prob=0.5,
                                  log_fn=lambda m: None)
        assert "w_alpha" in st[spec.layer_names[1]]

    def test_streaming_bf16_cache_matches_shared(self, tiny_hnerv_cfg):
        """The HD OOM fix: per-unit streamed bf16 harvest (only=u,
        cache_dtype=bf16) reconstructs to (nearly) the same rounding as the
        shared fp32 harvest — bf16 targets only perturb the loss in its low
        bits."""
        import jax.numpy as jnp
        from neuroquant_tpu.models import build_model, example_input
        from neuroquant_tpu.quantization import init_quant_state, make_spec
        from neuroquant_tpu.quantization.calib_unit import (
            block_reconstruction, harvest_unit_io,
        )

        model = build_model("hnerv", tiny_hnerv_cfg)
        x = example_input("hnerv", tiny_hnerv_cfg, 4)
        params = model.init(jax.random.PRNGKey(0), x)
        emb = model.apply(params, x, method="encode")
        spec = make_spec("hnerv", tiny_hnerv_cfg, channel_wise=True,
                         scale_method="max").with_bits([3] * 5)
        state = init_quant_state(params, spec)

        io_only = harvest_unit_io(model, params, "", spec, emb, only=1,
                                  cache_dtype=jnp.bfloat16)
        assert set(io_only.keys()) == {1}
        assert io_only[1][0].dtype == jnp.bfloat16
        # streamed values == shared values cast to bf16
        io_full = harvest_unit_io(model, params, "", spec, emb)
        np.testing.assert_array_equal(
            np.asarray(io_only[1][1], np.float32),
            np.asarray(io_full[1][1].astype(jnp.bfloat16), np.float32))

        kw = dict(iters=120, batch_size=2, lr=0.01, log_fn=lambda m: None)
        s_shared = block_reconstruction(model, params, spec, state, 1, emb,
                                        io=io_full, **kw)
        s_stream = block_reconstruction(model, params, spec, state, 1, emb,
                                        cache_dtype=jnp.bfloat16, **kw)
        a = np.asarray(s_shared[spec.layer_names[1]]["w_alpha"]) >= 0
        b = np.asarray(s_stream[spec.layer_names[1]]["w_alpha"]) >= 0
        assert np.isfinite(
            np.asarray(s_stream[spec.layer_names[1]]["w_alpha"])).all()
        assert (a == b).mean() > 0.9


class TestDataParallel:
    def test_dryrun_multichip_8(self):
        import __graft_entry__ as g
        g.dryrun_multichip(8)

    def test_sharded_matches_single(self, tiny_hnerv_cfg):
        """DP gradient step over 4 virtual devices == single-device step."""
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P
        from neuroquant_tpu.metrics import loss_fn
        from neuroquant_tpu.models import build_model
        from neuroquant_tpu.parallel import make_mesh, replicate, shard_batch

        model = build_model("hnerv", tiny_hnerv_cfg)
        img = jax.random.uniform(jax.random.PRNGKey(1), (4, 80, 160, 3))
        params = model.init(jax.random.PRNGKey(0), img[:1])
        opt = optax.adam(1e-3, eps=1e-8)

        def step(params, opt_state, img):
            def L(p):
                return loss_fn(model.apply(p, img), img, "l2")
            l, g = jax.value_and_grad(L)(params)
            u, opt_state = opt.update(g, opt_state, params)
            return optax.apply_updates(params, u), opt_state, l

        # single device
        p1, _, l1 = jax.jit(step)(params, opt.init(params), img)

        mesh = make_mesh(4)
        repl = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P("data"))
        stepj = jax.jit(step, in_shardings=(repl, repl, shard),
                        out_shardings=(repl, repl, repl))
        p2, _, l2 = stepj(replicate(params, mesh), replicate(opt.init(params), mesh),
                          shard_batch(img, mesh))
        assert float(l1) == pytest.approx(float(l2), rel=1e-5)
        d = max(float(jnp.abs(a - b).max())
                for a, b in zip(jax.tree_util.tree_leaves(p1),
                                jax.tree_util.tree_leaves(p2)))
        assert d < 1e-5, d


class TestDataParallelCalibration:
    def test_dp_calibration_matches_single(self, tiny_hnerv_cfg, frame_dir):
        """model_reconstruction with an 8-device mesh == single-device run."""
        import jax
        import jax.numpy as jnp
        from neuroquant_tpu.data import VideoDataSet
        from neuroquant_tpu.models import build_model
        from neuroquant_tpu.parallel import make_mesh
        from neuroquant_tpu.quantization import (
            init_quant_state, make_spec, model_reconstruction, quantize_params,
        )

        ds = VideoDataSet(tiny_hnerv_cfg, frame_dir)
        model = build_model("hnerv", tiny_hnerv_cfg)
        params = model.init(jax.random.PRNGKey(0), ds.frames[:1])
        emb = model.apply(params, ds.frames, method="encode")
        spec = make_spec("hnerv", tiny_hnerv_cfg, channel_wise=True,
                         scale_method="max").with_bits([4] * 5)
        state0 = init_quant_state(params, spec)

        kw = dict(arch="hnerv", batch_size=8, iters=16, warmup=0.2,
                  lr=0.003, seed=903, log_fn=lambda m: None)
        s1, _ = model_reconstruction(model, params, spec, state0, emb,
                                     ds.frames, list(range(8)), **kw)
        s2, _ = model_reconstruction(model, params, spec, state0, emb,
                                     ds.frames, list(range(8)),
                                     mesh=make_mesh(8), **kw)
        import numpy as np
        for ln in spec.layer_names:
            for k in s1[ln]:
                np.testing.assert_allclose(np.asarray(s1[ln][k]),
                                           np.asarray(s2[ln][k]),
                                           rtol=1e-4, atol=1e-5)


class TestPallasCustomVJP:
    """The differentiable kernel wrappers must give EXACTLY the jnp path's
    gradients (their backward is the VJP of the jnp reference)."""

    @pytest.mark.parametrize("hadamard", [True, False])
    def test_uaq_grads_match_jnp(self, hadamard):
        from neuroquant_tpu.ops import quant as Q
        from neuroquant_tpu.ops.hadamard import fwht, pad_cin_to_pow2
        from neuroquant_tpu.ops.pallas_fakequant import (
            _jnp_reference, pallas_uaq_fake_quant,
        )

        w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 5, 6))
        dom = fwht(pad_cin_to_pow2(w), axis=2) if hadamard else w
        delta, zp = Q.init_weight_scale(dom, 4, True, "max")

        def loss_pallas(w, d):
            return (pallas_uaq_fake_quant(w, d, zp, 4, hadamard) ** 2).sum()

        def loss_jnp(w, d):
            return (_jnp_reference(w, d, zp, None, 4, hadamard, True) ** 2).sum()

        (gw_p, gd_p) = jax.grad(loss_pallas, argnums=(0, 1))(w, delta)
        (gw_j, gd_j) = jax.grad(loss_jnp, argnums=(0, 1))(w, delta)
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_j),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gd_p), np.asarray(gd_j),
                                   rtol=1e-4, atol=1e-4)

    def test_adaround_alpha_grads_match_jnp(self):
        from neuroquant_tpu.ops import quant as Q
        from neuroquant_tpu.ops.hadamard import fwht
        from neuroquant_tpu.ops.pallas_fakequant import (
            _jnp_reference, pallas_ada_fake_quant,
        )

        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 4))
        dom = fwht(w, axis=2)
        delta, zp = Q.init_weight_scale(dom, 6, True, "max")
        alpha = Q.adaround_init_alpha(dom, delta)

        def loss_pallas(a):
            return (pallas_ada_fake_quant(w, delta, zp, a, 6, True, True)
                    ** 2).sum()

        def loss_jnp(a):
            return (_jnp_reference(w, delta, zp, a, 6, True, True) ** 2).sum()

        ga_p = jax.grad(loss_pallas)(alpha)
        ga_j = jax.grad(loss_jnp)(alpha)
        assert float(jnp.abs(ga_j).max()) > 0    # non-degenerate
        np.testing.assert_allclose(np.asarray(ga_p), np.asarray(ga_j),
                                   rtol=1e-4, atol=1e-4)

    def test_quantize_params_pallas_impl(self, tiny_hnerv_cfg):
        """quantize_params(spec.fq_impl='pallas') == jnp impl, fwd + grads."""
        import dataclasses

        from neuroquant_tpu.models import build_model
        from neuroquant_tpu.quantization import init_quant_state, make_spec
        from neuroquant_tpu.quantization.qmodel import quantize_params

        model = build_model("hnerv", tiny_hnerv_cfg)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 80, 160, 3),
                        jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x)
        spec_j = make_spec("hnerv", tiny_hnerv_cfg, channel_wise=True,
                           scale_method="max", hadamard=True)
        spec_p = dataclasses.replace(spec_j, fq_impl="pallas")
        state = init_quant_state(params, spec_j)

        def out_sq(spec):
            def f(state):
                qp = quantize_params(params, spec, state, mode="uaq")
                emb = model.apply(params, x, method="encode")
                return (model.apply(qp, emb, method="decode") ** 2).mean()
            return f

        vj, gj = jax.value_and_grad(out_sq(spec_j))(state)
        vp, gp = jax.value_and_grad(out_sq(spec_p))(state)
        np.testing.assert_allclose(float(vp), float(vj), rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(gp),
                        jax.tree_util.tree_leaves(gj)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestSharedHarvest:
    def test_precomputed_io_reused_across_units(self, tiny_hnerv_cfg):
        """Passing io= skips the per-unit FP re-harvest and gives identical
        reconstruction results."""
        from neuroquant_tpu.models import build_model, example_input
        from neuroquant_tpu.quantization import init_quant_state, make_spec
        from neuroquant_tpu.quantization.calib_unit import (
            block_reconstruction, harvest_unit_io,
        )

        model = build_model("hnerv", tiny_hnerv_cfg)
        x = example_input("hnerv", tiny_hnerv_cfg, 4)
        params = model.init(jax.random.PRNGKey(0), x)
        emb = model.apply(params, x, method="encode")
        spec = make_spec("hnerv", tiny_hnerv_cfg, channel_wise=True,
                         scale_method="max").with_bits([3] * 5)
        state = init_quant_state(params, spec)
        io = harvest_unit_io(model, params, "", spec, emb)

        kw = dict(iters=40, batch_size=2, lr=0.01, log_fn=lambda m: None)
        s_shared = state
        for u in (1, 2):
            s_shared = block_reconstruction(model, params, spec, s_shared, u,
                                            emb, io=io, **kw)
        s_fresh = state
        for u in (1, 2):
            s_fresh = block_reconstruction(model, params, spec, s_fresh, u,
                                           emb, **kw)
        for name in spec.layer_names:
            for k in s_shared[name]:
                np.testing.assert_allclose(
                    np.asarray(s_shared[name][k]),
                    np.asarray(s_fresh[name][k]), rtol=1e-5, atol=1e-6)
