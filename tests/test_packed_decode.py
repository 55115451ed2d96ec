"""Space-to-depth packed decoder tail (ops/packed_decode.py): exact
equivalence with the reference conv + PixelShuffle composition
(_layers.py:20-36), gradients, and the cost-model plan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuroquant_tpu.ops.packed_decode import (
    depth_to_space, pack_conv_kernel, packed_conv, packed_kernel_geometry,
    plan_packed_tail, space_to_depth, upsample_conv_packed,
)
from neuroquant_tpu.ops.pixelshuffle import pixel_shuffle


def _conv(x, w, b, pad):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, w, (1, 1), [(pad, pad), (pad, pad)],
                                     dimension_numbers=dn)
    return y + b if b is not None else y


class TestPackedConv:
    @pytest.mark.parametrize("k,r", [(5, 2), (3, 2), (3, 4), (1, 2), (5, 4),
                                     (7, 2), (5, 3), (3, 6), (3, 3)])
    def test_matches_unpacked(self, k, r):
        rng = np.random.RandomState(k * 10 + r)
        x = jnp.asarray(rng.randn(2, 4 * r, 6 * r, 7), jnp.float32)
        w = jnp.asarray(rng.randn(k, k, 7, 9), jnp.float32)
        b = jnp.asarray(rng.randn(9), jnp.float32)
        ref = _conv(x, w, b, (k - 1) // 2)
        got = depth_to_space(packed_conv(space_to_depth(x, r), w, b, r), r)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)

    def test_geometry(self):
        assert packed_kernel_geometry(5, 2) == (3, 1)
        assert packed_kernel_geometry(3, 2) == (3, 1)
        assert packed_kernel_geometry(3, 4) == (3, 1)
        assert packed_kernel_geometry(1, 2) == (1, 0)

    def test_perm_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 6), jnp.float32)
        perm = np.random.RandomState(2).permutation(4)
        back = depth_to_space(space_to_depth(x, 2, perm), 2, perm)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_kernel_repack_is_linear_gather(self):
        # differentiability: d(packed_kernel)/dw is a 0/1 gather
        w = jnp.ones((3, 3, 2, 2))
        g = jax.grad(lambda w: pack_conv_kernel(w, 2).sum())(w)
        # every original tap appears exactly r*r = 4 times
        np.testing.assert_array_equal(np.asarray(g), np.full_like(w, 4.0))


class TestPackedTailChain:
    def test_hnerv_like_chain(self):
        """conv5/s2 -> gelu -> conv5/s2 -> gelu -> head conv3 as packed tail."""
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 16, 24, 13), jnp.float32)
        wA = jnp.asarray(rng.randn(5, 5, 13, 32) * 0.1, jnp.float32)
        bA = jnp.asarray(rng.randn(32) * 0.1, jnp.float32)
        wB = jnp.asarray(rng.randn(5, 5, 8, 24) * 0.1, jnp.float32)
        bB = jnp.asarray(rng.randn(24) * 0.1, jnp.float32)
        wH = jnp.asarray(rng.randn(3, 3, 6, 3) * 0.1, jnp.float32)
        bH = jnp.asarray(rng.randn(3) * 0.1, jnp.float32)
        gelu = jax.nn.gelu
        ref = gelu(pixel_shuffle(_conv(x, wA, bA, 2), 2))
        ref = gelu(pixel_shuffle(_conv(ref, wB, bB, 2), 2))
        ref = _conv(ref, wH, bH, 1)
        y, perm = upsample_conv_packed(x, wA, bA, 1, 2)
        y = gelu(y)
        y, perm = upsample_conv_packed(y, wB, bB, 2, 2, in_perm=perm)
        y = gelu(y)
        y = packed_conv(y, wH, bH, 4, in_perm=perm)
        got = depth_to_space(y, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)


class TestModelPackedDecode:
    def _models(self, tiny_hnerv_cfg, packed_tail):
        from neuroquant_tpu.models import build_model

        cfg = dict(tiny_hnerv_cfg, packed_tail=packed_tail)
        return build_model("hnerv", cfg)

    def test_hnerv_fast_path_matches(self, tiny_hnerv_cfg):
        # force packing at block 1 (tiny channels make the auto plan decline)
        m = self._models(tiny_hnerv_cfg, packed_tail=1)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 80, 160, 3), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        emb = m.apply(params, x, method="encode")
        fast = m.apply(params, emb, method="decode")
        slow, _ = m.apply(params, emb, method="decode", return_embeds=True)
        assert float(jnp.abs(fast - slow).max()) < 1e-5

    def test_nerv_fast_path_matches_and_grads(self, tiny_nerv_cfg):
        from neuroquant_tpu.models import build_model

        cfg = dict(tiny_nerv_cfg, n_frames=8, packed_tail=1)
        m = build_model("nerv", cfg)
        ni = jnp.asarray([0.25, 0.625])
        params = m.init(jax.random.PRNGKey(1), ni)
        emb = m.apply(params, ni, method="encode")
        fast = m.apply(params, emb, method="decode")
        slow, _ = m.apply(params, emb, method="decode", return_embeds=True)
        assert float(jnp.abs(fast - slow).max()) < 1e-5

        def loss(p, use_fast):
            out = m.apply(p, emb, method="decode") if use_fast else \
                m.apply(p, emb, method="decode", return_embeds=True)[0]
            return ((out - 0.5) ** 2).mean()

        g_fast = jax.grad(loss)(params, True)
        g_slow = jax.grad(loss)(params, False)
        leaves_f = jax.tree_util.tree_leaves(g_fast)
        leaves_s = jax.tree_util.tree_leaves(g_slow)
        for a, b in zip(leaves_f, leaves_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-4)

    def test_quantized_decode_packed(self, tiny_hnerv_cfg):
        """quantize_params -> packed decode == quantize_params -> unpacked."""
        from neuroquant_tpu.models import build_model
        from neuroquant_tpu.quantization import (
            init_quant_state, make_spec, quantize_params,
        )

        cfg = dict(tiny_hnerv_cfg, packed_tail=1)
        m = build_model("hnerv", cfg)
        x = jnp.asarray(np.random.RandomState(3).rand(2, 80, 160, 3), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        emb = m.apply(params, x, method="encode")
        spec = make_spec("hnerv", cfg, channel_wise=True, scale_method="max",
                         hadamard=True)
        state = init_quant_state(params, spec)
        qp = quantize_params(params, spec, state, mode="uaq")
        fast = m.apply(qp, emb, method="decode")
        slow, _ = m.apply(qp, emb, method="decode", return_embeds=True)
        assert float(jnp.abs(fast - slow).max()) < 1e-5


class TestPlan:
    def test_bunny_shapes_pick_t3(self):
        # HNeRV-3M Bunny: kernels [1,3,5,5,5], strides [5,4,4,2,2]
        chans = [77, 64, 53, 44, 37]
        t = plan_packed_tail([1, 3, 5, 5, 5], [5, 4, 4, 2, 2],
                             [92] + chans[:-1], chans, 640, 1280)
        assert t == 3
        # NeRV-3M: kernels all 3
        chans = [72, 36, 24, 24, 24]
        t = plan_packed_tail([3, 3, 3, 3, 3], [5, 4, 4, 2, 2],
                             [145] + chans[:-1], chans, 640, 1280)
        assert t == 3

    def test_uvg_feasibility_informs_impl_not_start(self):
        """UVG 960x1920 (strides [5,4,4,3,2]): the MXU cost model prefers
        the f=6 start (t=3). Feasibility gates on the FORWARD kernels only
        (one call or cout-row split) — the custom-VJP backward falls back
        to jnp per gradient kernel that would need a split
        (tail_fused._tail_apply_bwd) — and the f=6 forward plan is
        feasible, so 'auto' keeps both the cost-model start AND the Pallas
        execution (hardware-validated: 221.6 FPS vs 151.2 XLA-packed vs
        87.9 jnp — scripts/uvg_split_probe.py)."""
        from neuroquant_tpu.ops.packed_decode import (
            fused_tail_feasible, resolve_pack_start)

        ker, st = [1, 3, 5, 5, 5], [5, 4, 4, 3, 2]
        chans = [77, 64, 53, 44, 37]
        ich = [92] + chans[:-1]
        assert fused_tail_feasible(3, ker, st, ich, chans, 960, 1920)
        assert fused_tail_feasible(4, ker, st, ich, chans, 960, 1920)
        t = resolve_pack_start("auto", ker, st, "none", ich, chans, 960, 1920)
        assert t == 3
        # Bunny: same start, and its f=4 plan IS Pallas-feasible
        t = resolve_pack_start("auto", [1, 3, 5, 5, 5], [5, 4, 4, 2, 2],
                               "none", ich, chans, 640, 1280)
        assert t == 3
        assert fused_tail_feasible(3, [1, 3, 5, 5, 5], [5, 4, 4, 2, 2],
                                   ich, chans, 640, 1280)

    def test_plan_geometry_matches_plan_and_pack(self):
        """plan_geometry (pure shape math, used for feasibility gating)
        must produce the identical TailPlan that plan_and_pack derives
        from real weight arrays."""
        from neuroquant_tpu.ops.tail_fused import plan_and_pack, plan_geometry

        rng = np.random.RandomState(0)
        blocks, geoms = [], []
        for (k, cin, cout, r) in [(5, 24, 40, 2), (3, 10, 48, 2)]:
            blocks.append((jnp.asarray(rng.randn(k, k, cin, cout),
                                       jnp.float32),
                           jnp.asarray(rng.randn(cout), jnp.float32), r))
            geoms.append((k, cin, cout, r))
        head = (jnp.asarray(rng.randn(3, 3, 12, 3), jnp.float32),
                jnp.asarray(rng.randn(3), jnp.float32))
        plan, _, _, f, _ = plan_and_pack(40, 80, blocks, head)
        pg, fg = plan_geometry(40, 80, geoms, (3, 12, 3))
        assert pg == plan and fg == f

    def test_tiny_channels_pack_head_only(self):
        # sub-128 channels: packing the convs only adds FLOPs, but absorbing
        # the LAST block's shuffle still wins — the 3-output-channel head at
        # full resolution is maximally lane-padded, so the model packs it
        t = plan_packed_tail([1, 3, 3], [5, 4, 4], [24, 20, 17], [20, 17, 14],
                             80, 160)
        assert t == 2


class TestPackGating:
    def test_norm_disables_packing(self, tiny_hnerv_cfg):
        """dec_norm != 'none' needs spatial statistics per real resolution —
        the packed tail must auto-disable and decode must still work."""
        from neuroquant_tpu.models import build_model

        cfg = dict(tiny_hnerv_cfg, dec_norm="instance", packed_tail="auto")
        m = build_model("hnerv", cfg)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 80, 160, 3),
                        jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        bound = m.bind(params)
        assert bound.pack_start is None
        out = m.apply(params, x)
        assert out.shape == (2, 80, 160, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_explicit_off(self, tiny_hnerv_cfg):
        from neuroquant_tpu.models import build_model

        cfg = dict(tiny_hnerv_cfg, packed_tail="off")
        m = build_model("hnerv", cfg)
        x = jnp.asarray(np.random.RandomState(1).rand(1, 80, 160, 3),
                        jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        assert m.bind(params).pack_start is None

    def test_explicit_out_of_range_fails_loudly(self):
        """A config typo in packed_tail would silently disable packing
        (~5x decode regression with no functional signal) — it must raise."""
        from neuroquant_tpu.ops.packed_decode import resolve_pack_start

        kw = dict(kernels=[1, 3, 3], strides=[5, 4, 4], dec_norm="none",
                  in_channels=[24, 20, 16], out_channels=[20, 16, 3],
                  crop_h=80, crop_w=160)
        with pytest.raises(ValueError, match="out of range"):
            resolve_pack_start(7, **kw)
        with pytest.raises(ValueError, match="out of range"):
            resolve_pack_start(-1, **kw)
        # in-range explicit index passes through unchanged
        assert resolve_pack_start(2, **kw) == 2
        assert resolve_pack_start("off", **kw) is None


class TestPNeRVPackedTail:
    """PNeRV's post-fusion tail (last block + head) runs packed/fused
    (models/pnerv.py pnerv_tail_packed); the BSM-fused blocks stay unpacked."""

    def _cfg(self, tiny_pnerv_cfg, **kw):
        return dict(tiny_pnerv_cfg, **kw)

    @pytest.mark.parametrize("arch", ["pnerv", "pnerv2"])
    def test_fast_path_matches_and_grads(self, tiny_pnerv_cfg, arch):
        from neuroquant_tpu.models import build_model

        m = build_model(arch, self._cfg(tiny_pnerv_cfg))
        x = jnp.asarray(np.random.RandomState(0).rand(2, 80, 160, 3),
                        jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)
        emb = m.apply(params, x, method="encode")
        fast = m.apply(params, emb, method="decode")
        slow, _ = m.apply(params, emb, method="decode", return_embeds=True)
        assert float(jnp.abs(fast - slow).max()) < 1e-5

        def loss(p, use_fast):
            out = m.apply(p, emb, method="decode") if use_fast else \
                m.apply(p, emb, method="decode", return_embeds=True)[0]
            return ((out - 0.5) ** 2).mean()

        g_fast = jax.tree_util.tree_leaves(jax.grad(loss)(params, True))
        g_slow = jax.tree_util.tree_leaves(jax.grad(loss)(params, False))
        for a, b in zip(g_fast, g_slow):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-3)

    def test_decode_cf_loss_matches_nhwc(self, tiny_pnerv_cfg):
        """The packed-domain calibration loss equals the NHWC lp_loss — incl.
        the sublane-padded channel rows (ch=12 -> 16 here), which border_mask
        (ch=...) must zero or out_img(0)=0.5 leaks a constant bias."""
        from neuroquant_tpu.models import build_model, tail_plan_for
        from neuroquant_tpu.ops.tail_fused import border_mask, pack_targets

        m = build_model("pnerv", self._cfg(tiny_pnerv_cfg))
        x = jnp.asarray(np.random.RandomState(3).rand(2, 80, 160, 3),
                        jnp.float32)
        params = m.init(jax.random.PRNGKey(1), x)
        emb = m.apply(params, x, method="encode")
        slow, _ = m.apply(params, emb, method="decode", return_embeds=True)
        plan, f, ch = tail_plan_for("pnerv", tiny_pnerv_cfg)
        assert ch % 8 != 0, "fixture must exercise the padded-channel case"
        z = m.apply(params, emb, method="decode_cf")
        gt = jnp.asarray(np.random.RandomState(4).rand(2, 80, 160, 3),
                         jnp.float32)
        mask = border_mask(plan, ch=ch)
        cf = (((z - pack_targets(gt, plan, f)) * mask) ** 2).sum() / (2 * 80 * 160)
        ref = ((slow - gt) ** 2).sum(axis=-1).mean()
        assert abs(float(cf) - float(ref)) < 1e-6

    def test_packed_tail_off(self, tiny_pnerv_cfg):
        from neuroquant_tpu.models import build_model, tail_plan_for
        from neuroquant_tpu.models.pnerv import pnerv_tail_packed

        cfg = self._cfg(tiny_pnerv_cfg, packed_tail="off")
        m = build_model("pnerv", cfg)
        assert not pnerv_tail_packed(m.cfg)
        assert tail_plan_for("pnerv", cfg) is None
        x = jnp.asarray(np.random.RandomState(5).rand(1, 80, 160, 3),
                        jnp.float32)
        params = m.init(jax.random.PRNGKey(2), x)
        out = m.apply(params, x)
        assert out.shape == (1, 80, 160, 3)

    def test_quantized_decode_packed(self, tiny_pnerv_cfg):
        """quantize_params -> packed PNeRV decode == unpacked decode."""
        from neuroquant_tpu.models import build_model
        from neuroquant_tpu.quantization import (
            init_quant_state, make_spec, quantize_params,
        )

        cfg = self._cfg(tiny_pnerv_cfg)
        m = build_model("pnerv", cfg)
        x = jnp.asarray(np.random.RandomState(6).rand(2, 80, 160, 3),
                        jnp.float32)
        params = m.init(jax.random.PRNGKey(3), x)
        spec = make_spec("pnerv", cfg, channel_wise=True, scale_method="max",
                         hadamard=False)
        state = init_quant_state(params, spec)
        qp = quantize_params(params, spec, state, mode="uaq")
        emb = m.apply(params, x, method="encode")
        fast = m.apply(qp, emb, method="decode")
        slow, _ = m.apply(qp, emb, method="decode", return_embeds=True)
        assert float(jnp.abs(fast - slow).max()) < 1e-5

    def test_bunny_tie_prefers_packed_under_fused(self):
        """The flagship PNeRV Bunny shapes TIE exactly under the XLA padded-
        cost model (204800*4*9 == 819200*1*9); with the fused Pallas tail
        available the tie must break toward packing (prefer_packed), since
        the kernels don't pay the model's 128-lane channel padding."""
        from neuroquant_tpu.models.pnerv import PNeRVConfig, pnerv_tail_packed

        bunny = dict(crop_h=640, crop_w=1280, enc_channel=64, emd_channel=16,
                     enc_strides=[5, 4, 4, 2, 2], kfc_h_w_c=[20, 40, 100],
                     kfc_strides=[2, 2, 2, 2, 2], dec_norm="none",
                     dec_acts="gelu")
        c_pallas = PNeRVConfig.from_cfg(dict(bunny, fused_tail="pallas"))
        c_xla = PNeRVConfig.from_cfg(dict(bunny, fused_tail="off"))
        assert pnerv_tail_packed(c_pallas)
        assert not pnerv_tail_packed(c_xla)   # tie -> unpacked on plain XLA

    @pytest.mark.parametrize("impl", ["jnp", "pallas"])
    def test_fused_impl_matches(self, tiny_pnerv_cfg, impl):
        """The fused tail impls (what the TPU runs under 'auto') match the
        unpacked composition for PNeRV; 'pallas' runs in interpret mode on
        CPU (tests/conftest)."""
        from neuroquant_tpu.models import build_model

        m = build_model("pnerv", self._cfg(tiny_pnerv_cfg, fused_tail=impl))
        x = jnp.asarray(np.random.RandomState(7).rand(1, 80, 160, 3),
                        jnp.float32)
        params = m.init(jax.random.PRNGKey(4), x)
        emb = m.apply(params, x, method="encode")
        fast = m.apply(params, emb, method="decode")
        slow, _ = m.apply(params, emb, method="decode", return_embeds=True)
        assert float(jnp.abs(fast - slow).max()) < 2e-5
