"""Unit tests for core ops: FWHT, pixel shuffle (vs torch), MS-SSIM, quant math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuroquant_tpu.ops.hadamard import (
    fwht, hadamard_along_channel_weight, next_power_of_two, pad_cin_to_pow2,
)
from neuroquant_tpu.ops.pixelshuffle import pixel_shuffle, pixel_unshuffle
from neuroquant_tpu.ops import quant as Q
from neuroquant_tpu.ops.msssim import ms_ssim, ssim


class TestFWHT:
    def test_matches_hadamard_matrix(self):
        from scipy.linalg import hadamard
        rng = np.random.RandomState(0)
        for n in (2, 4, 8, 16, 64):
            x = rng.randn(5, n).astype(np.float32)
            want = x @ hadamard(n).astype(np.float32) / np.sqrt(n)
            got = np.asarray(fwht(jnp.asarray(x), axis=-1))
            np.testing.assert_allclose(got, want, atol=1e-4)

    def test_self_inverse(self):
        # mirrors the reference's only inline test (quant_layer.py:94-100)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4, 4))
        y = fwht(x, axis=1)
        x_rec = fwht(y, axis=1)
        assert float(jnp.abs(x - x_rec).max()) < 1e-5

    def test_weight_transform_roundtrip_nonpow2(self):
        # C_in = 5 -> pad to 8, transform, inverse, crop: must round-trip
        w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 5, 7))
        wp = pad_cin_to_pow2(w)
        assert wp.shape == (3, 3, 8, 7)
        y = hadamard_along_channel_weight(wp)
        back = hadamard_along_channel_weight(y)[:, :, :5, :]
        np.testing.assert_allclose(np.asarray(back), np.asarray(w), atol=1e-5)

    def test_next_power_of_two(self):
        assert [next_power_of_two(n) for n in (0, 1, 2, 3, 7, 8, 92, 160)] == \
            [1, 1, 2, 4, 8, 8, 128, 256]


class TestPixelShuffle:
    def test_matches_torch(self):
        import torch
        import torch.nn.functional as F
        rng = np.random.RandomState(0)
        for r in (2, 3, 4):
            x = rng.randn(2, 5, 6, 7 * r * r).astype(np.float32)   # NHWC
            got = np.asarray(pixel_shuffle(jnp.asarray(x), r))
            want = F.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), r)
            want = want.permute(0, 2, 3, 1).numpy()
            np.testing.assert_allclose(got, want, atol=0)

    def test_anisotropic_matches_reference_view_shuffle(self):
        """The NeRV layer-0 shuffle (models/NeRV.py:51) expressed in torch ops
        must equal pixel_shuffle with (fc_h, fc_w)."""
        import torch
        fc_h, fc_w, c, h, w = 2, 4, 3, 5, 6
        x = np.random.RandomState(1).randn(2, h, w, c * fc_h * fc_w).astype(np.float32)
        got = np.asarray(pixel_shuffle(jnp.asarray(x), (fc_h, fc_w)))
        t = torch.from_numpy(x).permute(0, 3, 1, 2)   # NCHW
        n = t.shape[0]
        want = (t.view(n, -1, fc_h, fc_w, h, w).permute(0, 1, 4, 2, 5, 3)
                .reshape(n, -1, fc_h * h, fc_w * w).permute(0, 2, 3, 1).numpy())
        np.testing.assert_allclose(got, want, atol=0)

    def test_unshuffle_inverse(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 6, 18))
        y = pixel_shuffle(x, 3)
        np.testing.assert_allclose(np.asarray(pixel_unshuffle(y, 3)),
                                   np.asarray(x), atol=0)


class TestMSSSIM:
    def test_identical_images(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 192, 224, 3))
        assert float(ms_ssim(x, x)) == pytest.approx(1.0, abs=1e-5)
        assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)

    def test_ordering(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 192, 224, 3))
        n1 = x + 0.01 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
        n2 = x + 0.1 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
        a, b = float(ms_ssim(n1, x)), float(ms_ssim(n2, x))
        assert 1.0 > a > b > 0.0

    def test_size_average_false_shape(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (3, 192, 224, 3))
        v = ms_ssim(x, x * 0.9, size_average=False)
        assert v.shape == (3,)


class TestStagedMetrics:
    """Staged-list psnr_fn/msssim_fn (reference utils.py:167-188, dead code
    there — kept for API parity): (batch, num_stage) broadcast semantics and
    the per-stage H<160 MS-SSIM guard."""

    def test_psnr_fn_stages(self):
        import numpy as np

        from neuroquant_tpu.metrics import psnr_fn

        k = jax.random.PRNGKey(0)
        outs = [jax.random.uniform(jax.random.fold_in(k, i), (2, 64, 64, 3))
                for i in range(3)]
        tgts = [o + 0.01 * (i + 1) for i, o in enumerate(outs)]
        v = psnr_fn(outs, tgts)
        assert v.shape == (2, 3)
        # rows identical (scalar per stage), stages ordered by noise level
        assert np.allclose(v[0], v[1])
        assert float(v[0, 0]) > float(v[0, 1]) > float(v[0, 2])
        expect = -10 * np.log10(np.mean((np.asarray(outs[0])
                                         - np.asarray(tgts[0])) ** 2) + 1e-9)
        assert float(v[0, 0]) == pytest.approx(float(expect), abs=1e-4)

    def test_msssim_fn_small_stage_guard(self):
        import numpy as np

        from neuroquant_tpu.metrics import msssim_fn

        k = jax.random.PRNGKey(1)
        small = jax.random.uniform(k, (2, 80, 96, 3))      # H < 160 -> 0
        big = jax.random.uniform(jax.random.fold_in(k, 1), (2, 192, 224, 3))
        v = msssim_fn([small, big], [small, big])
        assert v.shape == (2, 2)
        assert np.allclose(v[:, 0], 0.0)
        assert float(v[0, 1]) == pytest.approx(1.0, abs=1e-5)


class TestQuantMath:
    def test_round_ste_gradient(self):
        g = jax.grad(lambda x: Q.round_ste(x).sum())(jnp.asarray([0.3, 1.7]))
        np.testing.assert_allclose(np.asarray(g), [1.0, 1.0])

    def test_uaq_values(self):
        # 2-bit asym on [0, 3]: delta=1, zp=0 -> exact integers survive
        x = jnp.asarray([0.0, 0.9, 2.1, 3.0])
        delta, zp = Q._init_scale_flat(x, 2, "max", False)
        assert float(delta) == pytest.approx(1.0)
        assert float(zp) == 0.0
        xq = Q.uaq_fake_quant(x, delta, zp, 2)
        np.testing.assert_allclose(np.asarray(xq), [0.0, 1.0, 2.0, 3.0])

    def test_scale_init_channelwise_matches_per_channel(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 4, 6))
        d, z = Q.init_weight_scale(w, 4, True, "max")
        assert d.shape == (1, 1, 1, 6)
        for c in range(6):
            dc, zc = Q._init_scale_flat(w[..., c].reshape(-1), 4, "max", False)
            assert float(d[0, 0, 0, c]) == pytest.approx(float(dc), rel=1e-6)
            assert float(z[0, 0, 0, c]) == pytest.approx(float(zc), rel=1e-6)

    def test_mse_search_beats_or_ties_max_on_heavy_tail(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(np.concatenate([rng.randn(1000) * 0.01, [5.0]]), jnp.float32)
        dm, zm = Q._init_scale_flat(x, 4, "max", False)
        ds, zs = Q._init_scale_flat(x, 4, "mse", False)
        def err(d, z):
            return float(jnp.mean((x - Q.uaq_fake_quant(x, d, z, 4)) ** 2))
        assert err(ds, zs) <= err(dm, zm) + 1e-9

    def test_gaussian_uses_variance_quirk(self):
        # torch.var not std (quantizer.py:190): check range = mu +- 6*var
        x = jnp.asarray(np.random.RandomState(0).randn(4096).astype(np.float32) * 2)
        d, z = Q._init_scale_flat(x, 8, "gaussian", False)
        mu, var = float(x.mean()), float(x.var())
        lo, hi = min(mu - 6 * var, 0), max(mu + 6 * var, 0)
        assert float(d) == pytest.approx(max((hi - lo) / 255, 1e-8), rel=1e-5)

    def test_adaround_alpha_init_recovers_rest(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (64,))
        delta = jnp.asarray(0.1)
        alpha = Q.adaround_init_alpha(x, delta)
        rest = x / delta - jnp.floor(x / delta)
        np.testing.assert_allclose(np.asarray(Q.adaround_soft_targets(alpha)),
                                   np.asarray(rest), atol=5e-4)

    def test_adaround_hard_equals_nearest_after_init(self):
        # alpha init makes soft target == rest; hard rounding (alpha >= 0)
        # equals round-to-nearest when rest != 0.5 (zp=4 covers negatives)
        x = jnp.asarray([0.04, 0.26, -0.13, 0.09])
        delta, zp = jnp.asarray(0.1), jnp.asarray(4.0)
        alpha = Q.adaround_init_alpha(x, delta)
        got = Q.adaround_fake_quant(x, delta, zp, alpha, 8, soft=False)
        want = jnp.round(x / delta) * delta
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    def test_qat_modes(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (32,))
        y = Q.qat_fake_quant(x, 8, "ffnerv")
        assert y.shape == x.shape
        y2 = Q.qat_fake_quant(x, 8, "hinerv", training=False)
        assert float(jnp.abs(y2 - x).max()) < 0.1
        y3 = Q.qat_fake_quant(x, 8, "hinerv", rng=jax.random.PRNGKey(1),
                              training=True)
        assert y3.shape == x.shape
