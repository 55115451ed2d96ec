"""Model semantics tests: conv parity vs torch, param counts vs reference
logs, checkpoint round-trips, and decode shape/structure checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuroquant_tpu.models import (
    build_model, example_input, param_counts, quant_layer_paths,
)
from neuroquant_tpu.models.layers import Conv2d, LayerNorm, activation
from neuroquant_tpu.utils.torch_compat import (
    params_to_state_dict, state_dict_to_params,
)


class TestConvParity:
    def test_conv_matches_torch(self):
        import torch
        import torch.nn.functional as F
        rng = np.random.RandomState(0)
        x = rng.randn(2, 9, 11, 5).astype(np.float32)
        conv = Conv2d(features=7, kernel_size=(3, 3), padding=(1, 1))
        params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = np.asarray(conv.apply(params, jnp.asarray(x)))

        w = np.transpose(np.asarray(params["params"]["kernel"]), (3, 2, 0, 1))
        b = np.asarray(params["params"]["bias"])
        want = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                        torch.from_numpy(w), torch.from_numpy(b), padding=1)
        want = want.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_strided_even_kernel_matches_torch(self):
        import torch
        import torch.nn.functional as F
        # ConvNeXt downsample: kernel=stride, no padding
        rng = np.random.RandomState(1)
        x = rng.randn(1, 12, 16, 3).astype(np.float32)
        conv = Conv2d(features=4, kernel_size=(4, 4), strides=(4, 4))
        params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = np.asarray(conv.apply(params, jnp.asarray(x)))
        w = np.transpose(np.asarray(params["params"]["kernel"]), (3, 2, 0, 1))
        b = np.asarray(params["params"]["bias"])
        want = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                        torch.from_numpy(w), torch.from_numpy(b), stride=4)
        np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(), atol=2e-5)

    def test_gelu_matches_torch_exact(self):
        import torch
        x = np.linspace(-3, 3, 17, dtype=np.float32)
        got = np.asarray(activation("gelu")(jnp.asarray(x)))
        want = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_layernorm_matches_torch(self):
        import torch
        x = np.random.RandomState(0).randn(2, 3, 4, 8).astype(np.float32)
        ln = LayerNorm(8, eps=1e-6)
        params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = np.asarray(ln.apply(params, jnp.asarray(x)))
        want = torch.nn.functional.layer_norm(
            torch.from_numpy(x), (8,), eps=1e-6).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestParamCounts:
    """Parameter counts must reproduce the reference run-dir names
    (results/HNeRV_Bunny_1280x640/.../Encoder_0.31M_Decoder_2.65M_Total_2.66M)."""

    def test_hnerv_bunny_3m(self):
        cfg = dict(crop_h=640, crop_w=1280, stage_block=1,
                   enc_strides=[5, 4, 4, 2, 2], enc_channel=[64, 64, 64, 64, 16],
                   channel_reduce=1.2, channel_lbound=12, dec_in_channel=92,
                   dec_kernels=[1, 3, 5, 5, 5], dec_strides=[5, 4, 4, 2, 2],
                   dec_norm="none", dec_acts="gelu", out_bias="tanh")
        m = build_model("hnerv", cfg)
        # shape-only init: use eval_shape to avoid a full-res forward
        params = jax.eval_shape(
            lambda r: m.init(r, jnp.zeros((1, 640, 1280, 3))),
            jax.random.PRNGKey(0))
        enc, dec, tot = param_counts("hnerv", cfg, params, 640 * 1280, 132)
        assert (round(enc, 2), round(dec, 2), round(tot, 2)) == (0.31, 2.65, 2.66)

    def test_nerv_bunny_3m(self):
        cfg = dict(crop_h=640, crop_w=1280, base=1.25, level=80,
                   channel_reduce=2, channel_lbound=24, dec_in_channel=145,
                   dec_kernels=[3, 3, 3, 3, 3], dec_strides=[5, 4, 4, 2, 2],
                   dec_norm="none", dec_acts="gelu", out_bias="tanh")
        m = build_model("nerv", cfg)
        params = jax.eval_shape(
            lambda r: m.init(r, jnp.zeros((1,))), jax.random.PRNGKey(0))
        _, dec, tot = param_counts("nerv", cfg, params, 640 * 1280, 132)
        assert (round(dec, 2), round(tot, 2)) == (3.08, 3.08)


class TestModels:
    def test_hnerv_decode_shapes(self, tiny_hnerv_cfg):
        m = build_model("hnerv", tiny_hnerv_cfg)
        x = example_input("hnerv", tiny_hnerv_cfg, 2)
        params = m.init(jax.random.PRNGKey(0), x)
        emb = m.apply(params, x, method="encode")
        assert emb.shape == (2, 1, 2, 8)
        out, embeds = m.apply(params, emb, method="decode", return_embeds=True)
        assert out.shape == (2, 80, 160, 3)
        assert len(embeds) == 2 + len(tiny_hnerv_cfg["dec_strides"])
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_nerv_decode_shapes(self, tiny_nerv_cfg):
        m = build_model("nerv", tiny_nerv_cfg)
        x = example_input("nerv", tiny_nerv_cfg, 3)
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.shape == (3, 80, 160, 3)

    def test_pnerv_variants(self, tiny_pnerv_cfg):
        for arch in ("pnerv", "pnerv2"):
            m = build_model(arch, tiny_pnerv_cfg)
            x = example_input(arch, tiny_pnerv_cfg, 1)
            params = m.init(jax.random.PRNGKey(0), x)
            out = m.apply(params, x)
            assert out.shape == (1, 80, 160, 3), arch

    def test_quant_paths_exist(self, tiny_hnerv_cfg, tiny_pnerv_cfg):
        for arch, cfg in (("hnerv", tiny_hnerv_cfg), ("pnerv", tiny_pnerv_cfg)):
            m = build_model(arch, cfg)
            params = m.init(jax.random.PRNGKey(0), example_input(arch, cfg, 1))
            p = params["params"]
            for path in quant_layer_paths(arch, cfg):
                node = p
                for k in path:
                    assert k in node, (arch, path, list(node))
                    node = node[k]
                assert "kernel" in node and "bias" in node


class TestTorchCompat:
    def test_state_dict_roundtrip(self, tiny_hnerv_cfg):
        m = build_model("hnerv", tiny_hnerv_cfg)
        x = example_input("hnerv", tiny_hnerv_cfg, 1)
        params = m.init(jax.random.PRNGKey(0), x)
        sd = params_to_state_dict("hnerv", params)
        # expected reference key layout
        assert "decoder.0.weight" in sd and "head_layer.bias" in sd
        assert "decoder.1.conv.0.weight" in sd
        assert "encoder.downsample_layers.0.0.weight" in sd
        assert "encoder.stages.0.0.dwconv.weight" in sd
        assert sd["decoder.0.weight"].shape[2:] == (1, 1)  # OIHW

        # perturb -> restore must reproduce identical outputs
        params2 = jax.tree_util.tree_map(lambda a: a * 0.0, params)
        params3 = state_dict_to_params("hnerv", sd, params2)
        out1 = m.apply(params, x)
        out3 = m.apply(params3, x)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out3), atol=1e-6)

    def test_pth_file_roundtrip(self, tiny_hnerv_cfg, tmp_path):
        from neuroquant_tpu.utils.torch_compat import load_pth, save_pth
        m = build_model("hnerv", tiny_hnerv_cfg)
        x = example_input("hnerv", tiny_hnerv_cfg, 1)
        params = m.init(jax.random.PRNGKey(0), x)
        path = str(tmp_path / "ckpt.pth")
        save_pth(path, "hnerv", params)
        # load into fresh params
        params2 = m.init(jax.random.PRNGKey(7), x)
        params2 = load_pth(path, "hnerv", params2)
        np.testing.assert_allclose(np.asarray(m.apply(params, x)),
                                   np.asarray(m.apply(params2, x)), atol=1e-6)


class TestPositionEncoding:
    """The NeRV index embedding (layers.py PositionEncoding; reference
    _layers.py:77-85). base**79 * pi ~ 1.4e8 is beyond fp32 sin
    argument-reduction range on TPU, so the grid path (n_frames>0)
    precomputes the table with the reference's exact torch semantics."""

    def test_grid_matches_torch_reference(self):
        import math
        import torch
        from neuroquant_tpu.models.layers import PositionEncoding
        base, level, n = 1.25, 80, 132
        pe = PositionEncoding(base=base, level=level, n_frames=n)
        idx = np.arange(n)
        pos = jnp.asarray(idx / n, jnp.float32)
        got = np.asarray(pe.apply({}, pos)).reshape(n, 2 * level)

        # the reference pipeline: float32 bases, float64 norm_idx (python
        # floats collate to float64), float64 sin, .float() cast
        bases = ((base ** torch.arange(level)) * math.pi).double()
        v = torch.tensor(idx / n, dtype=torch.float64)[:, None] * bases
        want = torch.cat([torch.sin(v), torch.cos(v)], -1).float().numpy()
        np.testing.assert_allclose(got, want, atol=1e-7)

    def test_grid_and_plain_paths_agree_at_low_levels(self):
        # where fp32 sin is accurate the two paths must be the same encoding
        from neuroquant_tpu.models.layers import PositionEncoding
        base, level, n = 1.25, 10, 132
        pos = jnp.asarray(np.arange(n) / n, jnp.float32)
        a = PositionEncoding(base=base, level=level, n_frames=n).apply({}, pos)
        b = PositionEncoding(base=base, level=level).apply({}, pos)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestNormLayers:
    """BatchNorm2d(track_running_stats=False) / InstanceNorm2d parity vs
    torch (_layers.py:120-130). Configs ship dec_norm: none, but the layer
    zoo is part of the model surface."""

    def test_batchnorm_matches_torch(self):
        import torch
        from neuroquant_tpu.models.layers import BatchNorm2d
        rng = np.random.RandomState(3)
        x = rng.randn(4, 5, 6, 7).astype(np.float32)
        m = BatchNorm2d(features=7)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = np.asarray(m.apply(params, jnp.asarray(x)))

        tm = torch.nn.BatchNorm2d(7, track_running_stats=False)
        tm.train()                       # batch stats, as the reference uses it
        want = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
        want = want.permute(0, 2, 3, 1).detach().numpy()
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_instancenorm_matches_torch(self):
        import torch
        from neuroquant_tpu.models.layers import InstanceNorm2d
        rng = np.random.RandomState(4)
        x = rng.randn(3, 5, 6, 4).astype(np.float32)
        got = np.asarray(InstanceNorm2d().apply({}, jnp.asarray(x)))
        want = torch.nn.InstanceNorm2d(4)(torch.from_numpy(x).permute(0, 3, 1, 2))
        want = want.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, atol=2e-5)
