"""Model primitives for the NeRV family, TPU-first (NHWC, Flax linen).

Re-designs the reference primitives (models/_layers.py) for XLA/TPU:
  * convs run in NHWC with HWIO kernels so XLA tiles them onto the MXU;
  * PixelShuffle is a reshape/transpose chain XLA fuses for free, with torch
    channel ordering so checkpoints can round-trip (ops/pixelshuffle.py);
  * weight init reproduces torch's Conv2d/Linear defaults (kaiming-uniform
    a=sqrt(5) -> U(-1/sqrt(fan_in), 1/sqrt(fan_in))) so FP32 overfitting
    trajectories are comparable with the reference logs.

Reference pointers: NeRVBlock _layers.py:20-36, KFc_bias :40-73,
PositionEncoding :77-85, activations :87-117, norms :120-130, ConvNeXt
:134-193, Block :197-232, LayerNorm :235-259.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from neuroquant_tpu.ops.pixelshuffle import pixel_shuffle


# --------------------------------------------------------------------------
# Initializers reproducing torch defaults.
# --------------------------------------------------------------------------
def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for HWIO kernels (torch Conv2d default)."""
    kh, kw, cin, _ = shape
    bound = 1.0 / math.sqrt(cin * kh * kw)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def trunc_normal_init(std: float = 0.02, lim: float = 2.0):
    """timm trunc_normal_: N(0, std) truncated to the absolute range [-lim, lim]."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.truncated_normal(key, -lim / std, lim / std, shape, dtype) * std
    return init


# --------------------------------------------------------------------------
# Conv / Linear with torch layout + init semantics.
# --------------------------------------------------------------------------
class Conv2d(nn.Module):
    """NHWC conv with HWIO kernel, symmetric padding, torch default init."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    feature_group_count: int = 1
    use_bias: bool = True
    kernel_init: Callable = torch_conv_kernel_init
    bias_init: Callable | None = None   # default: torch U(+-1/sqrt(fan_in))

    @nn.compact
    def __call__(self, x, pack_in: int = 1, in_perm=None,
                 return_params: bool = False):
        """pack_in > 1 evaluates the SAME conv on a space-to-depth packed
        input (ops/packed_decode.py) and returns the packed output — used by
        the decoder tail so the full-resolution head conv runs with MXU-wide
        channels. Requires odd kernel, stride 1, 'same' padding.
        return_params=True returns (kernel, bias) without computing — the
        fused Pallas tail (ops/tail_fused.py) collects raw conv params this
        way; `x` then only supplies the input channel count."""
        if pack_in > 1:
            cin = x.shape[-1] // (pack_in * pack_in)
        else:
            cin = x.shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init,
            (kh, kw, cin // self.feature_group_count, self.features))
        bias = None
        if self.use_bias:
            fan_in = (cin // self.feature_group_count) * kh * kw
            bias_init = self.bias_init or torch_bias_init(fan_in)
            bias = self.param("bias", bias_init, (self.features,))
        if return_params:
            return kernel, bias
        if pack_in > 1:
            from neuroquant_tpu.ops.packed_decode import packed_conv

            assert (self.strides == (1, 1) and kh == kw and kh % 2 == 1
                    and self.padding == ((kh - 1) // 2, (kw - 1) // 2)
                    and self.feature_group_count == 1), \
                "packed conv needs odd-k stride-1 same-pad dense conv"
            return packed_conv(x, kernel, bias, pack_in, in_perm=in_perm)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        ph, pw = self.padding
        y = jax.lax.conv_general_dilated(
            x, kernel, self.strides, [(ph, ph), (pw, pw)],
            dimension_numbers=dn, feature_group_count=self.feature_group_count)
        if bias is not None:
            y = y + bias
        return y


class Linear(nn.Module):
    """Dense with torch Linear default init (used inside ConvNeXt blocks)."""

    features: int
    kernel_init: Callable | None = None
    bias_init: Callable | None = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        bound = 1.0 / math.sqrt(cin)
        kinit = self.kernel_init or (
            lambda k, s, d=jnp.float32: jax.random.uniform(k, s, d, -bound, bound))
        binit = self.bias_init or (
            lambda k, s, d=jnp.float32: jax.random.uniform(k, s, d, -bound, bound))
        w = self.param("kernel", kinit, (cin, self.features))
        b = self.param("bias", binit, (self.features,))
        return x @ w + b


# --------------------------------------------------------------------------
# Activations / norms / output head.
# --------------------------------------------------------------------------
def activation(act_type: str) -> Callable:
    """Activation factory (_layers.py:95-117). 'sin' is fixed to an instance
    (the reference returns the class — a latent bug, _layers.py:107)."""
    table = {
        "relu": jax.nn.relu,
        "leaky": lambda x: jax.nn.leaky_relu(x, 0.01),
        "leaky01": lambda x: jax.nn.leaky_relu(x, 0.1),
        "relu6": jax.nn.relu6,
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "sin": jnp.sin,
        "swish": jax.nn.silu,
        "softplus": jax.nn.softplus,
        "hardswish": jax.nn.hard_swish,
    }
    if act_type not in table:
        raise KeyError(f"Unknown activation function {act_type}.")
    return table[act_type]


def out_img(x, out_bias="tanh"):
    """Output head bias (_layers.py:10-16)."""
    if out_bias == "sigmoid":
        return jax.nn.sigmoid(x)
    elif out_bias == "tanh":
        return jnp.tanh(x) * 0.5 + 0.5
    else:
        return x + float(out_bias)


class BatchNorm2d(nn.Module):
    """torch BatchNorm2d(track_running_stats=False): always batch statistics."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = x.mean(axis=(0, 1, 2))
        var = x.var(axis=(0, 1, 2))
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * scale + bias


class InstanceNorm2d(nn.Module):
    """torch InstanceNorm2d default: per-image-channel stats, no affine."""

    eps: float = 1e-5

    def __call__(self, x):
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


class LayerNorm(nn.Module):
    """Channel-axis layer norm. NHWC collapses the reference's channels_first/
    channels_last split (_layers.py:235-259) into one implementation."""

    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = x.mean(axis=-1, keepdims=True)
        var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.eps)
        return y * w + b


def norm_layer(norm_type: str, ch_width: int):
    if norm_type == "none":
        return lambda x: x
    elif norm_type == "batch":
        return BatchNorm2d(features=ch_width)
    elif norm_type == "instance":
        return InstanceNorm2d()
    raise NotImplementedError(norm_type)


# --------------------------------------------------------------------------
# NeRV decode block: conv -> pixel-shuffle -> norm -> act.
# --------------------------------------------------------------------------
class UpsampleConv(nn.Module):
    """Conv producing C_out*rh*rw channels + PixelShuffle(rh, rw), executed as
    ONE transposed conv (ops/fused_upsample.py) so no shuffle copies hit HBM.

    Parameter names/shapes are identical to Conv2d (kernel HWIO, bias), so
    quantization specs and torch checkpoints are unaffected; set fused=False
    for the literal conv + shuffle composition (same numerics to ~1e-5).
    """

    out_channel: int            # channels AFTER the shuffle
    kernel_size: Tuple[int, int]
    r: Tuple[int, int]          # (rh, rw) shuffle factors
    use_bias: bool = True
    fused: str | bool = "perm"  # 'perm' | 'dilated' | False (naive)

    @nn.compact
    def __call__(self, x, pack_in: int = 1, absorb: bool = False,
                 in_perm=None, return_params: bool = False):
        """absorb=True runs the conv on `pack_in`-packed input and absorbs
        the PixelShuffle into the packing (no layout op at all); returns
        (packed output, its group permutation) with the new pack factor
        pack_in * r (ops/packed_decode.py). return_params=True returns the
        raw (kernel, bias) instead of computing (fused Pallas tail)."""
        from neuroquant_tpu.ops.fused_upsample import (
            conv_pixel_shuffle, conv_pixel_shuffle_perm,
        )

        cin = x.shape[-1] // (pack_in * pack_in)
        kh, kw = self.kernel_size
        rh, rw = self.r
        features = self.out_channel * rh * rw
        kernel = self.param("kernel", torch_conv_kernel_init,
                            (kh, kw, cin, features))
        bias = None
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(cin * kh * kw),
                              (features,))
        if return_params:
            return kernel, bias
        if absorb:
            from neuroquant_tpu.ops.packed_decode import upsample_conv_packed

            assert kh == kw and kh % 2 == 1 and rh == rw
            return upsample_conv_packed(x, kernel, bias, pack_in,
                                        (rh, rw), in_perm=in_perm)
        assert pack_in == 1, "pack_in > 1 requires absorb=True"
        if self.fused == "perm":
            return conv_pixel_shuffle_perm(x, kernel, bias, (rh, rw))
        if self.fused == "dilated" or self.fused is True:
            return conv_pixel_shuffle(x, kernel, bias, (rh, rw))
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        p = ((kh - 1) // 2, (kw - 1) // 2)
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(p[0], p[0]), (p[1], p[1])],
            dimension_numbers=dn)
        if bias is not None:
            y = y + bias
        return pixel_shuffle(y, (rh, rw))


class NeRVBlock(nn.Module):
    """Conv2d(in, out*stride^2, k, pad=(k-1)//2) -> PixelShuffle(stride) ->
    norm -> act (_layers.py:20-36). The conv is the quantization target; the
    conv+shuffle pair runs as one fused transposed conv on TPU."""

    out_channel: int
    kernel_size: int
    stride: int
    norm: str = "none"
    act: str = "gelu"
    use_bias: bool = True
    fused: str | bool = "perm"

    def setup(self):
        k = self.kernel_size
        self.conv = UpsampleConv(
            out_channel=self.out_channel, kernel_size=(k, k),
            r=(self.stride, self.stride), use_bias=self.use_bias,
            fused=self.fused)
        self.norm_fn = norm_layer(self.norm, self.out_channel)
        self.act_fn = activation(self.act)

    def __call__(self, x, pack_in: int = 1, absorb: bool = False,
                 in_perm=None):
        if absorb:
            # packed tail: the shuffle is absorbed into the pack factor; norm
            # layers need spatial statistics, so only 'none' is packable
            # (every shipped config uses dec_norm: none)
            assert self.norm == "none", \
                "packed tail requires dec_norm == 'none'"
            y, perm = self.conv(x, pack_in=pack_in, absorb=True,
                                in_perm=in_perm)
            return self.act_fn(y), perm
        x = self.conv(x)
        x = self.norm_fn(x)
        return self.act_fn(x)


# minimum last-prefix-block grid (positions) for the fused execution: tiny
# grids are cheaper as XLA convs (per-pallas_call overhead dominates).
# Tests lower this to exercise the path on small fixtures.
PREFIX_MIN_GRID = 1024


def run_prefix_blocks(blocks, t: int, x, impl, *, fused_prefix: str,
                      dec_norm: str, crop_h: int, crop_w: int,
                      dec_strides, chans, dec_in_channel: int):
    """Run the decode prefix blocks[:t] on NHWC x. On the Pallas impls the
    LAST prefix block — the only one with real FLOPs (~95%,
    scripts/prefix_probe.py) — executes through a 1-layer channels-first
    plan (ops/tail_fused.run_fused_prefix_block): Pallas fwd/dx/dW kernels
    + custom VJP replace its XLA conv, and the PixelShuffle becomes one
    relabel of the conv's CF output. Gated on feasibility and a minimum
    grid size (tiny grids are cheaper in XLA)."""
    from neuroquant_tpu.ops.tail_fused import (
        prefix_block_feasible, prefix_cf_to_nhwc, run_fused_prefix_block)

    last = t - 1
    maybe_fused = (str(fused_prefix) != "off" and last >= 0
                   and impl in ("pallas", "pallas_hvp")
                   and dec_norm == "none"
                   and blocks[last].kernel_size % 2 == 1)
    for j in range(last if maybe_fused else t):
        x = blocks[j](x)
    if maybe_fused:
        # gate feasibility on the ACTUAL prefix activation shape — deriving
        # the grid from crop_h // prod(strides) diverges from x.shape when
        # the crop is not an exact stride multiple, and the plan built by
        # run_fused_prefix_block (from x.shape) could then be infeasible,
        # turning the intended XLA fallback into a trace-time error
        # (round-4 ADVICE item 2)
        blk = blocks[last]
        hc, wc, cin = x.shape[1], x.shape[2], x.shape[-1]
        if (hc * wc >= PREFIX_MIN_GRID and prefix_block_feasible(
                hc, wc, blk.kernel_size, cin,
                chans[last] * blk.stride ** 2)):
            kern, bias = blk.conv(x, return_params=True)
            z, pplan = run_fused_prefix_block(x, kern, bias, blk.stride,
                                              blk.out_channel, impl=impl)
            x = blk.act_fn(prefix_cf_to_nhwc(z, pplan, blk.stride,
                                             blk.out_channel))
        else:
            x = blk(x)
    return x


def collect_tail_params(blocks, head_layer, pack_start: int, chans, x):
    """Gather the raw (kernel, bias) conv params of the decoder tail blocks
    (from pack_start) + head for the fused Pallas tail (ops/tail_fused.py).
    Must be called from within a bound module context; the dummy inputs only
    supply channel counts (flax params are created/shared by name)."""
    out = []
    for j in range(pack_start, len(blocks)):
        blk = blocks[j]
        cin = x.shape[-1] if j == pack_start else chans[j - 1]
        k, b = blk.conv(jnp.zeros((1, 1, 1, cin)), return_params=True)
        out.append((k, b, blk.stride))
    kh, bh = head_layer(jnp.zeros((1, 1, 1, chans[-1])), return_params=True)
    return out, (kh, bh)


# --------------------------------------------------------------------------
# Position encoding (NeRV index embedding).
# --------------------------------------------------------------------------
class PositionEncoding(nn.Module):
    """[sin, cos](pos * base**arange(level) * pi) -> (B, 1, 1, 2*level)
    (_layers.py:77-85, NHWC).

    With n_frames > 0 (pos known to lie on the grid idx/n_frames, the only
    case the pipeline ever evaluates), the encoding is a (n_frames, 2*level)
    table precomputed at trace time with EXACT reference semantics: bases
    float32 (`base ** torch.arange(level) * pi`, _layers.py:80), positions
    float64 (python-float norm_idx collates to float64), product and sin in
    float64, cast to float32 (the `.float()` at models/NeRV.py:42). This
    matches torch bit-for-bit — required for cross-loading reference-trained
    NeRV checkpoints — and sidesteps the TPU's fp32 sin, whose argument
    reduction breaks down at base**79 * pi ~ 1.4e8 (hardware-dependent noise
    features). The table is 2*level*n_frames floats (~84 KB for Bunny).

    Without n_frames the plain fp32 path runs on device (arbitrary pos).
    """

    base: float
    level: int
    n_frames: int = 0

    def __call__(self, pos):
        pos = jnp.asarray(pos, jnp.float32).reshape(-1, 1)      # (B, 1)
        if self.n_frames > 0:
            table = jnp.asarray(self._reference_table())
            idx = jnp.clip(jnp.round(pos[:, 0] * self.n_frames).astype(jnp.int32),
                           0, self.n_frames - 1)
            pe = table[idx]
            return pe.reshape(pos.shape[0], 1, 1, -1)
        bases = (self.base ** jnp.arange(self.level, dtype=jnp.float32)
                 * jnp.pi)
        v = pos * bases                                         # (B, level)
        pe = jnp.concatenate([jnp.sin(v), jnp.cos(v)], axis=-1)
        return pe.reshape(pos.shape[0], 1, 1, -1)

    def _reference_table(self):
        import math

        import numpy as np
        import torch

        bases = ((self.base ** torch.arange(self.level)) * math.pi).double()
        pos = (torch.arange(self.n_frames, dtype=torch.float64)[:, None]
               / self.n_frames)
        v = pos * bases
        return torch.cat([torch.sin(v), torch.cos(v)], dim=-1).float().numpy()


# --------------------------------------------------------------------------
# ConvNeXt encoder (HNeRV content encoder).
# --------------------------------------------------------------------------
class ConvNeXtBlock(nn.Module):
    """dwconv7x7 -> LN -> Linear 4x -> GELU -> Linear -> gamma scale + residual
    (_layers.py:197-232). NHWC throughout, so no permutes are needed.
    drop_path is identity at the shipped rate of 0."""

    dim: int
    layer_scale_init_value: float = 1e-6

    @nn.compact
    def __call__(self, x):
        inp = x
        x = Conv2d(features=self.dim, kernel_size=(7, 7), padding=(3, 3),
                   feature_group_count=self.dim,
                   kernel_init=trunc_normal_init(0.02),
                   bias_init=nn.initializers.zeros, name="dwconv")(x)
        x = LayerNorm(self.dim, eps=1e-6, name="norm")(x)
        x = Linear(4 * self.dim, kernel_init=trunc_normal_init(0.02),
                   bias_init=nn.initializers.zeros, name="pwconv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = Linear(self.dim, kernel_init=trunc_normal_init(0.02),
                   bias_init=nn.initializers.zeros, name="pwconv2")(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                lambda k, s: jnp.full(s, self.layer_scale_init_value, jnp.float32),
                (self.dim,))
            x = gamma * x
        return inp + x


class ConvNeXt(nn.Module):
    """Stage pyramid: (downsample conv + LN) then stage_blocks x ConvNeXtBlock;
    returns the last stage (_layers.py:134-193)."""

    stage_blocks: int = 0
    strds: Sequence[int] = (2, 2, 2, 2)
    dims: Sequence[int] = (96, 192, 384, 768)
    layer_scale_init_value: float = 1e-6

    @nn.compact
    def __call__(self, x):
        for i, (s, d) in enumerate(zip(self.strds, self.dims)):
            if i > 0:
                x = LayerNorm(self.dims[i - 1], eps=1e-6, name=f"down_norm_{i}")(x)
                x = Conv2d(features=d, kernel_size=(s, s), strides=(s, s),
                           kernel_init=trunc_normal_init(0.02),
                           bias_init=nn.initializers.zeros,
                           name=f"down_conv_{i}")(x)
            else:
                x = Conv2d(features=d, kernel_size=(s, s), strides=(s, s),
                           kernel_init=trunc_normal_init(0.02),
                           bias_init=nn.initializers.zeros,
                           name=f"down_conv_{i}")(x)
                x = LayerNorm(d, eps=1e-6, name=f"down_norm_{i}")(x)
            for j in range(self.stage_blocks):
                x = ConvNeXtBlock(
                    dim=d, layer_scale_init_value=self.layer_scale_init_value,
                    name=f"stage_{i}_block_{j}")(x)
        return x


# --------------------------------------------------------------------------
# PNeRV Kronecker fully-connected upsampler.
# --------------------------------------------------------------------------
class KFcBias(nn.Module):
    """w_L @ x @ w_R + rank-1 bias (b_c x b_h x b_w) (_layers.py:40-73).

    Operates on NHWC input (B, in_h, in_w, C) by moving channels up front
    for the per-channel matmuls; parameters follow the reference shapes
    (in_b=1): w_L (1, C, out_h, in_h), w_R (1, C, in_w, out_w).
    """

    in_height: int
    in_width: int
    out_height: int
    out_width: int
    channels: int

    @nn.compact
    def __call__(self, x):
        c, ih, iw = self.channels, self.in_height, self.in_width
        oh, ow = self.out_height, self.out_width

        def kaiming_fan_out(key, shape, dtype=jnp.float32):
            # kaiming_normal_(mode='fan_out', relu): std = sqrt(2 / fan_out).
            # torch's _calculate_fan_in_and_fan_out on the pre-repeat (c, m, n)
            # tensor (_layers.py:51-53): num_output_fmaps = dim0 = c,
            # receptive_field = prod(shape[2:]) = n, so fan_out = c * n.
            # Our params carry a leading in_b axis: shape = (in_b, c, m, n).
            fan_out = shape[1] * shape[-1]
            return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / fan_out)

        w_l = self.param("w_L", kaiming_fan_out, (1, c, oh, ih))
        w_r = self.param("w_R", kaiming_fan_out, (1, c, iw, ow))
        b_h = self.param("b_h", nn.initializers.zeros, (oh, 1))
        b_w = self.param("b_w", nn.initializers.zeros, (1, ow))
        b_c = self.param("b_c", nn.initializers.zeros, (c, 1))

        b = (b_c @ (b_h @ b_w).reshape(1, oh * ow)).reshape(c, oh, ow)

        x = x.transpose(0, 3, 1, 2)                     # (B, C, ih, iw)
        y = jnp.einsum("coh,bchw->bcow", w_l[0], x)     # (B, C, oh, iw)
        y = jnp.einsum("bcow,cwq->bcoq", y, w_r[0])     # (B, C, oh, ow)
        y = y + b[None]
        return y.transpose(0, 2, 3, 1)                  # (B, oh, ow, C)
