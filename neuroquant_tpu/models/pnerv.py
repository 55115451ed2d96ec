"""PNeRV: pyramid NeRV with Kronecker-FC shortcuts and gated BSM fusion.

TPU-native re-design of models/PNeRV.py:11-188. `PNeRV` is exported as an
alias of `PNeRV1`, fixing the reference's dead `from models import PNeRV`
(models/__init__.py:3 exports PNeRV1/PNeRV2 while methods/regress.py:21
imports PNeRV — an ImportError at the reference commit).

The reference ships no PNeRV config; configs/PNeRV/Bunny_1280x640_3M.yaml in
this repo supplies the required keys (emd_channel, kfc_h_w_c, kfc_strides —
models/PNeRV.py:17,33-34,47).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from neuroquant_tpu.models.layers import (
    BatchNorm2d, Conv2d, ConvNeXtBlock, KFcBias, LayerNorm, NeRVBlock,
    activation, trunc_normal_init,
)


@dataclasses.dataclass(frozen=True)
class PNeRVConfig:
    crop_h: int
    crop_w: int
    enc_channel: int          # single width, unlike HNeRV's per-stage list
    emd_channel: int
    enc_strides: Tuple[int, ...]
    kfc_h_w_c: Tuple[int, int, int]
    kfc_strides: Tuple[int, ...]
    dec_norm: str
    dec_acts: str
    packed_tail: str = "auto"   # 'auto' | 'off' (post-fusion tail packing)
    fused_tail: str = "auto"    # 'auto' | 'pallas' | 'jnp' | 'off'
    # BSM fusion-stage compute dtype: 'bfloat16' halves the HBM traffic of
    # the gate chain at (320, 640, 100) — measured 3.8 -> 2.4 ms/frame
    # (scripts/pnerv_gate_probe.py); the convs keep fp32 accumulation on
    # the MXU either way. 'float32' preserves bit-level r4 numerics.
    bsm_dtype: str = "float32"

    @classmethod
    def from_cfg(cls, cfg: dict) -> "PNeRVConfig":
        return cls(
            crop_h=cfg["crop_h"], crop_w=cfg["crop_w"],
            enc_channel=int(cfg["enc_channel"]),
            emd_channel=int(cfg["emd_channel"]),
            enc_strides=tuple(cfg["enc_strides"]),
            kfc_h_w_c=tuple(cfg["kfc_h_w_c"]),
            kfc_strides=tuple(cfg["kfc_strides"]),
            dec_norm=cfg["dec_norm"], dec_acts=cfg["dec_acts"],
            packed_tail=str(cfg.get("packed_tail", "auto")),
            fused_tail=str(cfg.get("fused_tail", "auto")),
            bsm_dtype=str(cfg.get("bsm_dtype", "float32")),
        )

    @property
    def embed_hw(self) -> Tuple[int, int]:
        s = int(np.prod(self.enc_strides))
        return self.crop_h // s, self.crop_w // s


def pnerv_tail_packed(c: PNeRVConfig) -> bool:
    """Whether PNeRV's post-fusion tail (last NeRVBlock + head) runs
    space-to-depth packed.

    The BSM gates inject KFc shortcut tensors at every intermediate
    resolution, so the FUSED blocks stay unpacked — but the segment after
    the last fusion (the final k=3 upsample block + the 3x3 head, ~75% of
    decode FLOPs at the two highest resolutions) is a pure conv chain:
    exactly the packed-tail pattern (ops/packed_decode.py). Reuses the MXU
    padded-cost model on that one-block segment; 'off' forces the literal
    composition (models/PNeRV.py:92-96)."""
    if c.dec_acts != "gelu" or c.dec_norm != "none":
        return False
    if str(c.packed_tail).lower() in ("off", "false", "none"):
        return False
    from neuroquant_tpu.ops.packed_decode import plan_packed_tail
    from neuroquant_tpu.ops.tail_fused import resolve_impl

    ngf = int(c.kfc_h_w_c[2])
    r = int(c.kfc_strides[-1])
    if r <= 1:
        return False
    # with the fused Pallas tail available, break XLA-cost ties toward
    # packing (the Bunny config ties exactly: 204800*4*9 == 819200*1*9)
    t = plan_packed_tail([3], [r], [ngf], [ngf], c.crop_h, c.crop_w,
                         prefer_packed=resolve_impl(c.fused_tail) is not None)
    return t == 0


class _PNeRVEncoder(nn.Module):
    """Per-stride (conv k=s,s -> LN -> ConvNeXt block), then 1x1 to emd_channel
    (models/PNeRV.py:20-26)."""

    cfg: PNeRVConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        for k, s in enumerate(c.enc_strides):
            x = Conv2d(features=c.enc_channel, kernel_size=(s, s), strides=(s, s),
                       name=f"conv_{k}")(x)
            x = LayerNorm(c.enc_channel, eps=1e-6, name=f"norm_{k}")(x)
            x = ConvNeXtBlock(dim=c.enc_channel, name=f"block_{k}")(x)
        x = Conv2d(features=c.emd_channel, kernel_size=(1, 1), name="proj")(x)
        return x


class PNeRV1(nn.Module):
    """PNeRV with KFc pyramid shortcuts + BSM gated fusion
    (models/PNeRV.py:11-105).

    The BSM gates fuse each block's output with KFc shortcut tensors at
    every intermediate resolution, so the FUSED blocks run unpacked — but
    the post-fusion segment (last NeRVBlock + head, the two most expensive
    layers) is a pure conv chain and runs space-to-depth packed / as the
    fused Pallas tail (pnerv_tail_packed; ops/packed_decode.py,
    ops/tail_fused.py). The reference publishes no PNeRV perf baseline.
    """

    cfg: PNeRVConfig

    def setup(self):
        c = self.cfg
        d = c.emd_channel
        self.encoder = _PNeRVEncoder(cfg=c)

        in_h, in_w = c.embed_hw
        # excitation block: 1x1 conv + pixel-shuffle x10 (models/PNeRV.py:39)
        self.dec_exc = NeRVBlock(out_channel=d, kernel_size=1, stride=10,
                                 norm=c.dec_norm, act=c.dec_acts)

        new_ngf = c.kfc_h_w_c[2]
        new_h, new_w = c.kfc_h_w_c[0], c.kfc_h_w_c[1]
        dec_layers, shortcuts, bsm_z, bsm_r, bsm_h = [], [], [], [], []
        for i, stride in enumerate(c.kfc_strides):
            new_h, new_w = new_h * stride, new_w * stride
            if i != len(c.kfc_strides) - 1:
                shortcuts.append(KFcBias(in_height=in_h, in_width=in_w,
                                         out_height=new_h, out_width=new_w,
                                         channels=d))
                bsm_z.append(Conv2d(features=new_ngf, kernel_size=(3, 3),
                                    padding=(1, 1)))
                bsm_r.append(Conv2d(features=new_ngf, kernel_size=(3, 3),
                                    padding=(1, 1)))
                bsm_h.append(Conv2d(features=new_ngf, kernel_size=(3, 3),
                                    padding=(1, 1)))
            dec_layers.append(NeRVBlock(out_channel=new_ngf, kernel_size=3,
                                        stride=stride, norm=c.dec_norm,
                                        act=c.dec_acts))
        self.dec_layers = dec_layers
        self.shortcuts = shortcuts
        self.shortcut_norms = [BatchNorm2d(features=d)
                               for _ in range(len(shortcuts))]
        self.bsm_z, self.bsm_r, self.bsm_h = bsm_z, bsm_r, bsm_h
        self.head_layer = Conv2d(features=3, kernel_size=(3, 3), padding=(1, 1))
        self.act_fn = activation(c.dec_acts)
        self.tail_packed = pnerv_tail_packed(c)

    def encode(self, img):
        return self.encoder(img)

    def _fuse(self, content, x, i):
        """One BSM fusion stage (models/PNeRV.py:80-90). The gate uses the
        lerp form memory_r + att*(x - memory_r) == att*x + (1-att)*memory_r
        (one fewer full-tensor pass; the chain is HBM-bound at
        (320, 640, 100) — scripts/pnerv_gate_probe.py). cfg.bsm_dtype
        'bfloat16' runs the whole stage in bf16 (result cast back)."""
        pym = self.shortcuts[i](content)
        pym = self.shortcut_norms[i](pym)
        pym = self.act_fn(pym)
        x = self.dec_layers[i](x)
        dt = x.dtype
        if self.cfg.bsm_dtype == "bfloat16":
            # fp32 flax params would promote bf16 inputs back — run the
            # three 3x3 convs explicitly on bf16 operands
            def c3(conv, t):
                k, b = conv(t, return_params=True)
                dn = jax.lax.conv_dimension_numbers(
                    t.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
                return jax.lax.conv_general_dilated(
                    t, k.astype(t.dtype), (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=dn) + b.astype(t.dtype)

            x16 = x.astype(jnp.bfloat16)
            pym16 = pym.astype(jnp.bfloat16)
            memory_z = c3(self.bsm_z[i], x16)
            memory_r = c3(self.bsm_r[i], pym16)
            memory = jax.nn.relu(memory_z + memory_r)
            att = jax.nn.sigmoid(c3(self.bsm_h[i], memory))
            return (memory_r + att * (x16 - memory_r)).astype(dt)
        memory_z = self.bsm_z[i](x)
        memory_r = self.bsm_r[i](pym)
        memory = jax.nn.relu(memory_z + memory_r)
        att = jax.nn.sigmoid(self.bsm_h[i](memory))
        return memory_r + att * (x - memory_r)

    def _tail(self, x):
        """Post-fusion tail (last block + head + sigmoid), packed."""
        return _packed_tail(self, x)

    def decode_cf(self, content):
        """Decode to the packed channels-first head output (B, ch8, Mp) with
        the sigmoid applied — the packed-domain calibration loss target
        (see models/hnerv.py decode_cf)."""
        x = self.dec_exc(content)
        for i in range(len(self.shortcuts)):
            x = self._fuse(content, x, i)
        return _packed_tail_cf(self, x)

    def decode(self, content, return_embeds: bool = False):
        embeds = [content]
        x = self.dec_exc(content)
        n_fused = len(self.shortcuts)
        for i in range(n_fused):
            x = self._fuse(content, x, i)
            embeds.append(x)
        if not return_embeds and self.tail_packed:
            return self._tail(x)
        x = self.dec_layers[n_fused](x)
        x = self.head_layer(x)
        img = jax.nn.sigmoid(x)
        if return_embeds:
            return img, embeds
        return img

    def __call__(self, img):
        return self.decode(self.encode(img))


def _tail_params(m, x):
    from neuroquant_tpu.models.layers import collect_tail_params

    c = m.cfg
    chans = [int(c.kfc_h_w_c[2])] * len(c.kfc_strides)
    n_fused = len(c.kfc_strides) - 1
    return collect_tail_params(m.dec_layers, m.head_layer, n_fused, chans, x)


def _gated_impl(m):
    """resolve_impl with the VMEM-feasibility demotion (gate_fused_impl):
    an infeasible one-block plan decodes through the XLA packed path
    instead of silently dropping to the jnp CF twin (same fix as
    hnerv/nerv._fused_impl)."""
    from neuroquant_tpu.ops.packed_decode import gate_fused_impl
    from neuroquant_tpu.ops.tail_fused import resolve_impl

    c = m.cfg
    ngf, r = int(c.kfc_h_w_c[2]), int(c.kfc_strides[-1])
    return gate_fused_impl(resolve_impl(c.fused_tail), 0, [3], [r], [ngf],
                           [ngf], c.crop_h, c.crop_w)


def _packed_tail(m, x):
    """Run the post-fusion tail packed: fused Pallas/jnp kernels when the
    activation chain allows, else packed XLA convs (models/hnerv.py:138-165
    twin)."""
    from neuroquant_tpu.ops.packed_decode import depth_to_space
    from neuroquant_tpu.ops.tail_fused import resolve_impl, run_fused_tail_frames

    n_fused = len(m.cfg.kfc_strides) - 1
    impl = _gated_impl(m)
    if impl is not None:
        blocks, head = _tail_params(m, x)
        return run_fused_tail_frames(x, blocks, head, "sigmoid", impl=impl)
    x, perm = m.dec_layers[n_fused](x, pack_in=1, absorb=True)
    f = m.dec_layers[n_fused].stride
    x = m.head_layer(x, pack_in=f, in_perm=perm)
    return depth_to_space(jax.nn.sigmoid(x), f)


def _packed_tail_cf(m, x):
    from neuroquant_tpu.models.layers import out_img
    from neuroquant_tpu.ops.tail_fused import resolve_impl, run_fused_tail_cf

    assert m.tail_packed, "decode_cf requires the packed PNeRV tail"
    impl = _gated_impl(m) or "jnp"
    blocks, head = _tail_params(m, x)
    z, _, _, _ = run_fused_tail_cf(x, blocks, head, impl=impl)
    return out_img(z, "sigmoid")


class PNeRV2(nn.Module):
    """PNeRV variant without KFc shortcuts; gate = att * output
    (models/PNeRV.py:110-188)."""

    cfg: PNeRVConfig

    def setup(self):
        c = self.cfg
        d = c.emd_channel
        self.encoder = _PNeRVEncoder(cfg=c)
        self.dec_exc = NeRVBlock(out_channel=d, kernel_size=1, stride=10,
                                 norm=c.dec_norm, act=c.dec_acts)
        new_ngf = c.kfc_h_w_c[2]
        dec_layers, bsm_z, bsm_h = [], [], []
        for i, stride in enumerate(c.kfc_strides):
            if i != len(c.kfc_strides) - 1:
                bsm_z.append(Conv2d(features=new_ngf, kernel_size=(3, 3),
                                    padding=(1, 1)))
                bsm_h.append(Conv2d(features=new_ngf, kernel_size=(3, 3),
                                    padding=(1, 1)))
            dec_layers.append(NeRVBlock(out_channel=new_ngf, kernel_size=3,
                                        stride=stride, norm=c.dec_norm,
                                        act=c.dec_acts))
        self.dec_layers = dec_layers
        self.bsm_z, self.bsm_h = bsm_z, bsm_h
        self.head_layer = Conv2d(features=3, kernel_size=(3, 3), padding=(1, 1))
        self.tail_packed = pnerv_tail_packed(c)

    def encode(self, img):
        return self.encoder(img)

    def decode_cf(self, content):
        x = self.dec_exc(content)
        for i in range(len(self.bsm_z)):
            x = self._gate(x, i)
        return _packed_tail_cf(self, x)

    def _gate(self, x, i):
        x = self.dec_layers[i](x)
        memory = jax.nn.relu(self.bsm_z[i](x))
        att = jax.nn.sigmoid(self.bsm_h[i](memory))
        return att * x

    def decode(self, content, return_embeds: bool = False):
        embeds = [content]
        x = self.dec_exc(content)
        n_fused = len(self.bsm_z)
        for i in range(n_fused):
            x = self._gate(x, i)
            embeds.append(x)
        if not return_embeds and self.tail_packed:
            return _packed_tail(self, x)
        x = self.dec_layers[n_fused](x)
        x = self.head_layer(x)
        img = jax.nn.sigmoid(x)
        if return_embeds:
            return img, embeds
        return img

    def __call__(self, img):
        return self.decode(self.encode(img))


PNeRV = PNeRV1
