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
        )

    @property
    def embed_hw(self) -> Tuple[int, int]:
        s = int(np.prod(self.enc_strides))
        return self.crop_h // s, self.crop_w // s


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

    Note: the space-to-depth packed tail (ops/packed_decode.py) is NOT
    applied here — the BSM gates fuse each block's output with KFc shortcut
    tensors at every resolution, so the tail cannot stay in a packed layout
    without also packing the KFc upsamplers (whose Kronecker structure
    doesn't commute with space-to-depth). PNeRV decodes via the standard
    fused conv+shuffle path; the reference publishes no PNeRV perf baseline.
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

    def encode(self, img):
        return self.encoder(img)

    def decode(self, content, return_embeds: bool = False):
        embeds = [content]
        x = self.dec_exc(content)
        n_fused = len(self.shortcuts)
        for i in range(n_fused):
            pym = self.shortcuts[i](content)
            pym = self.shortcut_norms[i](pym)
            pym = self.act_fn(pym)
            x = self.dec_layers[i](x)
            memory_z = self.bsm_z[i](x)
            memory_r = self.bsm_r[i](pym)
            memory = jax.nn.relu(memory_z + memory_r)
            att = jax.nn.sigmoid(self.bsm_h[i](memory))
            x = att * x + (1 - att) * memory_r
            embeds.append(x)
        x = self.dec_layers[n_fused](x)
        x = self.head_layer(x)
        img = jax.nn.sigmoid(x)
        if return_embeds:
            return img, embeds
        return img

    def __call__(self, img):
        return self.decode(self.encode(img))


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

    def encode(self, img):
        return self.encoder(img)

    def decode(self, content, return_embeds: bool = False):
        embeds = [content]
        x = self.dec_exc(content)
        n_fused = len(self.bsm_z)
        for i in range(n_fused):
            x = self.dec_layers[i](x)
            memory = jax.nn.relu(self.bsm_z[i](x))
            att = jax.nn.sigmoid(self.bsm_h[i](memory))
            x = att * x
            embeds.append(x)
        x = self.dec_layers[n_fused](x)
        x = self.head_layer(x)
        img = jax.nn.sigmoid(x)
        if return_embeds:
            return img, embeds
        return img

    def __call__(self, img):
        return self.decode(self.encode(img))


PNeRV = PNeRV1
