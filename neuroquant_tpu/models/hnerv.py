"""HNeRV: ConvNeXt content encoder -> tiny embedding -> conv/pixel-shuffle
decoder. TPU-native re-design of models/HNeRV.py:11-79 (NHWC, pure functions).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
from flax import linen as nn

from neuroquant_tpu.models.layers import Conv2d, ConvNeXt, NeRVBlock, out_img
from neuroquant_tpu.ops.packed_decode import depth_to_space, resolve_pack_start
from neuroquant_tpu.ops.pixelshuffle import pixel_shuffle


@dataclasses.dataclass(frozen=True)
class HNeRVConfig:
    crop_h: int
    crop_w: int
    stage_block: int
    enc_strides: Tuple[int, ...]
    enc_channel: Tuple[int, ...]
    dec_in_channel: int
    dec_kernels: Tuple[int, ...]
    dec_strides: Tuple[int, ...]
    channel_reduce: float
    channel_lbound: int
    dec_norm: str
    dec_acts: str
    out_bias: str
    packed_tail: str = "auto"   # 'auto' | 'off' | explicit block index
    fused_tail: str = "auto"    # 'auto' | 'pallas' | 'jnp' | 'off'
    fused_prefix: str = "auto"  # 'auto' | 'off': last pre-tail block via a
    #                             1-layer CF Pallas plan (tail_fused)

    @classmethod
    def from_cfg(cls, cfg: dict) -> "HNeRVConfig":
        assert list(cfg["enc_strides"]) == list(cfg["dec_strides"]), \
            "HNeRV requires enc_strides == dec_strides (models/HNeRV.py:15)"
        return cls(
            crop_h=cfg["crop_h"], crop_w=cfg["crop_w"],
            stage_block=int(cfg["stage_block"]),
            enc_strides=tuple(cfg["enc_strides"]),
            enc_channel=tuple(cfg["enc_channel"]),
            dec_in_channel=int(cfg["dec_in_channel"]),
            dec_kernels=tuple(cfg["dec_kernels"]),
            dec_strides=tuple(cfg["dec_strides"]),
            channel_reduce=float(cfg["channel_reduce"]),
            channel_lbound=int(cfg["channel_lbound"]),
            dec_norm=cfg["dec_norm"], dec_acts=cfg["dec_acts"],
            out_bias=str(cfg["out_bias"]),
            packed_tail=str(cfg.get("packed_tail", "auto")),
            fused_tail=str(cfg.get("fused_tail", "auto")),
            fused_prefix=str(cfg.get("fused_prefix", "auto")),
        )

    @property
    def fc_h(self) -> int:
        return int(np.prod(self.enc_strides)) // int(np.prod(self.dec_strides))

    fc_w = fc_h

    def decoder_channels(self):
        chans, in_c = [], self.dec_in_channel
        for _ in self.dec_strides:
            out_c = int(max(round(in_c / self.channel_reduce), self.channel_lbound))
            chans.append(out_c)
            in_c = out_c
        return chans

    @property
    def embed_hw(self) -> Tuple[int, int]:
        s = int(np.prod(self.enc_strides))
        return self.crop_h // s, self.crop_w // s


class HNeRV(nn.Module):
    cfg: HNeRVConfig

    def setup(self):
        c = self.cfg
        self.encoder = ConvNeXt(stage_blocks=c.stage_block, strds=c.enc_strides,
                                dims=c.enc_channel)
        self.decoder0 = Conv2d(features=c.dec_in_channel, kernel_size=(1, 1))
        blocks = []
        for ks, stride, out_c in zip(c.dec_kernels, c.dec_strides,
                                     c.decoder_channels()):
            blocks.append(NeRVBlock(out_channel=out_c, kernel_size=ks,
                                    stride=stride, norm=c.dec_norm,
                                    act=c.dec_acts))
        self.blocks = blocks
        self.head_layer = Conv2d(features=3, kernel_size=(3, 3), padding=(1, 1))
        chans = c.decoder_channels()
        self.pack_start = resolve_pack_start(
            c.packed_tail, c.dec_kernels, c.dec_strides, c.dec_norm,
            [c.dec_in_channel] + chans[:-1], chans, c.crop_h, c.crop_w)

    def encode(self, img):
        """NHWC frames -> (B, crop_h/prod(s), crop_w/prod(s), enc_channel[-1])."""
        return self.encoder(img)

    def _tail_params(self, x):
        from neuroquant_tpu.models.layers import collect_tail_params

        return collect_tail_params(self.blocks, self.head_layer,
                                   self.pack_start,
                                   self.cfg.decoder_channels(), x)

    def _fused_impl(self):
        from neuroquant_tpu.ops.packed_decode import gate_fused_impl
        from neuroquant_tpu.ops.tail_fused import resolve_impl

        c = self.cfg
        if self.pack_start is None or c.dec_acts != "gelu":
            return None
        # Plans infeasible even with the cout-row split demote to None:
        # decode falls back to the XLA packed execution, decode_cf to the
        # jnp twin for the calibration loss (UVG study, RESULTS.md)
        chans = c.decoder_channels()
        return gate_fused_impl(
            resolve_impl(c.fused_tail), self.pack_start, c.dec_kernels,
            c.dec_strides, [c.dec_in_channel] + chans[:-1], chans,
            c.crop_h, c.crop_w)

    def _prefix(self, img_embed, impl):
        """Decode prefix (decoder0 + blocks[:pack_start]) -> the tail-entry
        NHWC activation; the last prefix block runs fused on the Pallas
        impls (layers.run_prefix_blocks)."""
        from neuroquant_tpu.models.layers import run_prefix_blocks

        c = self.cfg
        x = self.decoder0(img_embed)
        x = pixel_shuffle(x, (c.fc_h, c.fc_w))
        return run_prefix_blocks(
            self.blocks, self.pack_start, x, impl,
            fused_prefix=c.fused_prefix, dec_norm=c.dec_norm,
            crop_h=c.crop_h, crop_w=c.crop_w, dec_strides=c.dec_strides,
            chans=c.decoder_channels(), dec_in_channel=c.dec_in_channel)

    def decode_cf(self, img_embed):
        """Decode to the packed channels-first head output with `out_bias`
        applied: (B, ch8, Mp). The calibration loss runs directly in this
        domain against tail_fused.pack_targets-packed ground truth (the
        depth-to-space is a permutation, so elementwise-loss sums are
        invariant), skipping the unpack + NHWC transposes every step."""
        from neuroquant_tpu.ops.tail_fused import run_fused_tail_cf

        c = self.cfg
        assert self.pack_start is not None and c.dec_acts == "gelu", \
            "decode_cf requires a packed GELU tail (use decode instead)"
        impl = self._fused_impl() or "jnp"
        x = self._prefix(img_embed, impl)
        blocks, head = self._tail_params(x)
        z, _, _, _ = run_fused_tail_cf(x, blocks, head, impl=impl)
        return out_img(z, c.out_bias)

    def decode(self, img_embed, return_embeds: bool = False):
        c = self.cfg
        if not return_embeds and self.pack_start is not None:
            # fast path: the high-resolution tail runs space-to-depth packed
            # at the pack_start block's input resolution (ops/packed_decode.py);
            # on TPU the tail executes as channels-first Pallas kernels
            # (ops/tail_fused.py) instead of XLA convs
            impl = self._fused_impl()
            if impl is not None:
                from neuroquant_tpu.ops.tail_fused import run_fused_tail_frames

                x = self._prefix(img_embed, impl)
                blocks, head = self._tail_params(x)
                # tail + out_img + depth-to-space in one pass (the unpack
                # runs as a Pallas kernel, not an XLA relayout copy)
                return run_fused_tail_frames(x, blocks, head, c.out_bias,
                                             impl=impl)
            x = self.decoder0(img_embed)
            x = pixel_shuffle(x, (c.fc_h, c.fc_w))
            f, perm = 1, None
            for j, blk in enumerate(self.blocks):
                if j < self.pack_start:
                    x = blk(x)
                else:
                    x, perm = blk(x, pack_in=f, absorb=True, in_perm=perm)
                    f *= blk.stride
            x = self.head_layer(x, pack_in=f, in_perm=perm)
            img = out_img(x, c.out_bias)
            return depth_to_space(img, f)
        embeds = [img_embed]
        x = self.decoder0(img_embed)
        embeds.append(x)
        x = pixel_shuffle(x, (c.fc_h, c.fc_w))  # identity when strides match
        for blk in self.blocks:
            x = blk(x)
            embeds.append(x)
        x = self.head_layer(x)
        img = out_img(x, c.out_bias)
        if return_embeds:
            return img, embeds
        return img

    def __call__(self, img):
        return self.decode(self.encode(img))
