"""Model registry, parameter accounting, and quantization layout.

`quant_layer_paths(arch)` pins the traversal order of quantizable conv layers
— the order `--precision` lists are consumed in (reference: QuantModel
traversal, quantization/quant_model.py:58-72; 7 QuantModules for NeRV/HNeRV:
decoder[0], five NeRVBlock convs, head_layer).
"""

from __future__ import annotations

import numpy as np

from neuroquant_tpu.models.nerv import NeRV, NeRVConfig
from neuroquant_tpu.models.hnerv import HNeRV, HNeRVConfig
from neuroquant_tpu.models.pnerv import PNeRV, PNeRV1, PNeRV2, PNeRVConfig

__all__ = [
    "NeRV", "HNeRV", "PNeRV", "PNeRV1", "PNeRV2",
    "NeRVConfig", "HNeRVConfig", "PNeRVConfig",
    "build_model", "quant_layer_paths", "param_counts", "example_input",
    "tail_plan_for",
]


def build_model(arch: str, cfg: dict):
    arch = arch.lower()
    if arch == "nerv":
        return NeRV(cfg=NeRVConfig.from_cfg(cfg))
    if arch == "hnerv":
        return HNeRV(cfg=HNeRVConfig.from_cfg(cfg))
    if arch in ("pnerv", "pnerv1"):
        return PNeRV1(cfg=PNeRVConfig.from_cfg(cfg))
    if arch == "pnerv2":
        return PNeRV2(cfg=PNeRVConfig.from_cfg(cfg))
    raise ValueError(f"model arch wrong: {arch!r}")


def quant_layer_paths(arch: str, cfg: dict | None = None):
    """Paths (into params['params']) of quantizable conv layers, in the
    reference's module-traversal order."""
    arch = arch.lower()
    if arch in ("nerv", "hnerv"):
        n_blocks = len(cfg["dec_strides"]) if cfg else 5
        return (
            [("decoder0",)]
            + [(f"blocks_{i}", "conv") for i in range(n_blocks)]
            + [("head_layer",)]
        )
    if arch in ("pnerv", "pnerv1", "pnerv2"):
        n = len(cfg["kfc_strides"]) if cfg else 5
        paths = [("dec_exc", "conv")]
        paths += [(f"dec_layers_{i}", "conv") for i in range(n)]
        paths += [(f"bsm_z_{i}",) for i in range(n - 1)]
        if arch != "pnerv2":
            paths += [(f"bsm_r_{i}",) for i in range(n - 1)]
        paths += [(f"bsm_h_{i}",) for i in range(n - 1)]
        paths += [("head_layer",)]
        return paths
    raise ValueError(arch)


def _tree_size(tree) -> int:
    import jax
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def param_counts(arch: str, cfg: dict, params, final_size: int,
                 full_data_length: int):
    """(encoder_M, decoder_M, total_M) matching the reference's accounting
    (methods/regress.py:171-206): decoder counts decoder[0]+blocks (no head);
    HNeRV adds the stored per-frame embedding to the total."""
    arch = arch.lower()
    p = params["params"] if "params" in params else params
    if arch == "hnerv":
        enc = _tree_size(p["encoder"]) / 1e6
        dec = (_tree_size(p["decoder0"])
               + sum(_tree_size(v) for k, v in p.items()
                     if k.startswith("blocks_"))) / 1e6
        embed = (float(cfg["enc_channel"][-1]) / np.prod(cfg["enc_strides"]) ** 2
                 * final_size * full_data_length)
        total = dec + embed / 1e6
    elif arch == "nerv":
        enc = 0.0
        dec = (_tree_size(p["decoder0"])
               + sum(_tree_size(v) for k, v in p.items()
                     if k.startswith("blocks_"))) / 1e6
        total = dec
    else:  # pnerv: encoder vs rest (methods/regress.py:190-193)
        enc = _tree_size(p["encoder"]) / 1e6
        dec = _tree_size(p) / 1e6 - enc
        embed = (float(cfg["emd_channel"]) / np.prod(cfg["enc_strides"]) ** 2
                 * final_size * full_data_length)
        total = dec + embed / 1e6
    return enc, dec, total


def tail_plan_for(arch: str, cfg: dict):
    """Static fused-tail geometry for (arch, cfg), or None when the fused
    channels-first tail does not apply (no packed tail / non-GELU).

    Returns (plan, f_final, ch_packed) — what a caller needs to pack
    ground-truth frames into the decode_cf output domain
    (ops/tail_fused.pack_targets) without touching model params: the plan
    depends only on shapes, so zero weights suffice."""
    from neuroquant_tpu.ops.packed_decode import resolve_pack_start
    from neuroquant_tpu.ops.tail_fused import plan_and_pack

    arch = arch.lower()
    if arch.startswith("pnerv"):
        from neuroquant_tpu.models.pnerv import PNeRVConfig, pnerv_tail_packed

        c = PNeRVConfig.from_cfg(cfg)
        if not pnerv_tail_packed(c):
            return None
        r = int(c.kfc_strides[-1])
        ngf = int(c.kfc_h_w_c[2])
        h, w = c.crop_h // r, c.crop_w // r
        blocks = [(np.zeros((3, 3, ngf, ngf * r * r), np.float32),
                   np.zeros(ngf * r * r, np.float32), r)]
        head = (np.zeros((3, 3, ngf, 3), np.float32),
                np.zeros(3, np.float32))
        plan, _, _, f, ch = plan_and_pack(h, w, blocks, head)
        return plan, f, ch
    if arch == "nerv":
        c = NeRVConfig.from_cfg(cfg)
    elif arch == "hnerv":
        c = HNeRVConfig.from_cfg(cfg)
    else:
        return None
    if c.dec_acts != "gelu":
        return None
    chans = c.decoder_channels()
    t = resolve_pack_start(c.packed_tail, c.dec_kernels, c.dec_strides,
                           c.dec_norm, [c.dec_in_channel] + chans[:-1], chans,
                           c.crop_h, c.crop_w)
    if t is None:
        return None
    s = int(np.prod([int(x) for x in c.dec_strides[t:]]))
    h, w = c.crop_h // s, c.crop_w // s
    cins = ([c.dec_in_channel] + chans)[t:]
    blocks = []
    for j in range(t, len(chans)):
        k, r = int(c.dec_kernels[j]), int(c.dec_strides[j])
        blocks.append((np.zeros((k, k, cins[j - t], chans[j] * r * r),
                                np.float32),
                       np.zeros(chans[j] * r * r, np.float32), r))
    head = (np.zeros((3, 3, chans[-1], 3), np.float32),
            np.zeros(3, np.float32))
    plan, _, _, f, ch = plan_and_pack(h, w, blocks, head)
    return plan, f, ch


def example_input(arch: str, cfg: dict, batch: int = 1):
    """A dummy input of the right shape/dtype for model.init / compile checks."""
    import jax.numpy as jnp
    arch = arch.lower()
    if arch == "nerv":
        return jnp.linspace(0.0, 1.0, batch, endpoint=False)
    return jnp.zeros((batch, cfg["crop_h"], cfg["crop_w"], 3), jnp.float32)
