"""PyTorch-compatible checkpoint mapping.

Stage-1 checkpoints keep the reference's `.pth` state-dict layout
(methods/regress.py:318-320 saves `model_latest.pth` / `epoch{N}.pth`), so a
reference-trained NeRV/HNeRV checkpoint loads into this framework and vice
versa. Tensor name and layout translation:

  torch                                    flax (this repo)
  -----------------------------------     -------------------------------
  decoder.0.{weight,bias}                  decoder0/{kernel,bias}
  decoder.{i}.conv.0.{weight,bias}         blocks_{i-1}/conv/{kernel,bias}
  head_layer.{weight,bias}                 head_layer/{kernel,bias}
  encoder.downsample_layers.0.0 (conv)     encoder/down_conv_0
  encoder.downsample_layers.0.1 (LN)       encoder/down_norm_0
  encoder.downsample_layers.i.0 (LN)       encoder/down_norm_i   (i > 0)
  encoder.downsample_layers.i.1 (conv)     encoder/down_conv_i
  encoder.stages.i.j.{dwconv,norm,         encoder/stage_{i}_block_{j}/...
                      pwconv1,pwconv2,gamma}

Conv weights transpose OIHW <-> HWIO; Linear weights (out,in) <-> (in,out);
LayerNorm/BatchNorm `weight` <-> `scale`. Saving uses torch.save so the
artifacts are loadable by the reference code unchanged.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np


def _to_np(x):
    return np.asarray(x)


def _conv_to_torch(k_hwio):
    return np.transpose(_to_np(k_hwio), (3, 2, 0, 1))  # HWIO -> OIHW


def _conv_from_torch(w_oihw):
    return np.transpose(_to_np(w_oihw), (2, 3, 1, 0))  # OIHW -> HWIO


def _convnext_pairs(enc: dict, n_stages: int, stage_blocks: int):
    """(torch_key, flax_subtree, kind) triples for the ConvNeXt encoder."""
    out = []
    for i in range(n_stages):
        conv = f"down_conv_{i}"
        norm = f"down_norm_{i}"
        conv_idx, norm_idx = (0, 1) if i == 0 else (1, 0)
        out.append((f"encoder.downsample_layers.{i}.{conv_idx}", (conv,), "conv"))
        out.append((f"encoder.downsample_layers.{i}.{norm_idx}", (norm,), "norm"))
        for j in range(stage_blocks):
            base = f"encoder.stages.{i}.{j}"
            blk = f"stage_{i}_block_{j}"
            out.append((f"{base}.dwconv", (blk, "dwconv"), "conv"))
            out.append((f"{base}.norm", (blk, "norm"), "norm"))
            out.append((f"{base}.pwconv1", (blk, "pwconv1"), "linear"))
            out.append((f"{base}.pwconv2", (blk, "pwconv2"), "linear"))
            out.append((f"{base}.gamma", (blk,), "gamma"))
    return out


def _decoder_pairs(p: dict):
    out = [("decoder.0", ("decoder0",), "conv")]
    n_blocks = sum(1 for k in p if k.startswith("blocks_"))
    for i in range(n_blocks):
        out.append((f"decoder.{i + 1}.conv.0", (f"blocks_{i}", "conv"), "conv"))
    out.append(("head_layer", ("head_layer",), "conv"))
    return out


def _pnerv_pairs(p: dict):
    """PNeRV1/2 mapping using the names the reference model would produce
    (models/PNeRV.py:20-61; the reference itself never saves one — its PNeRV
    path is dead code)."""
    out = []
    enc = p["encoder"]
    n_stages = sum(1 for k in enc if k.startswith("conv_"))
    for k in range(n_stages):
        out.append((f"enc_layers.{3 * k}", ("encoder", f"conv_{k}"), "conv"))
        out.append((f"enc_layers.{3 * k + 1}", ("encoder", f"norm_{k}"), "norm"))
        blk = f"block_{k}"
        base = f"enc_layers.{3 * k + 2}"
        out.append((f"{base}.dwconv", ("encoder", blk, "dwconv"), "conv"))
        out.append((f"{base}.norm", ("encoder", blk, "norm"), "norm"))
        out.append((f"{base}.pwconv1", ("encoder", blk, "pwconv1"), "linear"))
        out.append((f"{base}.pwconv2", ("encoder", blk, "pwconv2"), "linear"))
        out.append((f"{base}.gamma", ("encoder", blk), "gamma"))
    out.append((f"enc_layers.{3 * n_stages}", ("encoder", "proj"), "conv"))

    out.append(("dec_exc_layers.conv.0", ("dec_exc", "conv"), "conv"))
    n_dec = sum(1 for k in p if k.startswith("dec_layers_"))
    for i in range(n_dec):
        out.append((f"dec_layers.{i}.conv.0", (f"dec_layers_{i}", "conv"),
                    "conv"))
    n_sc = sum(1 for k in p if k.startswith("shortcuts_"))
    for i in range(n_sc):
        out.append((f"dec_shortcuts.{3 * i}", (f"shortcuts_{i}",), "raw"))
        out.append((f"dec_shortcuts.{3 * i + 1}", (f"shortcut_norms_{i}",),
                    "norm"))
    for kind in ("z", "r", "h"):
        n = sum(1 for k in p if k.startswith(f"bsm_{kind}_"))
        for i in range(n):
            out.append((f"dec_bsm_{kind}.{i}", (f"bsm_{kind}_{i}",), "conv"))
    out.append(("dec_head_layers", ("head_layer",), "conv"))
    return out


def _walk(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def params_to_state_dict(arch: str, params) -> "OrderedDict":
    """Flax params -> torch-layout state dict (numpy values)."""
    arch = arch.lower()
    p = params["params"] if "params" in params else params
    sd = OrderedDict()

    def put(torch_key, flax_path, kind):
        node = _walk(p, flax_path)
        if kind == "conv":
            sd[f"{torch_key}.weight"] = _conv_to_torch(node["kernel"])
            if "bias" in node:
                sd[f"{torch_key}.bias"] = _to_np(node["bias"])
        elif kind == "linear":
            sd[f"{torch_key}.weight"] = _to_np(node["kernel"]).T
            sd[f"{torch_key}.bias"] = _to_np(node["bias"])
        elif kind == "norm":
            sd[f"{torch_key}.weight"] = _to_np(node["scale"])
            sd[f"{torch_key}.bias"] = _to_np(node["bias"])
        elif kind == "gamma":
            sd[torch_key] = _to_np(node["gamma"])
        elif kind == "raw":  # KFc etc.: copy leaves verbatim
            for name, v in node.items():
                sd[f"{torch_key}.{name}"] = _to_np(v)
        else:
            raise ValueError(kind)

    if arch == "hnerv":
        enc = p["encoder"]
        n_stages = sum(1 for k in enc if k.startswith("down_conv_"))
        stage_blocks = sum(1 for k in enc if k.startswith("stage_0_block_"))
        for t, f, kind in _convnext_pairs(enc, n_stages, stage_blocks):
            put(t, ("encoder",) + f, kind)
        pairs = _decoder_pairs(p)
    elif arch == "nerv":
        pairs = _decoder_pairs(p)  # PositionEncoding has no parameters
    elif arch.startswith("pnerv"):
        pairs = _pnerv_pairs(p)
    else:
        raise NotImplementedError(f"state-dict export for arch {arch!r}")

    for t, f, kind in pairs:
        put(t, f, kind)
    return sd


def state_dict_to_params(arch: str, state_dict, params):
    """Torch state dict -> flax params, using `params` as the shape template.

    Missing keys are left at their current values (torch load_state_dict
    strict=False semantics, methods/regress.py:221).
    """
    import jax

    arch = arch.lower()
    has_wrapper = "params" in params
    p = jax.tree_util.tree_map(np.asarray, params["params"] if has_wrapper else params)
    # deep-copy into plain mutable dicts
    def to_mut(t):
        return {k: to_mut(v) for k, v in t.items()} if isinstance(t, dict) else t
    p = to_mut(p)

    sd = {k: _to_np(v) for k, v in state_dict.items()}

    def take(torch_key, flax_path, kind):
        node = _walk(p, flax_path)
        wk, bk = f"{torch_key}.weight", f"{torch_key}.bias"
        if kind == "conv":
            if wk in sd:
                node["kernel"] = _conv_from_torch(sd[wk]).astype(np.float32)
            if bk in sd and "bias" in node:
                node["bias"] = sd[bk].astype(np.float32)
        elif kind == "linear":
            if wk in sd:
                node["kernel"] = sd[wk].T.astype(np.float32)
            if bk in sd:
                node["bias"] = sd[bk].astype(np.float32)
        elif kind == "norm":
            if wk in sd:
                node["scale"] = sd[wk].astype(np.float32)
            if bk in sd:
                node["bias"] = sd[bk].astype(np.float32)
        elif kind == "gamma":
            if torch_key in sd:
                node["gamma"] = sd[torch_key].astype(np.float32)
        elif kind == "raw":
            for name in list(node):
                k = f"{torch_key}.{name}"
                if k in sd:
                    node[name] = sd[k].astype(np.float32)

    if arch == "hnerv":
        enc = p["encoder"]
        n_stages = sum(1 for k in enc if k.startswith("down_conv_"))
        stage_blocks = sum(1 for k in enc if k.startswith("stage_0_block_"))
        for t, f, kind in _convnext_pairs(enc, n_stages, stage_blocks):
            take(t, ("encoder",) + f, kind)
        pairs = _decoder_pairs(p)
    elif arch.startswith("pnerv"):
        pairs = _pnerv_pairs(p)
    else:
        pairs = _decoder_pairs(p)
    for t, f, kind in pairs:
        take(t, f, kind)

    import jax.numpy as jnp
    p = jax.tree_util.tree_map(jnp.asarray, p)
    return {"params": p} if has_wrapper else p


def save_pth(path: str, arch: str, params) -> None:
    """Write a reference-compatible .pth (torch pickle of the state dict)."""
    import torch

    sd = params_to_state_dict(arch, params)
    # np.array(..., copy=True) also drops the non-writable flag jax device
    # arrays carry (torch.from_numpy warns on read-only buffers)
    torch_sd = OrderedDict((k, torch.from_numpy(np.array(v, copy=True)))
                           for k, v in sd.items())
    torch.save(torch_sd, path)


def load_pth(path: str, arch: str, params):
    """Load a reference .pth checkpoint into flax params (strict=False)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
          for k, v in sd.items()}
    return state_dict_to_params(arch, sd, params)
