"""YAML config loading with light validation.

Keeps the reference's config surface (same YAML keys; see
/root/reference/configs/HNeRV/Bunny_1280x640_3M.yaml and utils.py:35-38) so a
NeuroQuant user can reuse their config files unchanged, but validates the keys
each architecture actually needs instead of raw dict access.
"""

from __future__ import annotations

import yaml

# Keys shared by every architecture.
_COMMON_KEYS = (
    "crop_h", "crop_w", "loss", "epoch", "eval_freq", "batch_size",
    "learning_rate",
)

_ARCH_KEYS = {
    "nerv": ("base", "level", "dec_in_channel", "dec_kernels", "dec_strides",
             "channel_reduce", "channel_lbound", "dec_norm", "dec_acts",
             "out_bias"),
    "hnerv": ("stage_block", "enc_strides", "enc_channel", "dec_in_channel",
              "dec_kernels", "dec_strides", "channel_reduce", "channel_lbound",
              "dec_norm", "dec_acts", "out_bias"),
    "pnerv": ("enc_channel", "emd_channel", "enc_strides", "kfc_h_w_c",
              "kfc_strides", "dec_norm", "dec_acts"),
}


def get_config(config_path: str) -> dict:
    """Load a YAML config into a plain dict (reference: utils.py:35-38)."""
    with open(config_path, "r") as stream:
        return yaml.load(stream, Loader=yaml.FullLoader)


def validate_config(cfg: dict, arch: str) -> dict:
    """Check that `cfg` carries every key `arch` needs; returns cfg."""
    arch = arch.lower()
    if arch not in _ARCH_KEYS:
        raise ValueError(f"unknown arch {arch!r}; expected one of {sorted(_ARCH_KEYS)}")
    missing = [k for k in _COMMON_KEYS + _ARCH_KEYS[arch] if k not in cfg]
    if missing:
        raise KeyError(f"config missing keys for arch={arch}: {missing}")
    return cfg
