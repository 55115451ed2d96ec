"""Generate the reference implementation's EXACT torch-seed-903 init draw as
a .pth, for training in this framework via `regress --weight`.

The round-1 parity experiment (tests/test_reference_parity.py) proved both
frameworks produce identical trajectories from identical inits; the residual
FP32 gap vs the reference logs is the init draw. Importing the reference's
torch model under its own seeding (methods/regress.py:60-67: random/np/torch
all seeded before model build) reproduces that draw exactly, so a 300-epoch
run from this init isolates trajectory-level differences at matched init.

timm is stubbed with torch.nn.init.trunc_normal_ (same math as
timm.models.layers.trunc_normal_ defaults) since timm is not installed.

Usage: python scripts/ref_init.py <hnerv|nerv> <config.yaml> <out.pth> [seed]
"""

import os
import random
import sys
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/reference"


def import_reference(arch: str):
    import torch

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        ml = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        layers.trunc_normal_ = lambda t, std=.02: \
            torch.nn.init.trunc_normal_(t, std=std, a=-2.0, b=2.0)

        class DropPath:          # only instantiated for drop_path > 0
            def __init__(self, *a, **k):
                raise RuntimeError("DropPath unused at rate 0")

        layers.DropPath = DropPath
        sys.modules.update({"timm": timm, "timm.models": ml,
                            "timm.models.layers": layers})
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if arch == "hnerv":
        from models.HNeRV import HNeRV
        return HNeRV
    from models.NeRV import NeRV
    return NeRV


def main(arch: str, config: str, out: str, seed: int = 903):
    import numpy as np
    import torch
    import yaml

    cls = import_reference(arch)
    cfg = yaml.safe_load(open(config))
    # the reference seeds everything before building the model
    # (methods/regress.py:60-67, called at main)
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    torch.manual_seed(seed)
    model = cls(cfg)
    n = sum(p.numel() for p in model.parameters())
    torch.save(model.state_dict(), out)
    print(f"wrote {out}: reference {arch} torch-{seed} init, {n / 1e6:.2f}M params")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3],
         int(sys.argv[4]) if len(sys.argv) > 4 else 903)
