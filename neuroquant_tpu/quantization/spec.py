"""Static quantization configuration (which layers, how many bits, domain).

The reference's QuantModel mutates wrapper modules to carry this information
(quant_model.py:11-87); here it is an immutable spec the pure quantization
functions close over. The dynamic, optimizable part (deltas, zero points,
AdaRound alphas) lives in a separate QuantState pytree (qmodel.py).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

from neuroquant_tpu.models import quant_layer_paths


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    layer_names: Tuple[str, ...]           # flat keys into QuantState
    layer_paths: Tuple[Tuple[str, ...], ...]  # paths into params['params']
    n_bits: Tuple[int, ...]                # per-layer bit width (weights+bias)
    channel_wise: bool = True
    scale_method: str = "max"
    hadamard: bool = False
    sym: bool = False
    fq_impl: str = "jnp"   # 'jnp' | 'pallas' (ops/pallas_fakequant.py)

    def __post_init__(self):
        assert len(self.layer_names) == len(self.layer_paths) == len(self.n_bits)
        for b in self.n_bits:
            assert 2 <= b <= 8, f"bitwidth not supported: {b}"  # quantizer.py:96

    def with_bits(self, bits) -> "QuantSpec":
        """set_bitwidth equivalent (quant_model.py:58-72): assign per-layer
        bits in traversal order."""
        bits = tuple(int(b) for b in bits)
        assert len(bits) == len(self.layer_names), (
            f"need {len(self.layer_names)} bit entries, got {len(bits)}")
        return dataclasses.replace(self, n_bits=bits)

    @property
    def num_layers(self) -> int:
        return len(self.layer_names)


def make_spec(arch: str, cfg: dict, n_bits: int = 8, channel_wise: bool = True,
              scale_method: str = "max", hadamard: bool = False,
              sym: bool = False, fq_impl: str = "jnp") -> QuantSpec:
    """Spec over the arch's quantizable conv layers in reference traversal
    order (7 for NeRV/HNeRV: decoder[0], 5 block convs, head)."""
    paths = tuple(tuple(p) for p in quant_layer_paths(arch, cfg))
    names = tuple("/".join(p) for p in paths)
    return QuantSpec(layer_names=names, layer_paths=paths,
                     n_bits=(n_bits,) * len(paths), channel_wise=channel_wise,
                     scale_method=scale_method, hadamard=hadamard, sym=sym,
                     fq_impl=fq_impl)
