"""NeuroQuant-TPU: a TPU-native post-training-quantization framework for video INRs.

A ground-up JAX/Flax/Pallas re-design of the capabilities of NeuroQuant
(ICLR 2025 spotlight, "On Quantizing Neural Representation for Variable-Rate
Video Coding"): overfit a small conv decoder to one video, pick a mixed-precision
bit allocation with a Hessian ("Omega") sensitivity criterion, calibrate scales +
AdaRound rounding network-wise against ground-truth frames (optionally in a
per-channel Hadamard domain), and hand integer weights to an entropy codec.

Pipeline stages (CLI modules under ``neuroquant_tpu.methods``):
  1. ``regress``            — FP32 per-video overfitting (jit + scan, frames in HBM)
  2. ``bit_assign``         — Omega / Fisher mixed-precision search (jax.jvp HVP)
  3. ``calibrate_network``  — network-wise scale + AdaRound calibration
  4. ``compress``           — entropy-code integer weights into a bitstream (bpp)

Everything on the compute path is functional: models are Flax modules, the
"quantized model" is (params, QuantSpec, QuantState) and fake-quantization is a
pure transformation of the parameter pytree applied before ``model.apply``.
"""

__version__ = "0.1.0"

from neuroquant_tpu.config import get_config  # noqa: F401
