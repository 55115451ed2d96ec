"""Channels-first Pallas execution of the packed decoder tail.

Round-2 left the packed tail (ops/packed_decode.py) at ~27% of its analytic
floor: XLA convolves NHWC with channels on the 128-wide MXU *lane* axes, so
every tail conv pays ceil(C/128) lane padding on BOTH channel axes (53->128,
176->256, 592->640, 48->128). This module re-executes the same math with the
channel axes on the *streamed* matmul dimension, where the MXU pays per-row,
not per-128-lane-tile.

Layout: activations live channels-first and spatially flattened,
(B, C8, Mp) with Mp = (H+2P) * (W+2P) rows-major including a P-wide zero
border -- a conv tap (ty, tx) is then a STATIC lane shift
(ty-off)*Wp + (tx-off). Borders are re-zeroed between layers (exactly the
semantics of 'same' zero padding); channel counts pad to multiples of 8
(sublanes) once, with zero weights in the pad rows/columns so the padding is
inert end-to-end.

Per-layer execution mode (chosen by a padded-cost model):
  patches -- build the (K, TM) im2col matrix from k^2 static lane slices of
             the VMEM tile, one (Cout, K) @ (K, TM) matmul. Contraction
             K = taps*Cin pads once to 128 (<6% for the real tails) instead
             of per-tap; best when Cin is far from a lane multiple (53, 176).
  kn2row  -- one (taps*Cout, Cin) @ (Cin, span) matmul then taps shifted
             VPU accumulations of the *output*. Streams taps*Cout rows
             (amortizes the MXU weight-load latency that starves a
             3-48-channel head) and needs no patch buffer; best when Cout is
             tiny and Cin is lane-friendly (the 592 -> 48 packed head).
  taps    -- taps separate (Cout, Cin) @ (Cin, TM) matmuls; fallback when
             the other modes' VMEM cost is not worth it.
Input tiles stream HBM->VMEM through a 2-slot double-buffered manual DMA
(BlockSpec cannot express overlapping halo windows).

The backward runs the same kernel family: dx is the identical conv with the
canonical kernel tap-reversed and channel-transposed (+ an elementwise
GELU'(z_prev) epilogue), dW is one dot_general per tile accumulated into a
VMEM-resident block across the sequential TPU grid. The custom VJP's primal
weights are CANONICAL (kp, kp, Cin8, Cout8) packed kernels, so mode choices
stay internal and XLA chain-rules through the kernel repack
(ops/packed_decode.pack_conv_kernel, a gather) back to the unpacked
parameters the quantizers own.

Reference hot path being accelerated: quant_layer.py:67-81 wrapping
models/_layers.py:20-36 (conv -> PixelShuffle -> GELU), the op the reference
README's custom-CUDA-kernel precedent targets (readme.md:123).

Numerics: matmuls accumulate fp32 (preferred_element_type). Pass bf16
arrays for single-pass MXU throughput (the fp32 path runs multi-pass and is
bit-comparable to the XLA conv path); on CPU (tests) kernels run in
interpreter mode and match the packed XLA path to ~1e-5 fp32.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _r8(c: int) -> int:
    return -(-int(c) // 8) * 8


def _r128(x: int) -> int:
    return -(-int(x) // 128) * 128


def _erf(x):
    """erf in elementwise fp32 ops (Abramowitz & Stegun 7.1.26, max abs
    error 1.5e-7). Mosaic has no erf/erfc lowering in this JAX version; this
    error level is far below the bf16 MXU rounding the conv path already
    carries, and the jnp twin uses the same function so both fused impls
    agree bit-for-bit on CPU."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    """GELU via _erf (the reference uses nn.GELU approximate='none');
    matches jax.nn.gelu(approximate=False) to ~1.5e-7."""
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + _erf(xf * 0.7071067811865476))
    return y.astype(x.dtype)


_INV_SQRT_2PI = 0.3989422804014327


def _gelu_grad(z):
    """d/dz [z * Phi(z)] = Phi(z) + z * phi(z), exact-GELU derivative."""
    zf = z.astype(jnp.float32)
    phi = jnp.exp(-0.5 * zf * zf) * _INV_SQRT_2PI
    cdf = 0.5 * (1.0 + _erf(zf * 0.7071067811865476))
    return cdf + zf * phi


# --------------------------------------------------------------------------
# Static plan
# --------------------------------------------------------------------------
@lru_cache(maxsize=256)
def _union_blocks(sparse) -> tuple:
    """Sorted distinct (py, px, gin) blocks over every output group's taps.

    The 'upatches' K axis: a packed layer's group q reads k^2 of the
    k^2 * f^2 possible (tap, input-group) blocks, but the UNION over all f^2
    groups is only (k + f - 1)^2 / f^2 * k^2-ish blocks (each axis takes
    k + f - 1 distinct (subposition + tap offset) values, not k * f) — e.g.
    the HNeRV head (k=3, f=4): 36 union blocks vs 144 dense, so one
    (cout, 36*cin_o) matmul spans 1/4 the MXU K-tiles of the dense packed
    kernel while still producing every output row at once (the canonical
    packed weight is zero at the blocks a group does not read)."""
    _, _, _, qtaps = sparse
    return tuple(sorted({blk for taps in qtaps for blk in taps}))


@dataclasses.dataclass(frozen=True)
class TailLayer:
    cin: int            # packed input channels, padded to 8
    cout: int           # packed output channels, padded to 8
    side: int           # packed kernel size kp (taps per axis)
    off: int            # left tap offset offp (packed_kernel_geometry)
    gelu_in: bool       # input is a pre-activation -> apply GELU in-kernel
    # zero-structure of the packed kernel for layers packed with f >= 2
    # (packed_decode.packed_sparse_taps): (k_orig, cin_o, cout_o, qtaps),
    # for this kernel and its convT — enables the 'qpatches' execution mode
    # that skips the f^2 dense-packing flop waste
    sparse: tuple | None = None
    sparse_t: tuple | None = None

    @property
    def taps(self) -> int:
        return self.side * self.side

    @property
    def k_dim(self) -> int:
        return self.taps * self.cin

    def transposed(self) -> "TailLayer":
        """Geometry of the convT (dx) pass: channels swapped, tap offset
        mirrored (tap reversal <=> negated shifts)."""
        return TailLayer(cin=self.cout, cout=self.cin, side=self.side,
                         off=self.side - 1 - self.off, gelu_in=False,
                         sparse=self.sparse_t, sparse_t=self.sparse)


@dataclasses.dataclass(frozen=True)
class TailPlan:
    h: int              # tail grid height (without border)
    w: int              # tail grid width
    pad: int            # border width P = max tap reach over layers
    tm: int             # max lane tile; Mp is padded to a multiple of it
    layers: Tuple[TailLayer, ...]

    @property
    def hp(self) -> int:
        return self.h + 2 * self.pad

    @property
    def wp(self) -> int:
        return self.w + 2 * self.pad

    @property
    def mp(self) -> int:
        """Flattened grid size, padded up to a whole number of max tiles
        (every per-call tile size divides tm, so any of them tile Mp)."""
        return -(-self.hp * self.wp // self.tm) * self.tm

    def shifts(self, layer: TailLayer) -> Tuple[int, ...]:
        return tuple((ty - layer.off) * self.wp + (tx - layer.off)
                     for ty in range(layer.side) for tx in range(layer.side))

    def qshifts(self, layer: TailLayer) -> Tuple[Tuple[Tuple[int, int], ...],
                                                 ...]:
        """Per output group q: k^2 (shift, gin) pairs for 'qpatches'."""
        _, _, _, qtaps = layer.sparse
        return tuple(
            tuple(((py - layer.off) * self.wp + (px - layer.off), gin)
                  for (py, px, gin) in taps)
            for taps in qtaps)

    def ushifts(self, layer: TailLayer) -> Tuple[Tuple[int, int], ...]:
        """Distinct (shift, gin) pairs over EVERY group's taps ('upatches'):
        the union K axis any output group's row reads from."""
        return tuple(((py - layer.off) * self.wp + (px - layer.off), gin)
                     for (py, px, gin) in _union_blocks(layer.sparse))

    def guard(self, layer: TailLayer) -> int:
        s = self.shifts(layer)
        return max(-min(s), max(s))


@dataclasses.dataclass(frozen=True)
class ExecCfg:
    """Per-pallas-call execution choice: mode + lane tile, sized to VMEM."""
    mode: str           # 'patches' | 'taps' | 'kn2row'
    tm: int

    def span(self, plan: TailPlan, layer: TailLayer) -> int:
        """VMEM tile width = tm + the 128-aligned guard on both sides.
        The guard is pre-rounded (not the sum) so interior DMA source
        offsets i*tm - G stay 128-aligned — Mosaic requires lane-axis DMA
        offsets to prove divisible by the tiling."""
        return self.tm + 2 * _r128(plan.guard(layer))


# 11.25MB of the 16MB VMEM modeled as usable by a call's working set: the
# measured compile boundary on v5e sits near ~12-13MB (scripts/
# tail_layer_bench.py NQ_TAIL_MODE sweeps: patches@2048 on the 56->176
# layer, ~11MB modeled, compiles and is the fastest config; @4096 fails),
# leaving headroom for Mosaic's own scratch.
_VMEM_BUDGET = int(11.25 * 1024 * 1024)

# Cost-model constants, calibrated against scripts/tail_layer_bench.py on a
# v5e chip (2026-08, fixed-units run): VPU lane-rotation assembly of patch
# tensors costs ~64-120 MAC-equivalents per copied element (Mosaic lowers a
# misaligned lane slice as shift+select over vregs), taps-mode slices feed
# the MXU more cheaply, and kn2row pays fp32 read-add-write on the shifted
# z rows. DMA-assembled patches trade that VPU work for HBM re-reads at
# ~120 MAC-equivalents per byte (98.5 G-MAC/ms vs 0.82 GB/ms).
_ASM_PATCHES = 96          # per assembled element (patches/qpatches)
_ASM_TAPS = 32             # per sliced element (taps)
_ASM_KN2ROW = 560          # per shifted fp32 output element (kn2row)
_HBM_MAC_PER_BYTE = 120


def _cin_pad(cin: int, itemsize: int) -> int:
    """Per-tap row stride in the DMA-assembled patches buffer: the sublane
    tile (8 fp32 / 16 bf16 rows) so every tap's DMA lands tile-aligned."""
    st = 32 // itemsize
    return -(-cin // st) * st


# (cin8, cout8, side, sparse?, "fwd"|"dw") -> (mode, tm), measured best on
# v5e (2026-08 sweep, /tmp-logged in RESULTS.md "per-layer sweep"): the
# model's VMEM estimate is per-mode approximate, so configs near the budget
# (patches@2048 on 56->176: 370us vs 296 at @1024) or beyond it (kn2row@4096
# on the 592->48 head: 437us vs the model pick taps@2048 at 476) get pinned
# from measurement instead. Keys cover HNeRV-3M and NeRV-3M tails, fwd AND
# the transposed dx geometries (e.g. 48x592 = head dx: qpatches 184us vs
# taps 473).
_SWEEP_PINS = {
    # HNeRV-3M Bunny tail (plan 160x320, layers 56->176->592->48)
    (56, 176, 5, False, "fwd"): ("ppatches", 2048),  # pipelined: 247us
    (56, 176, 5, False, "dw"): ("patches", 1024),
    (176, 56, 5, False, "fwd"): ("taps", 2048),      # L0 dx
    (176, 592, 3, True, "fwd"): ("qpatches", 1024),
    (176, 592, 3, True, "dw"): ("qpatches", 1024),
    (592, 176, 3, True, "fwd"): ("taps", 2048),      # L1 dx
    # NeRV-3M Bunny tail (plan 160x320, layers 24->96->384->48)
    (24, 96, 3, False, "fwd"): ("patches", 4096),
    (24, 96, 3, False, "dw"): ("patches", 1024),
    (96, 24, 3, False, "fwd"): ("taps", 2048),       # L0 dx
    (96, 384, 3, True, "fwd"): ("upatches", 4096),   # 256us vs qpatches 290
    (96, 384, 3, True, "dw"): ("qpatches", 2048),    # 172us vs upatches 202
    # r4 pupatches sweep: NeRV L1 dx 203us (upatches 266), head fwd 146us
    # (upatches 196), head dx 200us (244), head dW 132us (193)
    (384, 96, 3, True, "fwd"): ("pupatches", 2048),  # L1 dx
    (384, 48, 3, True, "fwd"): ("pupatches", 1024),  # head fwd
    (384, 48, 3, True, "dw"): ("pupatches", 2048),   # head dW
    (48, 384, 3, True, "fwd"): ("pupatches", 2048),  # head dx
    # union-sparse (upatches) winners above and below are from the 400-iter
    # production-epilogue sweep 2026-08-19. HNeRV head's three kernels
    # (fwd 331 vs 455 taps; dx 359 vs 416 qpatches; dw 347 vs 488 taps);
    # HNeRV L1 stays qpatches/taps (fwd 747 vs 735; dx 990 vs 836 — the
    # fat-cout geometry already fills the MXU).
    # r4 pupatches sweep: HNeRV head fwd 306us (upatches 331); dx/dW wash
    (592, 48, 3, True, "fwd"): ("pupatches", 2048),  # head fwd
    (592, 48, 3, True, "dw"): ("upatches", 2048),    # head dW
    (48, 592, 3, True, "fwd"): ("upatches", 2048),   # head dx
    # HNeRV UVG f=6 tail (same 160x320/2048 plan geometry; sweep with the
    # production GELU' epilogue, tail_layer_bench --arch hnerv_uvg --bwd):
    # r4 400-iter UVG sweep (fwd + bwd with production epilogues):
    # L0 fwd patches@512 491us (model pick @1024: 546); L0 dx/dw = model
    # picks already best (taps@2048 610, patches@1024 361)
    (56, 400, 5, False, "fwd"): ("patches", 512),
    # L1 dx upatches@256 2841us — replaces the round-3 taps@512 pin
    # (3904us; the qpatches model picks still FAIL Mosaic scoped vmem)
    (1336, 400, 3, True, "fwd"): ("upatches", 256),
    # head fwd: the sweep's pupatches@1024 (1234us vs upatches@512 1392)
    # OOMs Mosaic scoped vmem by 260K under the PRODUCTION bias+mask
    # epilogue (uvg_perf r4 crash) — the kn2row@4096 trap again; no pin,
    # the model's upatches@512 stands. head dx upatches@1024 889us (model
    # qpatches@512: 1041); head dW pupatches@512 1460us — replaces the
    # round-3 taps@512 pin (1980us)
    (112, 1336, 3, True, "fwd"): ("upatches", 1024),
    (1336, 112, 3, True, "dw"): ("pupatches", 512),
    # NeRV UVG f=2 tail (plan 160x320 pad=1; r4 400-iter sweep): L0 fwd
    # patches@4096 133us (model ppatches@2048: 156), L0 dx kn2row@2048
    # 111us (taps@2048: 161), L0 dW patches@2048 59us; L1 fwd qpatches@512
    # 657us (model @1024: 684), L1 dx pupatches@1024 753us (model
    # qpatches@1024: 808); head dx upatches@1024 548us (model
    # qpatches@1024: 678). Head fwd/dW + L1 dW: model picks already best.
    (24, 216, 3, False, "fwd"): ("patches", 4096),
    (216, 24, 3, False, "fwd"): ("kn2row", 2048),
    (24, 216, 3, False, "dw"): ("patches", 2048),
    (216, 864, 3, True, "fwd"): ("qpatches", 512),
    (864, 216, 3, True, "fwd"): ("pupatches", 1024),
    (112, 864, 3, True, "fwd"): ("upatches", 1024),
}

# PNeRV-3M Bunny post-fusion tail (plan 320x640/2048, layers 104->400->16;
# round-5 400-iter sweep, tail_layer_bench --arch pnerv --bwd). Model picks
# already best for L0 dx (taps@2048 1664us) and head dx (upatches@2048
# 987us); the pins below beat them: L0 fwd patches@1024 1579us (model
# taps@1024 1857), L0 dW patches@2048 1016 (taps@2048 1120), head fwd
# kn2row@2048 893 (taps@2048 1101), head dW upatches@2048 906 (taps 1221).
_SWEEP_PINS_PNERV = {
    (104, 400, 3, False, "fwd"): ("patches", 1024),
    (104, 400, 3, False, "dw"): ("patches", 2048),
    (400, 16, 3, True, "fwd"): ("kn2row", 2048),
    # head dW: the sweep's upatches@2048 (906us) OOMs Mosaic scoped vmem by
    # 108K under the production phase-1 backward (the recurring pin trap);
    # @1024 (1064us) still beats the model's taps@2048 (1221us)
    (400, 16, 3, True, "dw"): ("upatches", 1024),
}

# pins apply ONLY at the plan geometry they were measured and
# compile-verified at — a larger crop with the same channel geometry grows
# the input-tile span and could OOM a near-budget pin
_SWEEP_PINS_BY_PLAN = {
    (160, 320, 2048): _SWEEP_PINS,
    (320, 640, 2048): _SWEEP_PINS_PNERV,
}


@lru_cache(maxsize=512)
def _exec_cfg(plan: TailPlan, layer: TailLayer, itemsize: int,
              kind: str) -> ExecCfg:
    """Pick (mode, tm) for a fwd/convT pallas call with one ('fwd1') or two
    ('fwd2') output tensors, or a weight-gradient one ('dw'): padded-MXU-cost
    model over modes, largest tile that fits the VMEM budget, a mild penalty
    for small tiles (per-tile overheads)."""
    taps, cin8, cout8 = layer.taps, layer.cin, layer.cout
    g = plan.guard(layer)

    def rows(n):
        # stationary-tile weight loads amortize over n streamed rows
        return (n + 128) / n

    sp = layer.sparse
    if sp is not None:
        k_o, cin_o, cout_o, qtaps = sp
        f2, k2cin = len(qtaps), k_o * k_o * cin_o
        ucin = len(_union_blocks(sp)) * cin_o      # upatches K dimension

    kdp = taps * _cin_pad(cin8, itemsize)       # dpatches K dimension

    def vmem(mode, tm):
        span = tm + 2 * _r128(g)
        if mode == "dpatches":
            # patches stream straight from HBM (no input-tile buffer)
            v = 2 * kdp * tm * itemsize
        else:
            v = 2 * cin8 * span * itemsize      # double-buffered input
        v += (k2cin * cout_o if mode == "qpatches"
              else ucin * cout8 if mode in ("upatches", "pupatches")
              else kdp * cout8 if mode == "dpatches"
              else taps * cin8 * cout8) * itemsize   # resident weights
        if kind == "dw":
            v += 2 * cout8 * tm * itemsize      # g tiles (double-buffered)
            v += (cout_o * k2cin if mode == "qpatches"
                  else cout8 * ucin if mode in ("upatches", "pupatches")
                  else cout8 * layer.k_dim if mode in ("patches", "ppatches")
                  else cout8 * kdp if mode == "dpatches"
                  else taps * cout8 * cin8) * 4   # accumulated dW
        else:
            n_out = 2 if kind == "fwd2" else 1  # z / gelu(z) output tiles
            v += 2 * n_out * cout8 * tm * itemsize   # outputs (dbuf)
            # fp32 accumulator + epilogue; qpatches assembles group-by-group
            # (one live concat result), so only one accumulator-sized buffer
            v += (1 if mode == "qpatches" else 2) * cout8 * tm * 4
            if mode == "kn2row":
                v += taps * cout8 * span * itemsize  # pre-shift partials
        if mode == "patches":
            v += taps * cin8 * tm * itemsize
        elif mode == "ppatches":
            v += 2 * ((taps + 1) // 2) * cin8 * tm * itemsize  # 2 slots
        elif mode == "qpatches":
            # 2 pipelined slots in the dW kernel, 1 in the fwd
            v += (2 if kind == "dw" else 1) * k2cin * tm * itemsize
        elif mode == "upatches":
            v += ucin * tm * itemsize           # single union slot
        elif mode == "pupatches":
            cin_o_ = sp[1]
            v += 2 * (((ucin // cin_o_ + 1) // 2) * cin_o_) * tm * itemsize
        return v

    def cost(mode, tm):
        if mode == "qpatches":
            # f^2 matmuls sharing one stationary (cout_o, k^2 cin_o) weight:
            # skips the dense packed kernel's zero blocks (f^2 flop waste).
            # The pipeline-fill penalty amortizes across the f^2 back-to-back
            # same-weight matmuls, hence rows(cout_o * f^2).
            c = (f2 * _r128(k2cin) * _r8(cout_o) * rows(_r8(cout_o) * f2)
                 + _ASM_PATCHES * f2 * k2cin)
        elif mode == "upatches":
            # one matmul over the union K of all groups' nonzero blocks:
            # pays cout8 (not cout_o) rows but ~(k+f-1)^2/(kf)^2 of the
            # dense K — the win for tiny-cout_o layers whose groups starve
            # the MXU (head) and for any packed layer with k > f
            c = (_r128(ucin) * cout8 * rows(cout8) + _ASM_PATCHES * ucin)
        elif mode == "pupatches":
            # split-K pipelined upatches: one extra 128-pad on K, half the
            # assembly counted (overlapped with the other chunk's matmul)
            uhK = ((ucin // sp[1] + 1) // 2) * sp[1]
            c = ((_r128(uhK) + _r128(ucin - uhK)) * cout8 * rows(cout8)
                 + _ASM_PATCHES * ucin // 2)
        elif mode == "patches":
            c = (_r128(taps * cin8) * cout8 * rows(cout8)
                 + _ASM_PATCHES * taps * cin8)
        elif mode == "ppatches":
            # split-K pipelined patches: one extra 128-pad on K, assembly
            # overlapped with the other chunk's matmul (half counted)
            th = (taps + 1) // 2
            c = ((_r128(th * cin8) + _r128((taps - th) * cin8)) * cout8
                 * rows(cout8) + _ASM_PATCHES * taps * cin8 // 2)
        elif mode == "dpatches":
            # DMA-assembled patches: no VPU assembly; the DMA re-reads the
            # input taps times from HBM, hidden under compute unless the
            # arithmetic intensity is too low (then the HBM term binds)
            c = max(_r128(kdp) * cout8 * rows(cout8),
                    kdp * itemsize * _HBM_MAC_PER_BYTE)
        elif mode == "taps":
            # back-to-back per-tap dots share pipeline state: weight-load
            # amortization scales with the TOTAL streamed rows, not per-dot
            # (measured: taps beats patches for the 176->56 dx despite 25
            # separate small-R dots)
            c = (taps * _r128(cin8) * cout8 * rows(taps * cout8)
                 + _ASM_TAPS * taps * cin8)
        else:
            span_f = (tm + 2 * _r128(g)) / tm
            c = (_r128(cin8) * taps * cout8 * rows(taps * cout8) * span_f
                 + _ASM_KN2ROW * taps * cout8)
        # mild penalty for small tiles (per-tile fixed overheads)
        return c * (1.0 + 0.2 * (plan.tm / tm - 1.0) / 15.0)

    # debug override for perf experiments, keyed by "cinxcout" (both kinds):
    #   NQ_TAIL_MODE="176x592=taps@512,592x48=kn2row@1024"
    import os
    for item in filter(None, os.environ.get("NQ_TAIL_MODE", "").split(",")):
        key, _, val = item.partition("=")
        if key.strip() == f"{cin8}x{cout8}":
            mode, _, tms = val.partition("@")
            return ExecCfg(mode=mode.strip(),
                           tm=int(tms) if tms else plan.tm)

    # Sweep-verified pins for the flagship tail geometries (bf16 operands,
    # scripts/tail_layer_bench.py --bwd on a v5e chip): where a measured
    # config beats the model's pick, use it directly. Every pinned config
    # compiled and ran on hardware; the guard below skips a pin whose tile
    # does not divide this plan's Mp (other crops fall through to the model).
    pins = _SWEEP_PINS_BY_PLAN.get((plan.h, plan.w, plan.tm))
    pin = (pins or {}).get((cin8, cout8, layer.side, sp is not None,
                            "dw" if kind == "dw" else "fwd"))
    if pin is not None and itemsize == 2:
        return ExecCfg(mode=pin[0], tm=pin[1])

    # NOTE: 'dpatches' (DMA-assembled patches) is implemented and exact but
    # NOT offered here: Mosaic requires HBM DMA slice offsets on the lane
    # axis to be 128-aligned ("failed to prove tile index divisible by the
    # tiling"), and conv tap shifts are +-1/+-Wp. It remains reachable via
    # NQ_TAIL_MODE for interpret-mode tests and future aligned layouts.
    modes = ("patches", "taps") if kind == "dw" else \
        ("patches", "taps", "kn2row")
    if taps >= 2:
        modes = modes + ("ppatches",)
    if sp is not None and _r8(cout_o) >= 16:
        # tiny-row groups (e.g. the 3-channel head) starve the MXU and blow
        # Mosaic's scoped-vmem stack through the f^2-way concat of sub-8-row
        # matmul results — qpatches is only offered with real row counts
        modes = modes + ("qpatches",)
    if sp is not None:
        # upatches has no row-count restriction: one full-cout matmul on
        # the union K (the tiny-row case is exactly where it wins most).
        # Its 2-chunk split-K pipeline 'pupatches' is NOT offered to the
        # model yet — reachable via NQ_TAIL_MODE and _SWEEP_PINS only, like
        # dpatches, until the hardware sweep validates where it wins
        # (an unvalidated default could fail Mosaic mid-calibration)
        modes = modes + ("upatches",)
    best = None
    for mode in modes:
        tm = plan.tm
        while tm > 128 and vmem(mode, tm) > _VMEM_BUDGET:
            tm //= 2
        if vmem(mode, tm) > _VMEM_BUDGET:
            continue
        c = cost(mode, tm)
        if best is None or c < best[0]:
            best = (c, ExecCfg(mode=mode, tm=tm))
    if best is None:
        raise ValueError(
            f"fused tail: no execution mode fits the VMEM budget for "
            f"layer {layer} ({kind}); gate with plan_feasible() and fall "
            f"back to the jnp/XLA path")
    return best[1]


@lru_cache(maxsize=512)
def _split_parts(plan: TailPlan, layer: TailLayer, itemsize: int, kind: str):
    """None when one pallas_call fits the whole layer; otherwise the minimal
    cout-row partition ((lo, rows, sub_layer), ...) where every sub-layer has
    a VMEM-feasible ExecCfg. Raises ValueError when even the finest split
    (one shuffle group / 8 rows) does not fit — e.g. the input tile alone
    exceeds the budget (cin cannot be split: the conv contracts over it).

    Splitting is over OUTPUT rows only: each part re-streams the same input
    and computes a row slice of the output (fwd/dx) or of dW/db, so the
    extra cost is one HBM re-read of the input per additional part — cheap
    next to the matmuls that forced the split (UVG f=6 study, RESULTS.md).
    Sparse layers split at shuffle-group boundaries so each part keeps the
    (k_o, cin_o, cout_o, qtaps-subset) structure qpatches and the
    canonical-dkk scatter rely on."""
    try:
        _exec_cfg(plan, layer, itemsize, kind)
        return None
    except ValueError:
        pass

    def try_parts(bounds_sizes):
        parts = []
        for lo, s in bounds_sizes:
            if layer.sparse is not None:
                k_o, cin_o, cout_o, qtaps = layer.sparse
                g0, g1 = lo // cout_o, (lo + s) // cout_o
                sub = dataclasses.replace(
                    layer, cout=_r8(s),
                    sparse=(k_o, cin_o, cout_o, qtaps[g0:g1]), sparse_t=None)
            else:
                sub = dataclasses.replace(layer, cout=_r8(s), sparse_t=None)
            try:
                _exec_cfg(plan, sub, itemsize, kind)
            except ValueError:
                return None
            parts.append((lo, s, sub))
        return tuple(parts)

    if layer.sparse is not None:
        f2, cout_o = len(layer.sparse[3]), layer.sparse[2]
        for g_parts in range(2, f2 + 1):
            gpp = -(-f2 // g_parts)
            parts = try_parts([
                (g0 * cout_o, (min(g0 + gpp, f2) - g0) * cout_o)
                for g0 in range(0, f2, gpp)])
            if parts:
                return parts
    else:
        for n in range(2, layer.cout // 8 + 1):
            step = -(-(layer.cout // 8) // n) * 8
            parts = try_parts([(lo, min(step, layer.cout - lo))
                               for lo in range(0, layer.cout, step)])
            if parts:
                return parts
    raise ValueError(
        f"fused tail: no execution mode fits the VMEM budget for layer "
        f"{layer} ({kind}), even split to single-group row parts; gate "
        f"with plan_feasible() and fall back to the jnp/XLA path")


def plan_feasible(plan: TailPlan, itemsize: int = 2,
                  allow_split: bool = True) -> bool:
    """True when every layer's FORWARD has a Pallas execution whose working
    set fits the VMEM budget — one call, or (allow_split) a cout-row split
    (_split_parts). Configurations infeasible even split (e.g. an early
    pack start whose double-buffered input tile alone exceeds VMEM) fall
    back to the jnp twin instead of failing at trace time.

    Only the forward gates the plan: the custom-VJP backward falls back to
    jnp PER KERNEL when its dx/dW would need a split (_tail_apply_bwd) —
    split gradient kernels stream the full fat cin and blow Mosaic's scoped
    vmem regardless of the row partition (measured 18.3M vs the 16M limit
    on UVG f=6's L1 dx), while split FORWARDS are hardware-validated
    (221.6 vs 151.2 FPS against the XLA packed path at UVG f=6 —
    scripts/uvg_split_probe.py).

    allow_split=False reports one-call feasibility only (diagnostics)."""
    check = _split_parts if allow_split else _exec_cfg
    try:
        for layer in plan.layers:
            check(plan, layer, itemsize, "fwd1")
    except ValueError:
        return False
    return True


def _bwd_needs_split(plan: TailPlan, layer: TailLayer, itemsize: int,
                     kind: str) -> bool:
    """True when this gradient kernel would run as a cout-row split (or not
    at all): the bwd then uses the jnp fallback for this layer — splitting
    output rows cannot shrink the streamed-input working set that dominates
    the oversized gradient geometries (plan_feasible docstring)."""
    try:
        return _split_parts(plan, layer, itemsize, kind) is not None
    except ValueError:
        return True


@lru_cache(maxsize=64)
def _mask_np(h: int, w: int, pad: int, mp: int) -> np.ndarray:
    """(1, 1, mp) float mask: 1 at interior positions of the padded grid."""
    hp, wp = h + 2 * pad, w + 2 * pad
    m = np.zeros(mp, np.float32)
    rows = np.arange(hp * wp) // wp
    cols = np.arange(hp * wp) % wp
    valid = ((rows >= pad) & (rows < pad + h)
             & (cols >= pad) & (cols < pad + w))
    m[:hp * wp] = valid
    return m.reshape(1, 1, mp)


def border_mask(plan: TailPlan, dtype=jnp.float32, ch: int | None = None):
    """Validity mask for the packed head output. Spatial borders/flat padding
    are zeroed; with `ch` (the REAL packed channel count, plan_and_pack's
    ch return) the sublane-padded channel rows >= ch are zeroed too — they
    carry out_img(0) (= 0.5 for sigmoid/tanh heads), which would otherwise
    leak into a packed-domain loss whenever ch % 8 != 0 (e.g. PNeRV's
    f=2 tail: ch=12 pads to 16 rows)."""
    m = jnp.asarray(_mask_np(plan.h, plan.w, plan.pad, plan.mp), dtype)
    if ch is None or ch == _r8(ch):
        return m
    rows = jnp.arange(_r8(ch))[None, :, None] < ch
    return m * rows.astype(dtype)


# --------------------------------------------------------------------------
# Layout converters (XLA glue)
# --------------------------------------------------------------------------
def nhwc_to_cf(x, plan: TailPlan):
    """(B, H, W, C) -> (B, C8, Mp) channels-first flat with zero borders."""
    b, h, w, c = x.shape
    assert (h, w) == (plan.h, plan.w), (x.shape, plan)
    x = jnp.transpose(x, (0, 3, 1, 2))                       # (B, C, H, W)
    p = plan.pad
    x = jnp.pad(x, ((0, 0), (0, _r8(c) - c), (p, p), (p, p)))
    x = x.reshape(b, _r8(c), plan.hp * plan.wp)
    return jnp.pad(x, ((0, 0), (0, 0), (0, plan.mp - plan.hp * plan.wp)))


def cf_to_nhwc(z, plan: TailPlan, c: int):
    """(B, C8, Mp) -> (B, H, W, C): slice interior + de-flatten."""
    b = z.shape[0]
    p = plan.pad
    z = z[:, :c, :plan.hp * plan.wp].reshape(b, c, plan.hp, plan.wp)
    z = z[:, :, p:p + plan.h, p:p + plan.w]
    return jnp.transpose(z, (0, 2, 3, 1))


def _pack_cf_kernel(x_ref, o_ref):
    """(1, rb, w, c8) NHWC row block -> (1, c8, rb, w) channels-first: the
    in-register transpose that XLA lowers as an element-granularity relayout
    when the input carries a conv-output layout (measured 1.65 ms/frame at
    PNeRV's (320, 640, 100) fuse/tail boundary — the entry-side twin of the
    unpack kernel's round-2 finding)."""
    t = x_ref[0]
    o_ref[0] = jnp.transpose(t, (2, 0, 1)).astype(o_ref.dtype)


def _unpack_cf_kernel(g_ref, o_ref):
    """Transpose of :func:`_pack_cf_kernel`: (1, c8, rb, w) -> (1, rb, w, c8)
    (the cotangent direction)."""
    t = g_ref[0]
    o_ref[0] = jnp.transpose(t, (1, 2, 0)).astype(o_ref.dtype)


_PACK_CF_BUDGET = 8 * 1024 * 1024


def pack_cf_supported(plan: TailPlan, c: int, itemsize: int = 4) -> bool:
    rb = 8
    return (jax.default_backend() == "tpu"
            and rb * plan.w * _r8(c) * (itemsize + 2) <= _PACK_CF_BUDGET)


def _pack_cf_t(x4, out_dtype, kernel):
    """Shared pallas_call for the (B, rb-blocked rows) transpose grid."""
    b, d1, d2, d3 = x4.shape
    rb = 8
    nb = d1 // rb if kernel is _pack_cf_kernel else d2 // rb
    if kernel is _pack_cf_kernel:
        h8, w, c8 = d1, d2, d3
        in_spec = pl.BlockSpec((1, rb, w, c8), lambda l, nb=nb:
                               (l // nb, l % nb, 0, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, c8, rb, w), lambda l, nb=nb:
                                (l // nb, 0, l % nb, 0),
                                memory_space=pltpu.VMEM)
        oshape = (b, c8, h8, w)
    else:
        c8, h8, w = d1, d2, d3
        in_spec = pl.BlockSpec((1, c8, rb, w), lambda l, nb=nb:
                               (l // nb, 0, l % nb, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, rb, w, c8), lambda l, nb=nb:
                                (l // nb, l % nb, 0, 0),
                                memory_space=pltpu.VMEM)
        oshape = (b, h8, w, c8)
    return pl.pallas_call(
        kernel, grid=(b * nb,), in_specs=[in_spec], out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(oshape, out_dtype),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x4)


def pack_cf(x, plan: TailPlan, out_dtype):
    """NHWC (B, h, w, C) -> channels-first (B, C8, Mp) with zero borders —
    :func:`nhwc_to_cf` with the transpose as a Pallas in-register kernel and
    the pad ring as cheap linear XLA pads. LINEAR in x; wrapped in
    linear_call with the mirror kernel as transpose, so jvp (omega HVP) and
    vjp (calibration backward) both work without XLA's relayout."""
    from jax._src.custom_derivatives import linear_call

    b, h, w, c = x.shape
    assert (h, w) == (plan.h, plan.w), (x.shape, plan)
    c8, rb = _r8(c), 8
    h8 = -(-h // rb) * rb
    p = plan.pad

    def fwd(_res, x):
        xp = jnp.pad(x, ((0, 0), (0, h8 - h), (0, 0), (0, c8 - c)))
        t = _pack_cf_t(xp, out_dtype, _pack_cf_kernel)[:, :, :h, :]
        t = jnp.pad(t, ((0, 0), (0, 0), (p, p), (p, p)))
        t = t.reshape(b, c8, plan.hp * plan.wp)
        return jnp.pad(t, ((0, 0), (0, 0),
                           (0, plan.mp - plan.hp * plan.wp)))

    def bwd(_res, g):
        # XLA composition: the mirror Pallas kernel (_unpack_cf_kernel)
        # blows Mosaic's scoped vmem in this direction (26-54M vs the 16M
        # stack limit transposing the minor axis outward at (c8, rb, w)
        # blocks — hit in the UVG and PNeRV calibration backwards), and the
        # cotangent relayout is off the decode path, so the XLA transpose
        # is acceptable here.
        g = g[:, :, :plan.hp * plan.wp].reshape(b, c8, plan.hp, plan.wp)
        g = g[:, :, p:p + h, p:p + w]
        return jnp.transpose(g, (0, 2, 3, 1))[..., :c].astype(x.dtype)

    return linear_call(fwd, bwd, (), x)


def _entry_cf(x, plan: TailPlan, out_dtype):
    """Tail-entry layout conversion: Pallas pack on TPU when the row block
    fits VMEM, else the jnp composition."""
    if pack_cf_supported(plan, x.shape[-1], jnp.dtype(x.dtype).itemsize):
        return pack_cf(x, plan, out_dtype)
    return nhwc_to_cf(x, plan).astype(out_dtype)


def _guard(x, plan: TailPlan, layer: TailLayer, cfg: ExecCfg):
    """Zero guard bands (left = right = the 128-aligned guard G) so every
    tile's DMA slice is in-bounds. ONLY the 'dpatches' mode still streams a
    guarded HBM copy (its per-tap DMA offsets cannot clamp per-tile); every
    other mode reads the unguarded activation directly and handles the
    boundary in VMEM (_stream_tile), skipping this full-array pad copy."""
    g = _r128(plan.guard(layer))
    return jnp.pad(x, ((0, 0), (0, 0),
                       (g, cfg.span(plan, layer) - cfg.tm - g)))


# --------------------------------------------------------------------------
# Weight operand layouts (XLA-level, differentiable transposes of the
# CANONICAL padded packed kernel kk: (side, side, cin8, cout8)).
# --------------------------------------------------------------------------
def _kk_to_op(kk, layer: TailLayer, mode: str, itemsize: int = 2):
    side, _, cin, cout = kk.shape
    if mode == "dpatches":
        # K index = (ty*side + tx) * cin_pad + ci: each tap block padded to
        # the sublane tile so its DMA lands tile-aligned; the pad rows are
        # zero in the weights (the patches scratch holds garbage there)
        cp = _cin_pad(cin, itemsize)
        w = kk.transpose(3, 0, 1, 2).reshape(cout, layer.taps, cin)
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cp - cin)))
        return w.reshape(cout, layer.taps * cp)
    if mode == "qpatches":
        # gather the shared original-kernel operand (cout_o, k^2*cin_o) from
        # group q=0's nonzero blocks (every q holds the same values) —
        # a static gather, differentiable back to the canonical kernel
        k_o, cin_o, cout_o, qtaps = layer.sparse
        blocks = [kk[py, px, gin * cin_o:(gin + 1) * cin_o, :cout_o]
                  for (py, px, gin) in qtaps[0]]
        return jnp.transpose(jnp.concatenate(blocks, axis=0), (1, 0))
    if mode in ("upatches", "pupatches"):
        # union-sparse patches operand (cout, n_u*cin_o): keep ONLY the
        # (tap, input-group) cin_o-row blocks some output group reads
        # (_union_blocks) but ALL output rows — the canonical packed kernel
        # is zero at the blocks a given group does not read, so one matmul
        # covers every group with the union K instead of the dense k^2*f^2
        cin_o = layer.sparse[1]
        blocks = [kk[py, px, gin * cin_o:(gin + 1) * cin_o, :]
                  for (py, px, gin) in _union_blocks(layer.sparse)]
        return jnp.transpose(jnp.concatenate(blocks, axis=0), (1, 0))
    if mode in ("patches", "ppatches", "xpatches"):
        # K index = (ty*side + tx) * cin + ci
        return kk.transpose(3, 0, 1, 2).reshape(cout, layer.k_dim)
    # rows = (ty*side + tx) * cout + co (kn2row) / leading taps dim (taps)
    return kk.transpose(0, 1, 3, 2).reshape(layer.taps, cout, cin)


def _kk_transpose(kk):
    """Canonical kernel of the convT pass: reverse both tap axes, swap
    channel axes."""
    return kk[::-1, ::-1].transpose(0, 1, 3, 2)


def _op_to_kk_grad(dw, layer: TailLayer, mode: str):
    """Map a dW in operand layout back to canonical (side,side,cin,cout)."""
    side = layer.side
    if mode == "qpatches":
        # dw is the ORIGINAL-kernel gradient (cout_o, k^2 cin_o) summed over
        # groups; scatter it at group q=0's canonical positions with zeros
        # elsewhere. Correct because the only canonical-dkk consumer is the
        # pack-gather VJP, which sums dkk over every position holding a given
        # original tap — the per-q split of that sum is immaterial.
        k_o, cin_o, cout_o, qtaps = layer.sparse
        dkk = jnp.zeros((side, side, layer.cin, layer.cout), dw.dtype)
        for t, (py, px, gin) in enumerate(qtaps[0]):
            blk = dw[:, t * cin_o:(t + 1) * cin_o]        # (cout_o, cin_o)
            dkk = dkk.at[py, px, gin * cin_o:(gin + 1) * cin_o,
                         :cout_o].set(jnp.transpose(blk, (1, 0)))
        return dkk
    if mode in ("upatches", "pupatches"):
        # dw is the union-layout gradient (cout, n_u cin_o); scatter each
        # union block back to its canonical position. Rows of blocks a group
        # does not read land at structurally-zero canonical positions the
        # pack-gather VJP never reads (same argument as qpatches above).
        cin_o = layer.sparse[1]
        dkk = jnp.zeros((side, side, layer.cin, layer.cout), dw.dtype)
        for u, (py, px, gin) in enumerate(_union_blocks(layer.sparse)):
            blk = dw[:, u * cin_o:(u + 1) * cin_o]        # (cout, cin_o)
            dkk = dkk.at[py, px, gin * cin_o:(gin + 1) * cin_o, :].set(
                jnp.transpose(blk, (1, 0)))
        return dkk
    if mode in ("patches", "ppatches"):
        dw = dw.reshape(layer.cout, side, side, layer.cin)
        return dw.transpose(1, 2, 3, 0)
    if mode == "dpatches":
        cp = dw.shape[1] // layer.taps
        dw = dw.reshape(layer.cout, side, side, cp)[..., :layer.cin]
        return dw.transpose(1, 2, 3, 0)
    dw = dw.reshape(side, side, layer.cout, layer.cin)
    return dw.transpose(0, 1, 3, 2)


# --------------------------------------------------------------------------
# Pallas kernels. Grid is 1-D over B * n_tiles; the UNGUARDED (B, C, Mp)
# input streams through a 2-slot double-buffered manual DMA (overlapping
# halo windows are inexpressible as BlockSpecs). Tile i's window is
# [i*tm - G, i*tm - G + span) in x coordinates (G = 128-aligned guard);
# the few tiles whose window leaves [0, Mp) — a static set — copy a
# clamped window into the matching VMEM lane offset and zero-fill the
# out-of-range lanes after the wait. This replaces the round-4 design
# where every call padded the full activation into a guarded HBM copy
# (`_guard`, ~400 MB/step of pure pad copies in the HNeRV calibration —
# the "XLA glue" frontier in RESULTS.md r4); semantics are identical
# (the zero-filled lanes hold exactly the values the pad held).
# --------------------------------------------------------------------------
@lru_cache(maxsize=512)
def _boundary_cases(n_tiles, tm, span, guard):
    """Static clamp set: (i, src_start, size, dst_off) for every tile whose
    window leaves [0, Mp). All offsets/sizes are 128-aligned (guard and tm
    are) — Mosaic requires lane-axis DMA offsets to prove 128-divisible."""
    mp = n_tiles * tm
    out = []
    for i in range(n_tiles):
        lo = i * tm - guard
        hi = lo + span
        if lo < 0 or hi > mp:
            clo, chi = max(lo, 0), min(hi, mp)
            out.append((i, clo, chi - clo, clo - lo))
    return tuple(out)


def _dma(x_hbm, x_vmem, sem, l, n_tiles, tm, span, guard, slot, action):
    """Issue (action='start') or await ('wait') tile l's streaming copy.
    Boundary tiles use their static clamped descriptor so the awaited byte
    count matches the started one."""
    b = l // n_tiles
    i = l % n_tiles
    cases = _boundary_cases(n_tiles, tm, span, guard)
    isb = None
    for (bi, src, size, off) in cases:
        p = (i == bi)
        isb = p if isb is None else isb | p

        @pl.when(p)
        def _(src=src, size=size, off=off):
            cp = pltpu.make_async_copy(
                x_hbm.at[b, :, pl.ds(src, size)],
                x_vmem.at[slot, :, pl.ds(off, size)], sem.at[slot])
            getattr(cp, action)()

    if len(cases) == n_tiles:
        return   # tiny plan: every tile clamps; no interior branch to trace

    def _interior():
        cp = pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(pl.multiple_of(i * tm - guard, 128), span)],
            x_vmem.at[slot], sem.at[slot])
        getattr(cp, action)()

    if isb is None:
        _interior()
    else:
        pl.when(jnp.logical_not(isb))(_interior)


def _zero_bands(x_vmem, slot, i, n_tiles, tm, span, guard):
    """Zero the VMEM lanes a boundary tile's clamped DMA did not write
    (the values the old guarded-HBM pad used to hold)."""
    for (bi, _src, size, off) in _boundary_cases(n_tiles, tm, span, guard):
        @pl.when(i == bi)
        def _(size=size, off=off):
            if off > 0:
                x_vmem[slot, :, :off] = jnp.zeros_like(x_vmem[slot, :, :off])
            if off + size < span:
                x_vmem[slot, :, off + size:] = jnp.zeros_like(
                    x_vmem[slot, :, off + size:])


def _stream_tile(x_hbm, x_vmem, sem, *, n_tiles, tm, span, guard):
    """Start next tile's DMA, wait for this tile's; returns its VMEM view."""
    l = pl.program_id(0)
    nl = pl.num_programs(0)

    @pl.when(l == 0)
    def _():
        _dma(x_hbm, x_vmem, sem, l, n_tiles, tm, span, guard, 0, "start")

    @pl.when(l + 1 < nl)
    def _():
        _dma(x_hbm, x_vmem, sem, l + 1, n_tiles, tm, span, guard,
             (l + 1) % 2, "start")

    _dma(x_hbm, x_vmem, sem, l, n_tiles, tm, span, guard, l % 2, "wait")
    _zero_bands(x_vmem, l % 2, l % n_tiles, n_tiles, tm, span, guard)
    return x_vmem[l % 2]


def _gelu_tile_inplace(x_vmem, slot, rows: int, chunk: int = 64):
    """Apply GELU to the streamed (cin, span) VMEM tile in-place, in row
    chunks: one full-tile _gelu would materialize several (cin, span) fp32
    poly temporaries at once (the 592-channel head tile blows Mosaic's
    scoped vmem); chunking bounds the live temporaries to (chunk, span)."""
    for r0 in range(0, rows, chunk):
        r1 = min(r0 + chunk, rows)
        x_vmem[slot, r0:r1, :] = _gelu(x_vmem[slot, r0:r1, :])


def _patch_dmas(x_hbm, p_vmem, sem, l, n_tiles, tm, shifts, cin, cin_p,
                guard, slot):
    """One sliced DMA per tap: HBM row block at the tap's lane shift ->
    the tap's (tile-aligned) row block of the patches buffer. The DMA
    engine does the lane-offset relayout the VPU assembly used to pay for."""
    b = l // n_tiles
    i = l % n_tiles
    return [pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(pl.multiple_of(i * tm, 128) + guard + s, tm)],
        p_vmem.at[slot, pl.ds(t * cin_p, cin), :],
        sem.at[slot]) for t, s in enumerate(shifts)]


def _stream_patches(x_hbm, p_vmem, sem, *, n_tiles, tm, shifts, cin, cin_p,
                    guard):
    """Double-buffered DMA-assembled patches: start next tile's taps while
    waiting for this tile's. Returns the (taps*cin_p, tm) VMEM view."""
    l = pl.program_id(0)
    nl = pl.num_programs(0)
    args = (x_hbm, p_vmem, sem)
    kw = dict(n_tiles=n_tiles, tm=tm, shifts=shifts, cin=cin, cin_p=cin_p,
              guard=guard)

    @pl.when(l == 0)
    def _():
        if cin_p != cin:
            # tap-block pad rows are never DMA'd; zero them once so the
            # (zero-weight) pad contraction can't meet NaN scratch garbage
            p_vmem[...] = jnp.zeros_like(p_vmem)
        for d in _patch_dmas(*args, 0, slot=0, **kw):
            d.start()

    @pl.when(l + 1 < nl)
    def _():
        for d in _patch_dmas(*args, l + 1, slot=(l + 1) % 2, **kw):
            d.start()

    for d in _patch_dmas(*args, l, slot=l % 2, **kw):
        d.wait()
    return p_vmem[l % 2]


def _accumulate(xt, w_ref, patches, *, shifts, guard, tm, mode,
                layer: TailLayer):
    """The conv tile compute: (cout, tm) fp32 accumulator from the guarded
    VMEM tile xt (cin, span) and resident weights."""
    if mode == "qpatches":
        # sparse-aware packed conv: per output subposition group q, one
        # (cout_o, k^2 cin_o) @ (k^2 cin_o, tm) matmul over the k^2 nonzero
        # (shift, input-group) blocks — skips the dense packed kernel's f^2
        # zero-block flop waste (the same weight operand serves every q).
        # Sequential single-slot assembly: the 2-slot pipelined variant
        # (kept in the dW kernel, where it wins 687->650us) measures ~3%
        # SLOWER here — the per-group dot results feeding the concat keep
        # Mosaic from overlapping the next group's copies.
        k_o, cin_o, cout_o, qtaps = layer.sparse
        accs = []
        for qsh in shifts:                     # plan.qshifts(layer)
            for t, (s, gin) in enumerate(qsh):
                patches[0, t * cin_o:(t + 1) * cin_o, :] = (
                    xt[gin * cin_o:(gin + 1) * cin_o,
                       guard + s: guard + s + tm])
            accs.append(jnp.dot(w_ref[...], patches[0],
                                preferred_element_type=jnp.float32))
        acc = jnp.concatenate(accs, axis=0)    # (f^2 * cout_o, tm)
        if acc.shape[0] < layer.cout:
            acc = jnp.concatenate(
                [acc, jnp.zeros((layer.cout - acc.shape[0], tm),
                                jnp.float32)], axis=0)
        return acc
    if mode == "upatches":
        # union-sparse packed conv: assemble each DISTINCT (shift, gin)
        # block once (shifts = plan.ushifts) and run ONE
        # (cout, n_u*cin_o) @ (n_u*cin_o, tm) matmul — the resident weight
        # carries every output group's rows (zero at blocks that group does
        # not read), so this replaces qpatches' f^2 sub-cout_o-row dots and
        # the dense kernel's k^2*f^2 K axis with the n_u-block union: the
        # fix for tile-granularity-bound tiny-row layers like the 48-row
        # head (42 dense K-tiles -> 11).
        cin_o = layer.sparse[1]
        for u, (s, gin) in enumerate(shifts):
            patches[0, u * cin_o:(u + 1) * cin_o, :] = (
                xt[gin * cin_o:(gin + 1) * cin_o, guard + s: guard + s + tm])
        return jnp.dot(w_ref[...], patches[0],
                       preferred_element_type=jnp.float32)
    if mode == "pupatches":
        # pipelined upatches: the union block set split in two half-K
        # chunks, two slots, chunk h+1's VPU assembly overlapped with chunk
        # h's matmul (the ppatches software pipeline applied to the union
        # K axis — hides most of the ~90-100 us/layer assembly cost the
        # xpatches diagnostics isolated). One extra 128-pad on K.
        cin_o = layer.sparse[1]
        n_u = len(shifts)
        uh = (n_u + 1) // 2
        chunks = [tuple(range(uh)), tuple(range(uh, n_u))]

        def asm(h, slot):
            for j, u in enumerate(chunks[h]):
                s, gin = shifts[u]
                patches[slot, j * cin_o:(j + 1) * cin_o, :] = (
                    xt[gin * cin_o:(gin + 1) * cin_o,
                       guard + s: guard + s + tm])

        asm(0, 0)
        acc = None
        for h, ch in enumerate(chunks):
            if not ch:
                continue
            if h + 1 < len(chunks) and chunks[h + 1]:
                asm(h + 1, (h + 1) % 2)
            w = w_ref[:, ch[0] * cin_o: (ch[-1] + 1) * cin_o]
            d = jnp.dot(w, patches[h % 2, :len(ch) * cin_o, :],
                        preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        return acc
    if mode in ("patches", "ppatches"):
        # ppatches: the tap set split in two half-K chunks, two slots,
        # chunk h+1 assembled while chunk h multiplies (same overlap as
        # qpatches above, at the cost of one extra 128-pad on K); a 1-tap
        # layer has no second chunk and degrades to plain patches
        chunks = ([tuple(range(layer.taps))]
                  if mode == "patches" or layer.taps < 2 else
                  [tuple(range(0, (layer.taps + 1) // 2)),
                   tuple(range((layer.taps + 1) // 2, layer.taps))])

        def asm(h, slot):
            for j, t in enumerate(chunks[h]):
                patches[slot, j * layer.cin:(j + 1) * layer.cin, :] = (
                    xt[:, guard + shifts[t]: guard + shifts[t] + tm])

        asm(0, 0)
        acc = None
        for h, ch in enumerate(chunks):
            if h + 1 < len(chunks):
                asm(h + 1, (h + 1) % 2)
            w = w_ref[:, ch[0] * layer.cin: (ch[-1] + 1) * layer.cin]
            d = jnp.dot(w, patches[h % 2, :len(ch) * layer.cin, :],
                        preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        return acc
    if mode == "xpatches":
        # DIAGNOSTIC (NQ_TAIL_MODE only, wrong numerics): the patches matmul
        # against whatever the scratch holds — isolates assembly cost
        return jnp.dot(w_ref[...], patches[0],
                       preferred_element_type=jnp.float32)
    if mode == "xtaps":
        # DIAGNOSTIC (NQ_TAIL_MODE only, wrong numerics): taps matmuls on a
        # single aligned slice — isolates the per-tap lane-rotation cost
        acc = jnp.zeros((layer.cout, tm), jnp.float32)
        xa = xt[:, guard:guard + tm]
        for t in range(layer.taps):
            acc = acc + jnp.dot(w_ref[t], xa,
                                preferred_element_type=jnp.float32)
        return acc
    if mode == "kn2row":
        w = w_ref[...].reshape(layer.taps * layer.cout, layer.cin)
        # store the per-tap partials in the input dtype (bf16 on TPU): the
        # rounding of each partial before the fp32 shift-accumulate is of
        # the same order as the bf16 operand rounding already in the dot,
        # and it halves the (taps*cout, span) VMEM block, enabling the
        # larger lane tiles the head layer wants
        z = jnp.dot(w, xt, preferred_element_type=jnp.float32) \
            .astype(xt.dtype)
        acc = jnp.zeros((layer.cout, tm), jnp.float32)
        for t, s in enumerate(shifts):
            acc = acc + z[t * layer.cout:(t + 1) * layer.cout,
                          guard + s: guard + s + tm].astype(jnp.float32)
        return acc
    acc = jnp.zeros((layer.cout, tm), jnp.float32)
    for t, s in enumerate(shifts):
        acc = acc + jnp.dot(w_ref[t], xt[:, guard + s: guard + s + tm],
                            preferred_element_type=jnp.float32)
    return acc


def _fwd_kernel(x_hbm, w_ref, b_ref, mask_ref, m_ref, z_ref, y_ref,
                *scr, shifts, guard, span, tm, n_tiles,
                mode, layer: TailLayer, out_dtype, act_in: bool = False):
    if mode == "dpatches":
        p_vmem, sem = scr
        pat = _stream_patches(x_hbm, p_vmem, sem, n_tiles=n_tiles, tm=tm,
                              shifts=shifts, cin=layer.cin,
                              cin_p=p_vmem.shape[1] // layer.taps,
                              guard=guard)
        if act_in:
            pat = _gelu(pat)    # elementwise commutes with patch assembly
        acc = jnp.dot(w_ref[...], pat, preferred_element_type=jnp.float32)
    else:
        x_vmem, patches, sem = scr
        _stream_tile(x_hbm, x_vmem, sem, n_tiles=n_tiles, tm=tm, span=span,
                     guard=guard)
        slot = pl.program_id(0) % 2
        if act_in:
            # zero borders stay zero: gelu(0) = 0
            _gelu_tile_inplace(x_vmem, slot, layer.cin)
        xt = x_vmem[slot]
        acc = _accumulate(xt, w_ref, patches, shifts=shifts, guard=guard,
                          tm=tm, mode=mode, layer=layer)
    if b_ref is not None:
        acc = acc + b_ref[...].astype(jnp.float32)
    if m_ref is not None:
        acc = acc * _gelu_grad(m_ref[0])
    # border re-zeroing ('same' zero-padding semantics) and the next layer's
    # activation are kernel epilogues: one evaluation per position, no extra
    # XLA elementwise passes over the activations. z (pre-activation) is only
    # emitted when a VJP needs the residual; pure decode writes gelu(z) alone,
    # halving the output HBM traffic of the fat layers.
    acc = acc * mask_ref[0].astype(jnp.float32)
    if z_ref is not None:
        z_ref[0] = acc.astype(out_dtype)
    if y_ref is not None:
        y_ref[0] = _gelu(acc).astype(out_dtype)


def _dw_kernel(x_hbm, g_ref, dw_ref, db_ref, *scr,
               shifts, guard, span, tm, n_tiles, mode, layer: TailLayer,
               act_in: bool = False):
    if mode == "dpatches":
        p_vmem, sem = scr
        xt = None
        pat = _stream_patches(x_hbm, p_vmem, sem, n_tiles=n_tiles, tm=tm,
                              shifts=shifts, cin=layer.cin,
                              cin_p=p_vmem.shape[1] // layer.taps,
                              guard=guard)
        if act_in:
            pat = _gelu(pat)
    else:
        x_vmem, patches, sem = scr
        _stream_tile(x_hbm, x_vmem, sem, n_tiles=n_tiles, tm=tm, span=span,
                     guard=guard)
        slot = pl.program_id(0) % 2
        if act_in:
            _gelu_tile_inplace(x_vmem, slot, layer.cin)
        xt = x_vmem[slot]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    g = g_ref[0]
    contract = (((1,), (1,)), ((), ()))
    if mode == "dpatches":
        dw_ref[...] += jax.lax.dot_general(
            g, pat, contract, preferred_element_type=jnp.float32)
    elif mode == "qpatches":
        # accumulate the ORIGINAL-kernel gradient (cout_o, k^2 cin_o): per
        # group q, g's q-rows x that q's patches; summed over q and tiles
        # (the canonical-dkk scatter happens in _op_to_kk_grad). Same
        # two-slot assembly/matmul software pipeline as the forward.
        k_o, cin_o, cout_o, _ = layer.sparse

        def asm(q, slot):
            for t, (s, gin) in enumerate(shifts[q]):
                patches[slot, t * cin_o:(t + 1) * cin_o, :] = (
                    xt[gin * cin_o:(gin + 1) * cin_o,
                       guard + s: guard + s + tm])

        asm(0, 0)
        for q in range(len(shifts)):
            if q + 1 < len(shifts):
                asm(q + 1, (q + 1) % 2)
            dw_ref[...] += jax.lax.dot_general(
                g[q * cout_o:(q + 1) * cout_o], patches[q % 2], contract,
                preferred_element_type=jnp.float32)
    elif mode == "upatches":
        # union-layout dW (cout, n_u cin_o) in ONE dot per tile: every
        # output row against the union patches (see _accumulate); blocks a
        # group does not read produce gradient the canonical scatter parks
        # at structurally-zero kernel positions (_op_to_kk_grad)
        cin_o = layer.sparse[1]
        for u, (s, gin) in enumerate(shifts):
            patches[0, u * cin_o:(u + 1) * cin_o, :] = (
                xt[gin * cin_o:(gin + 1) * cin_o, guard + s: guard + s + tm])
        dw_ref[...] += jax.lax.dot_general(
            g, patches[0], contract, preferred_element_type=jnp.float32)
    elif mode == "pupatches":
        # pipelined union dW: two half-union chunks, two slots, next chunk
        # assembled while this one multiplies into its dw column slice
        cin_o = layer.sparse[1]
        n_u = len(shifts)
        uh = (n_u + 1) // 2
        chunks = [tuple(range(uh)), tuple(range(uh, n_u))]

        def asm(h, slot):
            for j, u in enumerate(chunks[h]):
                s, gin = shifts[u]
                patches[slot, j * cin_o:(j + 1) * cin_o, :] = (
                    xt[gin * cin_o:(gin + 1) * cin_o,
                       guard + s: guard + s + tm])

        asm(0, 0)
        for h, ch in enumerate(chunks):
            if not ch:
                continue
            if h + 1 < len(chunks) and chunks[h + 1]:
                asm(h + 1, (h + 1) % 2)
            dw_ref[:, ch[0] * cin_o: (ch[-1] + 1) * cin_o] += \
                jax.lax.dot_general(
                    g, patches[h % 2, :len(ch) * cin_o, :], contract,
                    preferred_element_type=jnp.float32)
    elif mode in ("patches", "ppatches"):
        chunks = ([tuple(range(layer.taps))]
                  if mode == "patches" or layer.taps < 2 else
                  [tuple(range(0, (layer.taps + 1) // 2)),
                   tuple(range((layer.taps + 1) // 2, layer.taps))])

        def asm(h, slot):
            for j, t in enumerate(chunks[h]):
                patches[slot, j * layer.cin:(j + 1) * layer.cin, :] = (
                    xt[:, guard + shifts[t]: guard + shifts[t] + tm])

        asm(0, 0)
        for h, ch in enumerate(chunks):
            if h + 1 < len(chunks):
                asm(h + 1, (h + 1) % 2)
            dw_ref[:, ch[0] * layer.cin: (ch[-1] + 1) * layer.cin] += \
                jax.lax.dot_general(
                    g, patches[h % 2, :len(ch) * layer.cin, :], contract,
                    preferred_element_type=jnp.float32)
    else:
        for t, s in enumerate(shifts):
            dw_ref[t] += jax.lax.dot_general(
                g, xt[:, guard + s: guard + s + tm], contract,
                preferred_element_type=jnp.float32)
    db_ref[...] += jnp.sum(g.astype(jnp.float32), axis=1, keepdims=True)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _scratch(plan, layer, cfg, dtype, dw=False):
    span = cfg.span(plan, layer)
    if cfg.mode == "dpatches":
        cp = _cin_pad(layer.cin, jnp.dtype(dtype).itemsize)
        return [
            pltpu.VMEM((2, layer.taps * cp, cfg.tm), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if cfg.mode == "qpatches":
        # 2 slots only for the pipelined dW kernel; the fwd assembles
        # group-by-group into one slot (see _accumulate)
        k_o, cin_o, _, _ = layer.sparse
        pat = pltpu.VMEM((2 if dw else 1, k_o * k_o * cin_o, cfg.tm), dtype)
    elif cfg.mode == "upatches":
        cin_o = layer.sparse[1]
        pat = pltpu.VMEM((1, len(_union_blocks(layer.sparse)) * cin_o,
                          cfg.tm), dtype)
    elif cfg.mode == "pupatches":
        cin_o = layer.sparse[1]
        n_u = len(_union_blocks(layer.sparse))
        pat = pltpu.VMEM((2, ((n_u + 1) // 2) * cin_o, cfg.tm), dtype)
    elif cfg.mode == "ppatches":
        pat = pltpu.VMEM((2, ((layer.taps + 1) // 2) * layer.cin, cfg.tm),
                         dtype)
    elif cfg.mode in ("patches", "xpatches"):
        pat = pltpu.VMEM((1, layer.k_dim, cfg.tm), dtype)
    else:
        pat = pltpu.VMEM((1, 8, 128), dtype)                  # unused stub
    return [
        pltpu.VMEM((2, layer.cin, span), dtype),
        pat,
        pltpu.SemaphoreType.DMA((2,)),
    ]


def _conv_cf(x, kk, bias, out_mul, plan: TailPlan, layer: TailLayer,
             out_dtype, emit: str = "z", act_in: bool = False):
    """One channels-first conv layer: x (B, cin, Mp) -> masked pre-activation
    'z' (B, cout, Mp), its activation 'y' = gelu(z), or the pair 'zy'
    (legacy residual+activation pair). act_in applies GELU to the streamed
    input tile in-kernel (the VJP-fwd chain passes pre-activation z between
    layers). out_mul (B, cout, Mp) triggers the convT GELU' epilogue.

    A layer whose working set exceeds VMEM in every mode executes as a
    cout-row split (_split_parts): one pallas_call per row part, each with
    its canonical-kernel column slice, concatenated back. The input streams
    from HBM once per part; weights/accumulators shrink by the part count
    (what made UVG's f=6 plan infeasible in one call — RESULTS.md)."""
    parts = _split_parts(plan, layer, jnp.dtype(x.dtype).itemsize,
                         "fwd2" if emit == "zy" else "fwd1")
    if parts is not None:
        outs = []
        for lo, s, sub in parts:
            kk_s = jnp.pad(kk[..., lo:lo + s],
                           ((0, 0), (0, 0), (0, 0), (0, sub.cout - s)))
            b_s = (None if bias is None else
                   jnp.pad(bias[lo:lo + s], ((0, sub.cout - s), (0, 0))))
            m_s = (None if out_mul is None else
                   jnp.pad(out_mul[:, lo:lo + s, :],
                           ((0, 0), (0, sub.cout - s), (0, 0))))
            outs.append(_conv_cf_one(x, kk_s, b_s, m_s, plan, sub,
                                     out_dtype, emit, act_in))

        def cat(arrs):
            full = jnp.concatenate(
                [a[:, :s, :] for a, (lo, s, sub) in zip(arrs, parts)], axis=1)
            return jnp.pad(full, ((0, 0), (0, layer.cout - full.shape[1]),
                                  (0, 0)))

        if emit == "zy":
            return cat([o[0] for o in outs]), cat([o[1] for o in outs])
        return cat(outs)
    return _conv_cf_one(x, kk, bias, out_mul, plan, layer, out_dtype, emit,
                        act_in)


def _conv_cf_one(x, kk, bias, out_mul, plan: TailPlan, layer: TailLayer,
                 out_dtype, emit: str = "z", act_in: bool = False):
    """Single-pallas_call body of :func:`_conv_cf` (layer fits VMEM)."""
    b = x.shape[0]
    cfg = _exec_cfg(plan, layer, jnp.dtype(x.dtype).itemsize,
                    "fwd2" if emit == "zy" else "fwd1")
    xg = _guard(x, plan, layer, cfg) if cfg.mode == "dpatches" else x
    wm = _kk_to_op(kk, layer, cfg.mode, jnp.dtype(x.dtype).itemsize)
    nt = plan.mp // cfg.tm
    mask = border_mask(plan, out_dtype).reshape(1, plan.mp)
    kern = partial(_fwd_kernel,
                   shifts=(plan.qshifts(layer) if cfg.mode == "qpatches"
                           else plan.ushifts(layer)
                           if cfg.mode in ("upatches", "pupatches")
                           else plan.shifts(layer)),
                   guard=_r128(plan.guard(layer)), span=cfg.span(plan, layer),
                   tm=cfg.tm, n_tiles=nt, mode=cfg.mode, layer=layer,
                   out_dtype=out_dtype, act_in=act_in)
    grid = (b * nt,)
    x_spec = pl.BlockSpec(memory_space=pl.ANY)
    w_spec = pl.BlockSpec(wm.shape, lambda l: (0,) * wm.ndim,
                          memory_space=pltpu.VMEM)
    blk3 = lambda c: pl.BlockSpec(
        (1, c, cfg.tm), lambda l: (l // nt, 0, l % nt),
        memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, cfg.tm), lambda l: (0, l % nt),
                             memory_space=pltpu.VMEM)
    in_specs, args = [x_spec, w_spec], [xg, wm]
    if bias is not None:
        in_specs.append(pl.BlockSpec((layer.cout, 1), lambda l: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias)
    in_specs.append(mask_spec)
    args.append(mask)
    if out_mul is not None:
        in_specs.append(blk3(layer.cout))
        args.append(out_mul)
    n_out = 2 if emit == "zy" else 1

    def k2(*refs):
        ins = list(refs[:len(args)])
        rest = list(refs[len(args):])
        x_r, w_r = ins[0], ins[1]
        i = 2
        b_r = ins[i] if bias is not None else None
        i += bias is not None
        mk_r = ins[i]
        i += 1
        m_r = ins[i] if out_mul is not None else None
        outs, scr = rest[:n_out], rest[n_out:]
        if emit == "zy":
            z_r, y_r = outs
        elif emit == "y":
            z_r, y_r = None, outs[0]
        else:
            z_r, y_r = outs[0], None
        kern(x_r, w_r, b_r, mk_r, m_r, z_r, y_r, *scr)

    oshape = jax.ShapeDtypeStruct((b, layer.cout, plan.mp), out_dtype)
    out = pl.pallas_call(
        k2, grid=grid, in_specs=in_specs,
        out_specs=(blk3(layer.cout),) * n_out if n_out > 1
        else blk3(layer.cout),
        out_shape=(oshape,) * n_out if n_out > 1 else oshape,
        scratch_shapes=_scratch(plan, layer, cfg, xg.dtype),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(*args)
    return out


def _conv_cf_dw(x, g, plan: TailPlan, layer: TailLayer,
                act_in: bool = False):
    """dW/db for one layer: x input (B, cin, Mp), g cotangent (B, cout, Mp)
    -> (canonical dkk fp32, db (cout, 1) fp32). act_in applies GELU to the
    streamed x tile in-kernel (the stored residuals are pre-activation),
    replacing a full-array XLA gelu materialization per layer in the bwd.

    VMEM-oversized layers run as a cout-row split (see _conv_cf): each part
    sees its g row slice, accumulates its dW/db block, and the canonical
    dkk column slices concatenate back (for qpatches parts the scatter
    lands at the part's first group — the pack-gather VJP consumer sums
    over group positions, so the per-part placement is immaterial, same
    argument as _op_to_kk_grad's)."""
    parts = _split_parts(plan, layer, jnp.dtype(x.dtype).itemsize, "dw")
    if parts is not None:
        dkks, dbs = [], []
        for lo, s, sub in parts:
            g_s = jnp.pad(g[:, lo:lo + s, :],
                          ((0, 0), (0, sub.cout - s), (0, 0)))
            dkk, db = _conv_cf_dw_one(x, g_s, plan, sub, act_in)
            dkks.append(dkk[..., :s])
            dbs.append(db[:s])
        dkk = jnp.concatenate(dkks, axis=3)
        db = jnp.concatenate(dbs, axis=0)
        return (jnp.pad(dkk, ((0, 0), (0, 0), (0, 0),
                              (0, layer.cout - dkk.shape[3]))),
                jnp.pad(db, ((0, layer.cout - db.shape[0]), (0, 0))))
    return _conv_cf_dw_one(x, g, plan, layer, act_in)


def _conv_cf_dw_one(x, g, plan: TailPlan, layer: TailLayer,
                    act_in: bool = False):
    """Single-pallas_call body of :func:`_conv_cf_dw` (layer fits VMEM)."""
    b = x.shape[0]
    cfg = _exec_cfg(plan, layer, jnp.dtype(x.dtype).itemsize, "dw")
    xg = _guard(x, plan, layer, cfg) if cfg.mode == "dpatches" else x
    nt = plan.mp // cfg.tm
    if cfg.mode == "qpatches":
        k_o, cin_o, cout_o, _ = layer.sparse
        dw_shape = (cout_o, k_o * k_o * cin_o)
        dw_spec = pl.BlockSpec(dw_shape, lambda l: (0, 0),
                               memory_space=pltpu.VMEM)
    elif cfg.mode in ("upatches", "pupatches"):
        cin_o = layer.sparse[1]
        dw_shape = (layer.cout, len(_union_blocks(layer.sparse)) * cin_o)
        dw_spec = pl.BlockSpec(dw_shape, lambda l: (0, 0),
                               memory_space=pltpu.VMEM)
    elif cfg.mode in ("patches", "ppatches"):
        dw_shape = (layer.cout, layer.k_dim)
        dw_spec = pl.BlockSpec(dw_shape, lambda l: (0, 0),
                               memory_space=pltpu.VMEM)
    elif cfg.mode == "dpatches":
        cp = _cin_pad(layer.cin, jnp.dtype(x.dtype).itemsize)
        dw_shape = (layer.cout, layer.taps * cp)
        dw_spec = pl.BlockSpec(dw_shape, lambda l: (0, 0),
                               memory_space=pltpu.VMEM)
    else:
        dw_shape = (layer.taps, layer.cout, layer.cin)
        dw_spec = pl.BlockSpec(dw_shape, lambda l: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    kern = partial(_dw_kernel,
                   shifts=(plan.qshifts(layer) if cfg.mode == "qpatches"
                           else plan.ushifts(layer)
                           if cfg.mode in ("upatches", "pupatches")
                           else plan.shifts(layer)),
                   guard=_r128(plan.guard(layer)), span=cfg.span(plan, layer),
                   tm=cfg.tm, n_tiles=nt, mode=cfg.mode, layer=layer,
                   act_in=act_in)
    dw, db = pl.pallas_call(
        kern, grid=(b * nt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, layer.cout, cfg.tm),
                               lambda l: (l // nt, 0, l % nt),
                               memory_space=pltpu.VMEM)],
        out_specs=(dw_spec,
                   pl.BlockSpec((layer.cout, 1), lambda l: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct(dw_shape, jnp.float32),
                   jax.ShapeDtypeStruct((layer.cout, 1), jnp.float32)),
        scratch_shapes=_scratch(plan, layer, cfg, xg.dtype, dw=True),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(xg, g)
    return _op_to_kk_grad(dw, layer, cfg.mode), db


# --------------------------------------------------------------------------
# jnp reference implementation (test oracle + non-TPU fallback path)
# --------------------------------------------------------------------------
def _conv_cf_jnp(x, kk, bias, out_mul, plan: TailPlan, layer: TailLayer,
                 out_dtype, emit: str = "z", act_in: bool = False):
    if act_in:
        x = _gelu(x)
    shifts = plan.shifts(layer)
    g = plan.guard(layer)
    wm = _kk_to_op(kk, layer, "taps")
    xt = jnp.pad(x, ((0, 0), (0, 0), (g, g)))
    pats = jnp.stack([xt[:, :, g + s: g + s + plan.mp] for s in shifts],
                     axis=1)                       # (B, taps, cin, Mp)
    acc = jnp.einsum("toc,btcm->bom", wm, pats,
                     preferred_element_type=jnp.float32)
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)[None]
    if out_mul is not None:
        acc = acc * _gelu_grad(out_mul)
    acc = acc * border_mask(plan, jnp.float32)
    if emit == "y":
        return _gelu(acc).astype(out_dtype)
    z = acc.astype(out_dtype)
    if emit == "zy":
        return z, _gelu(acc).astype(out_dtype)
    return z


def _conv_cf_dw_jnp(x, g, plan: TailPlan, layer: TailLayer,
                    act_in: bool = False):
    """jnp fallback for :func:`_conv_cf_dw` on gradient geometries whose
    Pallas kernel would need a cout-row split (see _bwd_needs_split):
    differentiate the jnp twin w.r.t. (kk, bias) at zero — the forward is
    linear in both, so the VJP at any point is the exact gradient, and it
    lands directly in the canonical (side, side, cin8, cout8) layout."""
    kk0 = jnp.zeros((layer.side, layer.side, layer.cin, layer.cout),
                    jnp.float32)
    b0 = jnp.zeros((layer.cout, 1), jnp.float32)

    def f(kk, bias):
        return _conv_cf_jnp(x, kk, bias, None, plan, layer, jnp.float32,
                            emit="z", act_in=act_in)

    _, vjp = jax.vjp(f, kk0, b0)
    dkk, db = vjp(g.astype(jnp.float32))
    return dkk, db


# --------------------------------------------------------------------------
# Fused tail apply with custom VJP (primal weights: canonical padded kks)
# --------------------------------------------------------------------------
def _tail_fwd_impl(plan: TailPlan, conv, x_cf, kks, biases,
                   keep_residuals: bool = True):
    """Primal/decode path (keep_residuals=False): each layer emits only what
    the next consumes -- gelu(z) in-kernel -- halving output HBM traffic vs
    a z+y pair. VJP-fwd path (keep_residuals=True): each layer emits ONLY
    the pre-activation z it must store as a residual, and the NEXT layer
    applies GELU to its streamed input tile in-kernel (act_in) -- the same
    activation count as the primal, without the second (cout, Mp) output the
    old 'zy' emission wrote to HBM per fat layer (measured ~150us/frame on
    the 176->592 layer alone)."""
    h = x_cf
    residuals = [x_cf]
    for li, layer in enumerate(plan.layers):
        next_act = (li < len(plan.layers) - 1
                    and plan.layers[li + 1].gelu_in)
        if keep_residuals:
            h = conv(h, kks[li], biases[li], None, plan, layer, x_cf.dtype,
                     emit="z", act_in=layer.gelu_in)
            if li < len(plan.layers) - 1:
                residuals.append(h)
        else:
            h = conv(h, kks[li], biases[li], None, plan, layer, x_cf.dtype,
                     emit="y" if next_act else "z")
    return h, residuals


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def tail_apply(plan: TailPlan, x_cf, kks, biases):
    """Run the fused tail: x_cf (B, C0_8, Mp) channels-first (zero borders)
    -> pre-activation head output (B, C_last_8, Mp), borders zeroed.

    kks/biases: per-layer canonical packed kernels (side, side, cin8, cout8)
    and biases (cout8, 1) from :func:`plan_and_pack`. Layer 0 consumes x_cf
    as-is (post-activation input); layers 1..n apply GELU in-kernel (their
    inputs are stored pre-activation)."""
    out, _ = _tail_fwd_impl(plan, _conv_cf, x_cf, tuple(kks), tuple(biases),
                            keep_residuals=False)
    return out


def _tail_apply_fwd(plan, x_cf, kks, biases):
    out, residuals = _tail_fwd_impl(plan, _conv_cf, x_cf, tuple(kks),
                                    tuple(biases))
    return out, (tuple(residuals), tuple(kks), tuple(biases))


def _tail_apply_bwd(plan, res, g_out):
    """Backward: Pallas dW/dx kernels per layer, except gradient geometries
    that would need the cout-row split — those use the jnp fallbacks (the
    split cannot shrink their streamed-input working set and Mosaic's scoped
    vmem overflows; _bwd_needs_split). Forward split kernels stay Pallas."""
    residuals, kks, biases = res
    itemsize = jnp.dtype(g_out.dtype).itemsize
    mask = border_mask(plan, g_out.dtype)
    g = g_out * mask
    dkks, dbs = [None] * len(plan.layers), [None] * len(plan.layers)
    for li in range(len(plan.layers) - 1, -1, -1):
        layer = plan.layers[li]
        x_in = residuals[li]
        if _bwd_needs_split(plan, layer, itemsize, "dw"):
            dkk, db = _conv_cf_dw_jnp(x_in, g, plan, layer,
                                      act_in=layer.gelu_in)
        else:
            dkk, db = _conv_cf_dw(x_in, g, plan, layer,
                                  act_in=layer.gelu_in)
        dkks[li] = dkk.astype(kks[li].dtype)
        dbs[li] = (db.astype(biases[li].dtype)
                   if biases[li] is not None else None)
        out_mul = x_in if layer.gelu_in else None
        lt = layer.transposed()
        conv_dx = (_conv_cf_jnp if _bwd_needs_split(plan, lt, itemsize,
                                                    "fwd1") else _conv_cf)
        g = conv_dx(g, _kk_transpose(kks[li]), None, out_mul, plan, lt,
                    g.dtype)
    return g, tuple(dkks), tuple(dbs)


tail_apply.defvjp(_tail_apply_fwd, _tail_apply_bwd)


def tail_apply_jnp(plan: TailPlan, x_cf, kks, biases):
    """Pure-jnp twin of :func:`tail_apply` (jax autodiff supplies the VJP) —
    the test oracle, and the path used on non-TPU backends where the Pallas
    interpreter would be slow."""
    out, _ = _tail_fwd_impl(plan, _conv_cf_jnp, x_cf, tuple(kks),
                            tuple(biases), keep_residuals=False)
    return out


# --------------------------------------------------------------------------
# HVP-capable execution ('pallas_hvp'): forward-mode support for the fused
# tail, so Hessian-vector products (Omega sensitivity, bit_assign.py:57-118)
# run the Pallas kernels instead of falling back to the XLA packed path.
#
# jax.custom_vjp is strictly first-order (differentiating its fwd rule tries
# to jvp the raw pallas_call and fails), so neither jvp-over-grad nor
# grad-of-grad can pass through tail_apply. The workable factoring is
# reverse-over-FORWARD: Hv = grad(w -> jvp(L, w, v)), where
#   * the jvp through the tail is supplied by a custom_jvp rule
#     (tail_apply_fo) whose tangent propagation is hand-written from conv_p
#     calls — the conv is bilinear, dz = conv(dx, W) + conv(x, dW) + db,
#     with GELU/GELU' as XLA elementwise ops, and
#   * the outer grad then reverse-differentiates that graph ONCE: every op
#     in it is either XLA (differentiable) or conv_p, a first-order
#     custom_vjp primitive whose backward runs the production Pallas dx/dW
#     kernels (jnp fallbacks exactly where the production backward uses
#     them, _bwd_needs_split).
# No second-order autodiff ever touches a Pallas call.
# --------------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def conv_p(plan: TailPlan, layer: TailLayer, x, kk, bias):
    """One masked channels-first conv z = mask * (conv(x, kk) + bias) as a
    first-order-differentiable primitive. bias may be None. No activation
    epilogues: the HVP composition applies GELU as XLA elementwise ops —
    this path runs only the ~10-batch sensitivity stage, not the
    calibration hot loop."""
    return _conv_cf(x, kk, bias, None, plan, layer, x.dtype, emit="z")


def _conv_p_fwd(plan, layer, x, kk, bias):
    z = _conv_cf(x, kk, bias, None, plan, layer, x.dtype, emit="z")
    return z, (x, kk, bias is not None)


def _conv_p_bwd(plan, layer, res, g):
    x, kk, has_bias = res
    itemsize = jnp.dtype(g.dtype).itemsize
    g = g * border_mask(plan, g.dtype)
    if _bwd_needs_split(plan, layer, itemsize, "dw"):
        dkk, db = _conv_cf_dw_jnp(x, g, plan, layer)
    else:
        dkk, db = _conv_cf_dw(x, g, plan, layer)
    lt = layer.transposed()
    if _bwd_needs_split(plan, lt, itemsize, "fwd1"):
        dx = _conv_cf_jnp(g, _kk_transpose(kk), None, None, plan, lt, g.dtype)
    else:
        dx = _conv_cf(g, _kk_transpose(kk), None, None, plan, lt, g.dtype)
    return (dx, dkk.astype(kk.dtype),
            db.astype(g.dtype) if has_bias else None)


conv_p.defvjp(_conv_p_fwd, _conv_p_bwd)


@partial(jax.custom_jvp, nondiff_argnums=(0,))
def tail_apply_fo(plan: TailPlan, x_cf, kks, biases):
    """Forward-mode-capable twin of :func:`tail_apply` (see block comment).
    Primal evaluation is the production fused forward; under jax.jvp the
    custom rule below propagates (value, tangent) pairs layer by layer with
    conv_p matmuls and exact XLA GELU/GELU'.

    Supported transforms: eval, jax.jvp, and grad-OF-jvp (the HVP). Plain
    jax.grad is NOT supported (it would transpose the tangent graph through
    conv_p's custom_vjp — NotImplementedError); use tail_apply for ordinary
    gradients."""
    out, _ = _tail_fwd_impl(plan, _conv_cf, x_cf, tuple(kks), tuple(biases),
                            keep_residuals=False)
    return out


@tail_apply_fo.defjvp
def _tail_apply_fo_jvp(plan, primals, tangents):
    x_cf, kks, biases = primals
    dx_cf, dkks, dbiases = tangents
    h, dh = x_cf, dx_cf
    for li, layer in enumerate(plan.layers):
        if layer.gelu_in:
            hf = h.astype(jnp.float32)
            dh = (_gelu_grad(hf) * dh.astype(jnp.float32)).astype(h.dtype)
            h = _gelu(h)
        z = conv_p(plan, layer, h, kks[li], biases[li])
        dz = conv_p(plan, layer, dh, kks[li], None) \
            + conv_p(plan, layer, h, dkks[li],
                     None if biases[li] is None else dbiases[li])
        h, dh = z, dz.astype(z.dtype)
    return h, dh


# --------------------------------------------------------------------------
# Plan building + weight packing
# --------------------------------------------------------------------------
@lru_cache(maxsize=64)
def _make_plan(h: int, w: int, geoms: Tuple, tm: int) -> TailPlan:
    pad = max(max(off, side - 1 - off) for side, off, *_ in geoms)
    layers = []
    for li, (side, off, cin_raw, cout_raw, spp) in enumerate(geoms):
        sparse = sparse_t = None
        if spp is not None:
            k_o, cin_o, cout_o, qt_fwd, qt_t = spp
            sparse = (k_o, cin_o, cout_o, qt_fwd)
            sparse_t = (k_o, cout_o, cin_o, qt_t)
        layers.append(TailLayer(
            cin=_r8(cin_raw), cout=_r8(cout_raw), side=side, off=off,
            gelu_in=li > 0, sparse=sparse, sparse_t=sparse_t))
    return TailPlan(h=h, w=w, pad=pad, tm=tm, layers=tuple(layers))


def _pad_kk(kk, cin8: int, cout8: int):
    return jnp.pad(kk, ((0, 0), (0, 0), (0, cin8 - kk.shape[2]),
                        (0, cout8 - kk.shape[3])))


def plan_geometry(h: int, w: int, block_geoms, head_geom, tm: int = 0):
    """TailPlan from pure shape info — no weight arrays, no device work.

    block_geoms: [(k, cin, cout*r*r, r), ...] mirroring plan_and_pack's
    blocks; head_geom: (k, cin, cout). Returns (plan, f_final). Used by
    packed_decode.resolve_pack_start to test fused-tail VMEM feasibility
    of a candidate pack start before committing to it (equivalence with
    plan_and_pack's plan is asserted in tests/test_tail_fused.py)."""
    from neuroquant_tpu.ops.packed_decode import (
        compose_shuffle_perm, identity_perm, packed_kernel_geometry,
        packed_sparse_taps,
    )

    def sspec(k, ff, prm, cin_o, cout_o):
        key = tuple(int(v) for v in prm) if prm is not None else None
        qt_fwd, qt_t = packed_sparse_taps(int(k), int(ff), key)
        return (int(k), int(cin_o), int(cout_o), qt_fwd, qt_t)

    tm = tm or _auto_tm(h, w)
    f, perm = 1, None
    geoms = []
    for (k, cin, cout_rr, r) in block_geoms:
        k, cin, cout_rr, r = int(k), int(cin), int(cout_rr), int(r)
        if f == 1:
            geoms.append((k, (k - 1) // 2, cin, cout_rr, None))
        else:
            kp, off = packed_kernel_geometry(k, f)
            geoms.append((kp, off, cin * f * f, cout_rr * f * f,
                          sspec(k, f, perm, cin, cout_rr)))
        perm = compose_shuffle_perm(identity_perm(f), f, r)
        f *= r
    kh, cin_h, cout_h = (int(v) for v in head_geom)
    kp, off = packed_kernel_geometry(kh, f)
    geoms.append((kp, off, cin_h * f * f, cout_h * f * f,
                  sspec(kh, f, perm, cin_h, cout_h)))
    return _make_plan(h, w, tuple(geoms), tm), f


def plan_and_pack(h: int, w: int, blocks, head, tm: int = 0):
    """Build the static TailPlan + per-layer canonical kernel operands for a
    decoder tail entered UNPACKED at resolution (h, w).

    blocks: [(w_hwio (k, k, cin, cout*r*r), bias (cout*r*r,) | None, r), ...]
        the tail NeRVBlock convs from pack_start on (reference semantics:
        conv -> PixelShuffle(r) -> GELU, models/_layers.py:20-36);
    head:   (w_hwio (k, k, cin, c_out), bias | None) final stride-1 conv.

    Returns (plan, kks, biases, f_final, head_cout_packed). All packing /
    relabeling reuses ops/packed_decode (pure gathers — differentiable), so
    fake-quantized weights flow through unchanged.
    """
    from neuroquant_tpu.ops.packed_decode import (
        compose_shuffle_perm, identity_perm, pack_conv_kernel,
        packed_kernel_geometry, packed_sparse_taps,
    )

    def sparse_spec(k, ff, prm, cin_o, cout_o):
        """(k, cin_o, cout_o, qtaps_fwd, qtaps_t) for an f>=2-packed layer."""
        key = tuple(int(v) for v in prm) if prm is not None else None
        qt_fwd, qt_t = packed_sparse_taps(int(k), int(ff), key)
        return (int(k), int(cin_o), int(cout_o), qt_fwd, qt_t)

    tm = tm or _auto_tm(h, w)
    f, perm = 1, None
    kks, bbs, geoms = [], [], []
    for (w_hwio, bias, r) in blocks:
        kh, kw, cin, cout_rr = w_hwio.shape
        assert kh == kw and kh % 2 == 1, w_hwio.shape
        cout = cout_rr // (r * r)
        # relabel conv output channels shuffle-subposition-major, exactly as
        # upsample_conv_packed does (packed_decode.py:273-283)
        wrel = (w_hwio.reshape(kh, kw, cin, cout, r, r)
                .transpose(0, 1, 2, 4, 5, 3).reshape(kh, kw, cin, cout_rr))
        brel = None
        if bias is not None:
            brel = bias.reshape(cout, r, r).transpose(1, 2, 0).reshape(-1)
        if f == 1:
            kk, off, spp = wrel, (kh - 1) // 2, None
        else:
            kk = pack_conv_kernel(wrel, f, in_perm=perm, out_perm=None)
            _, off = packed_kernel_geometry(kh, f)
            spp = sparse_spec(kh, f, perm, cin, cout_rr)
            if brel is not None:
                brel = jnp.tile(brel, f * f)
        kks.append(kk)
        bbs.append(brel)
        geoms.append((kk.shape[0], off, kk.shape[2], kk.shape[3], spp))
        perm = compose_shuffle_perm(identity_perm(f), f, r)
        f *= r
    wh, bh = head
    khh = wh.shape[0]
    kk = pack_conv_kernel(wh, f, in_perm=perm, out_perm=None)
    _, off = packed_kernel_geometry(khh, f)
    kks.append(kk)
    bbs.append(jnp.tile(bh, f * f) if bh is not None else None)
    geoms.append((kk.shape[0], off, kk.shape[2], kk.shape[3],
                  sparse_spec(khh, f, perm, wh.shape[2], wh.shape[3])
                  if f > 1 else None))

    plan = _make_plan(h, w, tuple(geoms), tm)
    kks_p, bms = [], []
    for kk, bb, layer in zip(kks, bbs, plan.layers):
        kks_p.append(_pad_kk(kk, layer.cin, layer.cout))
        bms.append(jnp.pad(bb, (0, layer.cout - bb.shape[0]))
                   .reshape(layer.cout, 1) if bb is not None else None)
    return plan, tuple(kks_p), tuple(bms), f, kks[-1].shape[3]


# --------------------------------------------------------------------------
# Model-facing entry points
# --------------------------------------------------------------------------
def _auto_tm(h: int, w: int) -> int:
    return 2048 if h * w >= 16384 else (512 if h * w >= 4096 else 128)


def resolve_impl(fused_tail: str) -> str | None:
    """cfg 'fused_tail' knob -> 'pallas' | 'jnp' | None (use the XLA packed
    path). 'auto' selects the Pallas kernels on TPU and the XLA packed path
    elsewhere (tests force 'pallas'/'jnp' explicitly)."""
    ft = str(fused_tail).lower()
    if ft in ("off", "false", "none", "xla"):
        return None
    if ft == "auto":
        return "pallas" if jax.default_backend() == "tpu" else None
    if ft in ("pallas", "jnp", "pallas_hvp"):
        return ft
    raise ValueError(
        f"fused_tail={fused_tail!r} (use auto|pallas|pallas_hvp|jnp|off)")


def _mxu_cast(x_cf, kks, bms, out_dtype):
    """Match XLA's default-precision conv semantics: on TPU an fp32 conv
    already runs single-pass bf16 MXU with fp32 accumulation, while an
    in-kernel fp32 jnp.dot runs the slow multi-pass decomposition. Cast the
    matmul operands to bf16 (accumulation stays fp32 via
    preferred_element_type); the caller casts the result back."""
    if out_dtype != jnp.float32 or jax.default_backend() != "tpu":
        return x_cf, kks, bms, out_dtype
    cast = lambda t: None if t is None else t.astype(jnp.bfloat16)
    return (cast(x_cf), tuple(cast(k) for k in kks),
            tuple(cast(bm) for bm in bms), jnp.bfloat16)


def _entry_and_cast(x, plan: TailPlan, kks, bms):
    """Entry-side layout + MXU-dtype handling: the Pallas pack kernel
    produces the channels-first activation directly in the bf16 operand
    dtype (one pass), weights cast as in _mxu_cast."""
    out_dt = (jnp.bfloat16 if x.dtype == jnp.float32
              and jax.default_backend() == "tpu" else x.dtype)
    x_cf = _entry_cf(x, plan, out_dt)
    if out_dt != x.dtype:
        cast = lambda t: None if t is None else t.astype(jnp.bfloat16)
        kks = tuple(cast(k) for k in kks)
        bms = tuple(cast(b) for b in bms)
    return x_cf, kks, bms


def _tail_fn(impl: str):
    return {"pallas": tail_apply, "pallas_hvp": tail_apply_fo,
            "jnp": tail_apply_jnp}[impl]


def _effective_impl(impl: str, plan: TailPlan, dtype) -> str:
    """Downgrade 'pallas'/'pallas_hvp' to the jnp twin when the plan has a
    layer no Pallas mode can fit in VMEM (identical math, XLA-scheduled)."""
    if impl not in ("pallas", "pallas_hvp"):
        return impl
    itemsize = (2 if dtype == jnp.float32 and jax.default_backend() == "tpu"
                else jnp.dtype(dtype).itemsize)  # _mxu_cast makes fp32 bf16
    if plan_feasible(plan, itemsize):
        return impl
    import warnings
    warnings.warn(f"fused tail: plan {plan.h}x{plan.w} has a layer too "
                  f"large for VMEM; using the XLA-scheduled jnp path")
    return "jnp"


def run_fused_tail(x, blocks, head, impl: str = "pallas", tm: int = 0):
    """Execute the tail on NHWC input x at the tail-entry resolution.
    Returns (packed head output NHWC (B, h, w, ch_packed), f_final)."""
    h, w = int(x.shape[1]), int(x.shape[2])
    plan, kks, bms, f, ch = plan_and_pack(h, w, blocks, head, tm=tm)
    impl = _effective_impl(impl, plan, x.dtype)
    fn = _tail_fn(impl)
    dt = x.dtype
    x_cf, kks, bms = _entry_and_cast(x, plan, kks, bms)
    z = fn(plan, x_cf, kks, bms)
    return cf_to_nhwc(z, plan, ch).astype(dt), f


def run_fused_tail_cf(x, blocks, head, impl: str = "pallas", tm: int = 0):
    """Like :func:`run_fused_tail` but stays channels-first: returns
    (z_cf (B, ch8, Mp), plan, ch, f) so a caller can compute the
    reconstruction loss directly in the packed flat domain (the
    depth-to-space is a permutation — sums of elementwise losses are
    invariant to it; see quantization/calibrate.py)."""
    h, w = int(x.shape[1]), int(x.shape[2])
    plan, kks, bms, f, ch = plan_and_pack(h, w, blocks, head, tm=tm)
    impl = _effective_impl(impl, plan, x.dtype)
    fn = _tail_fn(impl)
    dt = x.dtype
    x_cf, kks, bms = _entry_and_cast(x, plan, kks, bms)
    z = fn(plan, x_cf, kks, bms)
    return z.astype(dt), plan, ch, f


def _out_img(x, out_bias: str):
    """tail_fused-local twin of models.layers.out_img (avoids an import
    cycle; reference _layers.py:10-16)."""
    if out_bias == "sigmoid":
        return jax.nn.sigmoid(x)
    if out_bias == "tanh":
        return jnp.tanh(x) * 0.5 + 0.5
    return x + float(out_bias)


def _unpack_jnp(z, plan: TailPlan, f: int, ch: int, out_bias: str, dt):
    """XLA composition the unpack kernel replaces (also its VJP oracle):
    cf -> NHWC packed -> out_img -> depth-to-space."""
    from neuroquant_tpu.ops.packed_decode import depth_to_space

    y = cf_to_nhwc(z, plan, ch).astype(dt)
    return depth_to_space(_out_img(y, out_bias), f)


def _unpack_kernel5(z_ref, out_ref, *, f, g, rb, w, out_bias):
    """Width-tiled variant: input carries the w-tile as its own axis
    (block (1, 1, cp, rb, wt)) because Mosaic requires a block's last dim
    to be 128-divisible or equal to the array dim — a wt=160 lane slice of
    a w=320 axis is neither, but wt == wt after the reshape/transpose."""
    zt = z_ref[0, 0]                                    # (Cp, rb, wt)
    t = zt[:f * g].reshape(f, g, rb, w)
    t = _out_img(t, out_bias)
    t = jnp.transpose(t, (2, 0, 1, 3))
    t = jnp.transpose(t, (0, 1, 3, 2))
    out_ref[0] = t.reshape(rb * f, w, g).astype(out_ref.dtype)


def _unpack_kernel(z_ref, out_ref, *, f, g, rb, w, out_bias):
    """rb packed interior rows of the head output -> rb*f full-res output
    rows in (x, b, c) minor order. The channels-first -> NHWC depth-to-space
    is an in-register transpose instead of XLA's element-granularity relayout
    copy over the full-resolution frame (the round-2 profile's single
    hottest op). The (..., w, g) output collapses to NHWC (H, W, C) by a
    pure row-major reshape (no lane-merging shape cast, which Mosaic cannot
    lower). `w` here is the per-call width tile (may be a divisor of the
    full grid width — see _unpack_wt)."""
    zt = z_ref[0]                                       # (Cp, rb, w) f32
    t = zt[:f * g].reshape(f, g, rb, w)
    t = _out_img(t, out_bias)
    t = jnp.transpose(t, (2, 0, 1, 3))                  # (rb, a, bc, x)
    t = jnp.transpose(t, (0, 1, 3, 2))                  # (rb, a, x, bc)
    out_ref[0] = t.reshape(rb * f, w, g).astype(out_ref.dtype)


_UNPACK_BUDGET = 6 * 1024 * 1024


def _unpack_wt(plan: TailPlan, f: int) -> int | None:
    """Largest divisor wt of plan.w whose (rb*f, wt, g->128) output block
    fits the budget (large f, e.g. UVG's 6, exceeds it at full width — the
    round-3 gate then fell back to the XLA relayout for the whole frame);
    None when even wt=1... practically when no useful tile exists."""
    w = plan.w
    for div in range(1, w + 1):
        if w % div:
            continue
        wt = w // div
        if 8 * f * wt * 128 * 4 <= _UNPACK_BUDGET:
            return wt if wt >= 32 else None
    return None


def unpack_supported(plan: TailPlan, f: int, ch: int) -> bool:
    """True when the kernel's padded VMEM output block fits the budget at
    FULL width. The r4 width-tiled variant (_unpack_kernel5) is exact and
    compiles, but MEASURED SLOWER than the XLA relayout it replaces at
    both UVG geometries (HNeRV 235 vs 269 FPS, NeRV 203 vs 287 — the
    extra w-tile relayout + small blocks cost more than XLA's
    depth-to-space), so tiling-requiring plans keep the XLA path."""
    return _unpack_wt(plan, f) == plan.w


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def unpack_frames(z, plan: TailPlan, f: int, ch: int, out_bias: str, dt):
    """Head output z (B, Cp, Mp) channels-first -> frames (B, h*f, w*f, C)
    with out_img applied, as one Pallas pass. Backward falls back to the VJP
    of the XLA composition (training pays the old transpose cost only in the
    backward; decode/eval never do)."""
    b, cp, _ = z.shape
    hp, wp, h, w, pad = plan.hp, plan.wp, plan.h, plan.w, plan.pad
    c = ch // (f * f)
    g = f * c
    rb = 8                      # fp32 sublane tile (input converts below)
    h8 = -(-h // rb) * rb
    z4 = z[:, :, :hp * wp].reshape(b, cp, hp, wp)
    zi = jax.lax.slice(z4, (0, 0, pad, pad), (b, cp, pad + h, pad + w))
    zi = zi.astype(jnp.float32)
    if h8 != h:
        zi = jnp.pad(zi, ((0, 0), (0, 0), (0, h8 - h), (0, 0)))
    nb = h8 // rb
    wt = _unpack_wt(plan, f)
    if wt is None:
        # no width tile >= 32 fits the VMEM budget — public entry point
        # guard (production callers gate on unpack_supported, which also
        # rejects wt < plan.w as measured-slower; round-4 ADVICE item 1)
        raise ValueError(
            f"unpack_frames: no feasible width tile for plan w={plan.w}, "
            f"f={f} (VMEM budget); gate on unpack_supported(plan, f, ch) "
            "and use the XLA depth-to-space instead")
    nw = w // wt
    if nw == 1:
        out = pl.pallas_call(
            partial(_unpack_kernel, f=f, g=g, rb=rb, w=w, out_bias=out_bias),
            grid=(b * nb,),
            in_specs=[pl.BlockSpec((1, cp, rb, w),
                                   lambda l, nb=nb: (l // nb, 0, l % nb, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, rb * f, w, g),
                                   lambda l, nb=nb: (l // nb, l % nb, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, h8 * f, w, g), dt),
            interpret=_interpret(),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(zi)
    else:
        # w-tile as its own axis (see _unpack_kernel5): one cheap XLA
        # relayout of the (small) packed head output, then every block
        # satisfies Mosaic's last-dim rule
        zi5 = zi.reshape(b, cp, h8, nw, wt).transpose(0, 3, 1, 2, 4)
        out = pl.pallas_call(
            partial(_unpack_kernel5, f=f, g=g, rb=rb, w=wt,
                    out_bias=out_bias),
            grid=(b * nb * nw,),
            in_specs=[pl.BlockSpec(
                (1, 1, cp, rb, wt),
                lambda l, nb=nb, nw=nw: (l // (nb * nw), l % nw, 0,
                                         (l // nw) % nb, 0),
                memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (1, rb * f, wt, g),
                lambda l, nb=nb, nw=nw: (l // (nb * nw), (l // nw) % nb,
                                         l % nw, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, h8 * f, w, g), dt),
            interpret=_interpret(),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(zi5)
    if h8 != h:
        out = out[:, :h * f]
    return out.reshape(b, h * f, w * f, c)


def _unpack_frames_fwd(z, plan, f, ch, out_bias, dt):
    return unpack_frames(z, plan, f, ch, out_bias, dt), z


def _unpack_frames_bwd(plan, f, ch, out_bias, dt, z, g_out):
    _, vjp = jax.vjp(lambda zz: _unpack_jnp(zz, plan, f, ch, out_bias, dt), z)
    return vjp(g_out)


unpack_frames.defvjp(_unpack_frames_fwd, _unpack_frames_bwd)


def run_fused_tail_frames(x, blocks, head, out_bias: str,
                          impl: str = "pallas", tm: int = 0):
    """Tail + out_img + depth-to-space in one device pass: NHWC input x at
    the tail-entry resolution -> full-resolution frames (B, H, W, C).
    Replaces the run_fused_tail -> out_img -> depth_to_space composition on
    the decode fast path (models/{hnerv,nerv}.py)."""
    h, w = int(x.shape[1]), int(x.shape[2])
    plan, kks, bms, f, ch = plan_and_pack(h, w, blocks, head, tm=tm)
    impl = _effective_impl(impl, plan, x.dtype)
    fn = _tail_fn(impl)
    dt = x.dtype
    x_cf, kks_c, bms_c = _entry_and_cast(x, plan, kks, bms)
    z = fn(plan, x_cf, kks_c, bms_c)
    # pallas_hvp must NOT use unpack_frames: its custom_vjp cannot be
    # forward-differentiated; the jnp unpack is jvp-capable
    if impl == "pallas" and unpack_supported(plan, f, ch):
        return unpack_frames(z, plan, f, ch, out_bias, dt)
    return _unpack_jnp(z, plan, f, ch, out_bias, dt)


# --------------------------------------------------------------------------
# Fused prefix block: the LAST pre-tail NeRVBlock (e.g. HNeRV Bunny's
# blocks[2], 64 -> 848 k=5 at 40x80) as a 1-layer channels-first plan.
# The decode prefix runs as XLA NHWC convs; measured ~0.36 ms/frame forward
# of which this block is ~95% of the FLOPs (scripts/prefix_probe.py). Running
# it through tail_apply gives it the Pallas fwd/dx/dW kernels + custom VJP,
# and its conv output stays channels-first: one relabel (a depth-to-space
# permutation) feeds the main tail's input layout directly.
# --------------------------------------------------------------------------
@lru_cache(maxsize=64)
def _prefix_plan(h: int, w: int, k: int, cin: int, cout_rr: int):
    geoms = ((k, (k - 1) // 2, cin, cout_rr, None),)
    # _auto_tm gives 128-lane tiles at the prefix grids (e.g. 40x80 = 3200
    # positions -> 29 tiles of 128): per-tile overheads then dominate the
    # BACKWARD kernels (measured: the tm=128 prefix dx/dW cost more than
    # the XLA convs they replaced — r4 calib_breakdown). 512-lane tiles cut
    # the tile count to ~8 while every mode's working set still fits the
    # VMEM budget at these channel counts.
    tm = 512 if h * w >= 2048 else _auto_tm(h, w)
    return _make_plan(h, w, geoms, tm)


def prefix_block_feasible(h: int, w: int, k: int, cin: int, cout_rr: int,
                          itemsize: int = 2) -> bool:
    """One-pallas_call feasibility of the 1-layer prefix plan (no split:
    a split prefix would not beat the XLA conv it replaces)."""
    plan = _prefix_plan(h, w, k, cin, cout_rr)
    try:
        _exec_cfg(plan, plan.layers[0], itemsize, "fwd1")
        return True
    except ValueError:
        return False


def run_fused_prefix_block(x, kernel, bias, r: int, out_channel: int,
                           impl: str = "pallas"):
    """NHWC input x (B, h, w, cin) -> the block's conv output channels-first
    (B, cout*r*r padded, Mp), pre-PixelShuffle, pre-activation, with the
    channel relabel (subposition-major) already applied — i.e. exactly
    plan_and_pack's f=1 entry-layer semantics for this conv. Returns
    (z_cf, plan). impl='pallas_hvp' routes through the forward-mode-capable
    tail_apply_fo (Omega HVPs jvp through the prefix too)."""
    h, w = int(x.shape[1]), int(x.shape[2])
    kh, kw, cin, cout_rr = kernel.shape
    assert kh == kw and cout_rr == out_channel * r * r
    wrel = (kernel.reshape(kh, kw, cin, out_channel, r, r)
            .transpose(0, 1, 2, 4, 5, 3).reshape(kh, kw, cin, cout_rr))
    brel = None
    if bias is not None:
        brel = bias.reshape(out_channel, r, r).transpose(1, 2, 0).reshape(-1)
    plan = _prefix_plan(h, w, kh, cin, cout_rr)
    layer = plan.layers[0]
    kk = _pad_kk(wrel, layer.cin, layer.cout)
    bm = (None if brel is None else
          jnp.pad(brel, (0, layer.cout - cout_rr)).reshape(layer.cout, 1))
    dt = x.dtype
    x_cf, kks, bms = _entry_and_cast(x, plan, (kk,), (bm,))
    z = _tail_fn(impl if impl in ("pallas", "pallas_hvp") else "pallas")(
        plan, x_cf, kks, bms)
    return z.astype(dt), plan


def prefix_cf_to_nhwc(z, plan: TailPlan, r: int, out_channel: int):
    """(B, cout*r*r pad, Mp) conv output of run_fused_prefix_block ->
    NHWC (B, h*r, w*r, cout) PixelShuffled tensor (pre-activation): slice
    interior, undo the subposition-major relabel, depth-to-space. One XLA
    relayout replacing the conv's own output transpose + shuffle."""
    b = z.shape[0]
    hp, wp, h, w, p = plan.hp, plan.wp, plan.h, plan.w, plan.pad
    z = z[:, :out_channel * r * r, :hp * wp].reshape(b, -1, hp, wp)
    z = z[:, :, p:p + h, p:p + w]
    z = z.reshape(b, r, r, out_channel, h, w)
    z = jnp.transpose(z, (0, 4, 1, 5, 2, 3))        # (B, h, u, w, v, c)
    return z.reshape(b, h * r, w * r, out_channel)


def pack_targets(frames, plan: TailPlan, f: int):
    """Ground-truth frames (N, H, W, C) -> (N, ch8, Mp) channels-first packed
    layout matching the fused head output (identity groups, zero borders)."""
    from neuroquant_tpu.ops.packed_decode import space_to_depth

    return nhwc_to_cf(space_to_depth(frames, f), plan)
