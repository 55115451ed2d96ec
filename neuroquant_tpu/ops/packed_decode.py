"""Space-to-depth packed execution of the high-resolution decoder tail.

The NeRV/HNeRV decoder spends its FLOPs in the last two NeRVBlocks and the
head conv, which run at 320x640 / 640x1280 with 37-53 channels
(reference hot op: quant_layer.py:67-81 wrapping _layers.py:20-36). On TPU
those channel counts occupy a fraction of the 128-wide MXU lanes, so XLA
pads every conv and the decode runs at ~5-9% MFU (round-1 profiling).

Fix: keep the tail in a space-to-depth *packed* layout. A stride-1 conv with
odd kernel k on (H, W, C) is EXACTLY a conv on the 2x2-packed tensor
(H/2, W/2, 4C) with a block-structured kernel (derivation below) — so the
whole tail runs at 160x320 with 176-592 channels: full MXU lanes, 1/4 the
spatial padding, identical math. A conv's own PixelShuffle(r) *increases*
the pack factor by r for free (the shuffle is a relabeling of packed
channels), so once packed the tail never touches a high-resolution layout
until the single final depth-to-space of the RGB output.

Derivation (per axis; r = pack factor, p = (k-1)//2):
  unpacked output row ro = r*h + i reads input rows ri = ro + dy - p,
  dy in [0, k). With q = i + dy - p:  ri = r*(h + floor(q/r)) + (q mod r),
  so packed tap offset dp = floor(q/r) + offp with offp = ceil(p + r-1 / r)
  bounds... q in [-p, r-1+p]  =>  dp in [0, kp) with
      offp = ceil(p / r),   kp = offp + floor((r - 1 + p) / r) + 1.
  The packed kernel entry at (dp_y, dp_x, group_in(a,b)*Cin + ci,
  group_out(i,j)*Cout + co) equals W[dy, dx, ci, co] for the unique (dy, dx)
  solving the relations above, else 0. FLOP inflation = (kp*r/k)^2 per axis
  pair; for the k=5, r=2 HNeRV tail that is 9*4/25 = 1.44x — paid back many
  times over by lane occupancy.

Channel-group layout is subposition-major: packed channel = g*C + c with
g = perm[u*r + v] for spatial subposition (u, v). This makes the layout of
"conv output with perm-relabeled channels" (ops/fused_upsample.py
conv_pixel_shuffle_perm) exactly the packed representation of the shuffled
tensor — composing a shuffle into the pack factor is a pure permutation
`perm`, folded into the next packed kernel at trace time.

Everything here is differentiable (the kernel repack is a gather), so the
calibration loss (quantization/calibrate.py) backpropagates through the
packed decode into the fake-quantized weights unchanged.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fused_tail_feasible(t, kernels, strides, in_channels, out_channels,
                        crop_h: int, crop_w: int,
                        head_kernel: int = 3, head_out: int = 3,
                        allow_split: bool = True) -> bool:
    """True when the fused Pallas tail has a VMEM-feasible execution mode
    for every layer of the pack-start-t plan (bf16 operands). Pure shape
    math — no arrays are built. Models consult this to decide between the
    Pallas CF tail and the XLA packed execution for decode.
    allow_split=False counts only one-pallas_call layers as feasible (see
    tail_fused.plan_feasible)."""
    return _fused_tail_feasible(
        int(t), tuple(int(k) for k in kernels),
        tuple(int(s) for s in strides),
        tuple(int(c) for c in in_channels),
        tuple(int(c) for c in out_channels),
        int(crop_h), int(crop_w), int(head_kernel), int(head_out),
        bool(allow_split))


@lru_cache(maxsize=256)
def _fused_tail_feasible(t, kernels, strides, in_channels, out_channels,
                         crop_h: int, crop_w: int,
                         head_kernel: int, head_out: int,
                         allow_split: bool = True) -> bool:
    from neuroquant_tpu.ops.tail_fused import (
        _VMEM_BUDGET, plan_feasible, plan_geometry)

    s = int(np.prod([int(x) for x in strides[t:]]))
    h, w = crop_h // s, crop_w // s
    # cheap precheck before building sparse tap specs (enumeration is
    # O(k^2 f^2) per layer — an f=480 full-pack candidate must be rejected
    # without it): the double-buffered bf16 input tile at the MINIMUM lane
    # tile already exceeds VMEM when cin*f^2 is large enough, regardless of
    # execution mode
    f = 1
    for j in range(t, len(kernels)):
        if 2 * int(in_channels[j]) * f * f * 128 * 2 > _VMEM_BUDGET:
            return False
        f *= int(strides[j])
    if 2 * int(out_channels[-1]) * f * f * 128 * 2 > _VMEM_BUDGET:
        return False
    bg = [(int(kernels[j]), int(in_channels[j]),
           int(out_channels[j]) * int(strides[j]) ** 2, int(strides[j]))
          for j in range(t, len(kernels))]
    try:
        plan, _ = plan_geometry(h, w, bg,
                                (head_kernel, int(out_channels[-1]),
                                 head_out))
    except AssertionError:
        return False
    return plan_feasible(plan, 2, allow_split=allow_split)


def gate_fused_impl(impl, t, kernels, strides, in_channels, out_channels,
                    crop_h: int, crop_w: int,
                    head_kernel: int = 3, head_out: int = 3,
                    allow_split: bool = True):
    """Demote impl='pallas' to None when the pack-start-t plan is not
    VMEM-feasible, so model decode falls back to the XLA packed execution
    (measured faster than the jnp CF twin at infeasible geometries — UVG
    study in RESULTS.md: 149.9 vs 87.6 FPS). Other impls pass through;
    decode_cf callers keep their own `or "jnp"` for the calibration loss.

    Plans feasible only via the cout-row split (_split_parts) stay Pallas:
    the split execution is perf-validated on hardware at the one shipped
    geometry that needs it — UVG f=6 decodes at 221.6 FPS split-Pallas vs
    151.2 XLA-packed vs 87.9 jnp (scripts/uvg_split_probe.py, RESULTS.md).
    allow_split=False reports one-call feasibility only (diagnostics)."""
    if impl in ("pallas", "pallas_hvp") and not fused_tail_feasible(
            t, kernels, strides, in_channels, out_channels, crop_h, crop_w,
            head_kernel, head_out, allow_split=allow_split):
        return None
    return impl


def plan_packed_tail(kernels, strides, in_channels, out_channels,
                     crop_h: int, crop_w: int,
                     head_kernel: int = 3, head_out: int = 3,
                     prefer_packed: bool = False):
    """Choose the block index whose PixelShuffle starts the packed tail by
    minimizing an MXU padded-cost model.

    A conv's MXU time is ~ spatial_positions * ceil(Cin/128) * ceil(Cout/128)
    * k^2 (both channel axes pad to 128 lanes). Packing block j by
    f_j = prod(strides[t:j]) trades kernel size k -> kp (packed_kernel_geometry)
    against f^2-fatter channel axes at f^2-fewer positions — a win exactly
    when the channels were padding-bound. This picks t = argmin of the summed
    model over blocks + head (None = fully unpacked when that wins).

    Measured on TPU v5e (scripts/micro_decode.py): HNeRV-3M Bunny decode
    78 -> 391 FPS (t=3), NeRV-3M 138 -> 736 FPS (t=3); the reference GPU
    logs 174 / 402 FPS (results/, BASELINE.md).
    """
    n = len(kernels)

    def tiles(c):
        return -(-int(c) // 128)

    def res(j):
        s = int(np.prod([int(x) for x in strides[j:]]))
        return (crop_h // s) * (crop_w // s)

    def plan_cost(t):
        # t = None: fully unpacked; else blocks >= t run packed
        total = 0
        f = 1
        for j in range(n):
            k, r = int(kernels[j]), int(strides[j])
            cin, cout = int(in_channels[j]), int(out_channels[j]) * r * r
            if t is None or j <= t:
                if k % 2 == 0 and t is not None and j == t:
                    return None
                total += res(j) * tiles(cin) * tiles(cout) * k * k
            else:
                if k % 2 == 0:
                    return None
                kp, _ = packed_kernel_geometry(k, f)
                total += (res(j) // (f * f) * tiles(cin * f * f)
                          * tiles(cout * f * f) * kp * kp)
            if t is not None and j >= t:
                f *= r
        # head conv at crop resolution, packed by the final factor
        hk, hin = int(head_kernel), int(out_channels[-1])
        if t is None:
            total += crop_h * crop_w * tiles(hin) * tiles(head_out) * hk * hk
        else:
            if hk % 2 == 0:
                return None
            kp, _ = packed_kernel_geometry(hk, f)
            total += (crop_h * crop_w // (f * f) * tiles(hin * f * f)
                      * tiles(head_out * f * f) * kp * kp)
        return total

    candidates = {None: plan_cost(None)}
    for t in range(n):
        # packing must start where spatial dims divide evenly (they always
        # do on the stride grid) and strides are isotropic ints
        candidates[t] = plan_cost(t)
    valid = {t: c for t, c in candidates.items() if c is not None}
    # prefer_packed breaks MXU-cost ties toward packing — used when the
    # fused Pallas tail executes the packed segment (its costs are not the
    # XLA padded-cost model's: no 128-lane channel padding, fused epilogues)
    return min(valid, key=lambda t: (valid[t], (t is None) if prefer_packed
                                     else (t is not None)))


@lru_cache(maxsize=128)
def _auto_pack_start(kernels, strides, in_channels, out_channels,
                     crop_h: int, crop_w: int):
    """Cached 'auto' resolution (flax setup calls resolve_pack_start on
    every trace). The pack start follows the XLA packed-cost model alone:
    when the winning start's plan is NOT fused-feasible (UVG's f=6), the
    models fall back to the XLA packed execution for decode — measured
    faster (149.9 FPS) than either the jnp CF twin at the same start
    (87.6) or the Pallas tail at a shallower feasible start (102.7)."""
    return plan_packed_tail(
        kernels, strides, in_channels, out_channels, crop_h, crop_w)


def resolve_pack_start(packed_tail, kernels, strides, dec_norm: str,
                       in_channels, out_channels, crop_h: int, crop_w: int):
    """Resolve a model config's `packed_tail` knob ('auto' | 'off' | explicit
    block index as str/int) into a pack-start block index or None."""
    if dec_norm != "none" or str(packed_tail).lower() in ("off", "false", "none"):
        return None
    if str(packed_tail).lower() in ("auto", "true"):
        # pure cost-model choice; fused-tail VMEM feasibility instead
        # drives the models' execution-path fallback (gate_fused_impl)
        return _auto_pack_start(
            tuple(int(k) for k in kernels), tuple(int(s) for s in strides),
            tuple(int(c) for c in in_channels),
            tuple(int(c) for c in out_channels), int(crop_h), int(crop_w))
    t = int(packed_tail)
    if not 0 <= t < len(kernels):
        # a config typo here would silently disable packing — a ~5x decode
        # perf regression with no functional signal — so fail loudly
        raise ValueError(
            f"packed_tail={t} out of range for a {len(kernels)}-block decoder "
            f"(use 0..{len(kernels) - 1}, 'auto', or 'off')")
    return t


def packed_kernel_geometry(k: int, r: int) -> Tuple[int, int]:
    """(kp, offp): packed kernel size and left pad for an odd-k stride-1 conv
    executed on r-packed tensors."""
    p = (k - 1) // 2
    offp = -((-p) // r) if p else 0          # ceil(p / r)
    kp = offp + (r - 1 + p) // r + 1
    return kp, offp


@lru_cache(maxsize=256)
def _axis_map(k: int, r: int):
    """(kp, r_in, r_out) int array: dy for each (dp, a_in, i_out), or k
    (sentinel row of a zero-padded kernel) when no tap maps there."""
    p = (k - 1) // 2
    kp, offp = packed_kernel_geometry(k, r)
    m = np.full((kp, r, r), k, dtype=np.int32)
    for i_out in range(r):
        for dy in range(k):
            q = i_out + dy - p
            dp = q // r + offp               # python floor-div
            a_in = q % r
            m[dp, a_in, i_out] = dy
    return m


@lru_cache(maxsize=256)
def _inv_axis_map(k: int, r: int):
    """(k, r_in, r_out) int array: the unique dp with
    _axis_map(k,r)[dp, a, i] == dy, or kp (a zero-pad slot) when the
    (dy, a, i) combination maps to no packed tap."""
    m = _axis_map(k, r)
    kp = m.shape[0]
    inv = np.full((k, r, r), kp, dtype=np.int32)
    for dp in range(kp):
        for a in range(r):
            for i in range(r):
                dy = int(m[dp, a, i])
                if dy < k:
                    inv[dy, a, i] = dp
    return inv


def identity_perm(r: int) -> np.ndarray:
    return np.arange(r * r, dtype=np.int64)


def compose_shuffle_perm(in_perm: np.ndarray, f: int, r: int) -> np.ndarray:
    """Layout permutation after a PixelShuffle(r) absorbed into the packing.

    Input: tensor packed by f with subpos-major groups `in_perm` whose
    per-group channels carry a perm-relabeled conv output (shuffle group
    (i, j) major, ops/fused_upsample.py:81). Output: the f*r-packed layout of
    the shuffled tensor: subposition (u, v) = (a*r + i, b*r + j) lives at
    group in_perm[a*f_? ...] — computed positionally below.
    """
    fr = f * r
    out = np.empty(fr * fr, dtype=np.int64)
    for a in range(f):
        for b in range(f):
            g_outer = in_perm[a * f + b]
            for i in range(r):
                for j in range(r):
                    u, v = a * r + i, b * r + j
                    # channel index inside group g_outer: (i*r + j)*C + c,
                    # so global group = g_outer*(r*r) + i*r + j
                    out[u * fr + v] = g_outer * (r * r) + i * r + j
    return out


def space_to_depth(x, r: int, perm: np.ndarray | None = None):
    """(N, H, W, C) -> (N, H/r, W/r, r*r*C), subposition (u, v) at channel
    group perm[u*r+v] (identity by default)."""
    if r == 1:
        return x
    n, h, w, c = x.shape
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)        # (n, h', w', u, v, c)
    x = x.reshape(n, h // r, w // r, r * r, c)
    if perm is not None:
        inv = np.argsort(np.asarray(perm))
        x = x[:, :, :, inv, :]               # group g holds subpos inv[g]
    return x.reshape(n, h // r, w // r, r * r * c)


def depth_to_space(x, r: int, perm: np.ndarray | None = None):
    """Inverse of :func:`space_to_depth`. The transpose keeps a contiguous
    (v, C) minor block — near-bandwidth on TPU (cf. conv_pixel_shuffle_perm)."""
    if r == 1:
        return x
    n, h, w, gc = x.shape
    c = gc // (r * r)
    x = x.reshape(n, h, w, r * r, c)
    if perm is not None:
        x = x[:, :, :, np.asarray(perm), :]  # subpos s now at slot s
    x = x.reshape(n, h, w, r, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)        # (n, h, u, w, v, c)
    return x.reshape(n, h * r, w * r, c)


def pack_conv_kernel(w_hwio, r: int, in_perm: np.ndarray | None = None,
                     out_perm: np.ndarray | None = None, xp=jnp):
    """Repack an odd-k stride-1 conv kernel (k, k, Cin, Cout) into the
    (kp, kp, r^2*Cin, r^2*Cout) kernel acting on r-packed tensors.

    `in_perm` / `out_perm`: subpos-major group layouts of the packed input /
    output (see module docstring). Pure gather — differentiable w.r.t. w.
    `xp`: array namespace — pass `np` to pack a concrete (numpy) kernel at
    plan time without entering a jax trace (tail_fused sparse-structure
    derivation).

    The jnp path routes through `linear_call` with a GATHER-based custom
    transpose (_pack_kernel_transpose): XLA transposes a gather as a
    scatter-add, which serializes on TPU and cost ~0.9 ms/step of the
    round-5 calibration anatomy (every step re-packs the fake-quantized
    weights, so the pack VJP runs in the hot loop). linear_call keeps
    forward-mode intact (jvp of a linear map is the map itself) — the
    omega HVP paths still trace jvp straight through."""
    if xp is jnp and not isinstance(w_hwio, np.ndarray):
        from jax._src.custom_derivatives import linear_call

        k = int(w_hwio.shape[0])
        cin, cout = int(w_hwio.shape[2]), int(w_hwio.shape[3])
        ip = None if in_perm is None else np.asarray(in_perm)
        op = None if out_perm is None else np.asarray(out_perm)
        return linear_call(
            lambda _res, w: _pack_impl(w, r, ip, op, jnp),
            lambda _res, dkk: _pack_kernel_transpose(dkk, k, r, cin, cout,
                                                     ip, op),
            (), w_hwio)
    return _pack_impl(w_hwio, r, in_perm, out_perm, xp)


def _pack_kernel_transpose(dkk, k: int, r: int, cin: int, cout: int,
                           in_perm, out_perm):
    """Transpose of :func:`pack_conv_kernel` as a pure gather: dw[dy, dx] =
    sum over the packed slots (py, a, i), (px, b, j) that read tap (dy, dx)
    — at most one py per (dy, a, i) (_inv_axis_map), sentinel combinations
    read a zero-pad slot."""
    kp, _ = packed_kernel_geometry(k, r)
    f2 = r * r
    dkk = dkk.reshape(kp, kp, f2, cin, f2, cout)
    # fwd gathered with q = argsort(perm); transpose of x[q] is dy[argsort(q)]
    if in_perm is not None:
        dkk = dkk[:, :, np.argsort(np.argsort(np.asarray(in_perm)))]
    if out_perm is not None:
        dkk = dkk[:, :, :, :, np.argsort(np.argsort(np.asarray(out_perm)))]
    dkk = dkk.reshape(kp, kp, r, r, cin, r, r, cout)
    # (py, px, a, b, ci, i, j, co) -> (py, a, i, px, b, j, ci, co)
    # (inverse of the fwd transpose (0, 3, 1, 4, 6, 2, 5, 7))
    dkk = dkk.transpose(0, 2, 5, 1, 3, 6, 4, 7)
    # zero-pad slot at index kp on both packed-tap axes for sentinels
    dkk = jnp.pad(dkk, ((0, 1), (0, 0), (0, 0), (0, 1),
                        (0, 0), (0, 0), (0, 0), (0, 0)))
    inv = _inv_axis_map(k, r)                       # (k, r, r) of py | kp
    ar = np.arange(r)
    t = dkk[inv, ar[None, :, None], ar[None, None, :]]
    #   (dy, a, i, px1, b, j, ci, co)
    t = t[:, :, :, inv, ar[None, :, None], ar[None, None, :]]
    #   (dy, a, i, dx, b, j, ci, co)
    return t.sum(axis=(1, 2, 4, 5))                 # (k, k, cin, cout)


def _pack_impl(w_hwio, r: int, in_perm, out_perm, xp):
    k = int(w_hwio.shape[0])
    assert w_hwio.shape[1] == k and k % 2 == 1, w_hwio.shape
    cin, cout = int(w_hwio.shape[2]), int(w_hwio.shape[3])
    m = _axis_map(k, r)                       # (kp, r, r) of dy | k
    kp = m.shape[0]
    wp = xp.pad(w_hwio, ((0, 1), (0, 1), (0, 0), (0, 0)))  # zero sentinel
    idx_y = xp.asarray(m)                     # (kp, a, i)
    idx_x = idx_y                             # x-axis map identical by symmetry
    # K[(py, a, i), (px, b, j), ci, co] = wp[dy, dx, ci, co]
    kk = wp[idx_y]                            # (kp, a, i, k+1, cin, cout)
    kk = xp.take(kk, idx_x, axis=3)           # (kp, a, i, kp, b, j, cin, cout)
    kk = kk.transpose(0, 3, 1, 4, 6, 2, 5, 7)  # (py, px, a, b, cin, i, j, cout)
    kk = kk.reshape(kp, kp, r * r, cin, r * r, cout)
    if in_perm is not None:
        kk = kk[:, :, np.argsort(np.asarray(in_perm)), :, :, :]
    if out_perm is not None:
        kk = kk[:, :, :, :, np.argsort(np.asarray(out_perm)), :]
    return kk.reshape(kp, kp, r * r * cin, r * r * cout)


@lru_cache(maxsize=128)
def packed_sparse_taps(k: int, r: int, in_perm_key: tuple | None):
    """The zero-structure of a packed kernel, per output subposition group.

    A packed conv kernel (pack_conv_kernel) is block-sparse: output group q
    receives exactly k^2 nonzero (cin_o, cout_o) blocks, one per original
    tap. Returns (qtaps_fwd, qtaps_t): for the kernel and its convT
    (tap-reversed, channel-transposed), each a tuple over q of k^2 entries
    (py, px, gin) — packed tap position and input group index — ordered by
    the ORIGINAL tap index dy*k+dx, so every q shares one (cout_o,
    k^2*cin_o) weight operand (tail_fused 'qpatches' execution mode)."""
    in_perm = np.asarray(in_perm_key, np.int64) if in_perm_key is not None \
        else None
    marker = np.arange(1.0, k * k + 1).reshape(k, k, 1, 1)
    kkm = pack_conv_kernel(marker, r, in_perm=in_perm, xp=np)
    kkm_t = kkm[::-1, ::-1].transpose(0, 1, 3, 2)

    def extract(mk):
        kp, _, f2i, f2o = mk.shape
        out = []
        for q in range(f2o):
            taps = sorted(
                (int(round(mk[py, px, gin, q])) - 1, py, px, gin)
                for py in range(kp) for px in range(kp) for gin in range(f2i)
                if round(mk[py, px, gin, q]) != 0)
            assert len(taps) == k * k, (k, r, q, len(taps))
            out.append(tuple((py, px, gin) for _, py, px, gin in taps))
        return tuple(out)

    return extract(kkm), extract(kkm_t)


def packed_conv(x, w_hwio, bias, r: int, in_perm=None, out_perm=None):
    """conv(x_unpacked, w, pad=(k-1)//2) evaluated on the r-packed `x`.

    Returns the r-packed conv output (layout `out_perm`). `bias` is the
    UNPACKED per-channel bias (broadcast over subpositions)."""
    k = int(w_hwio.shape[0])
    kp, offp = packed_kernel_geometry(k, r)
    kk = pack_conv_kernel(w_hwio, r, in_perm, out_perm)
    dn = jax.lax.conv_dimension_numbers(x.shape, kk.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, kk, (1, 1), [(offp, offp), (offp, offp)], dimension_numbers=dn)
    if bias is not None:
        cout = int(w_hwio.shape[3])
        b = jnp.tile(bias, r * r)             # same bias in every group
        y = y + b
    return y


def upsample_conv_packed(x, w_hwio, bias, f: int, r: Tuple[int, int] | int,
                         in_perm=None):
    """One NeRVBlock upsample (conv k -> PixelShuffle(r)) on f-packed input.

    The conv produces Cout*r^2 channels; instead of shuffling, the r^2
    factor is absorbed into the pack factor: the result is (f*r)-packed with
    layout `compose_shuffle_perm(out_groups, f, r)`. Returns (y, new_perm).

    The conv's own output groups use the perm relabeling (shuffle-group
    major) exactly like conv_pixel_shuffle_perm: kernel columns are
    relabeled c*(r*r) + i*r + j  ->  (i*r + j)*C + c before packing.
    """
    rh, rw = (r, r) if isinstance(r, int) else r
    assert rh == rw, "packed tail requires isotropic strides"
    r = rh
    kh, kw, cin, cout_rr = w_hwio.shape
    cout = cout_rr // (r * r)
    # relabel output channels to shuffle-subposition-major (free)
    w = w_hwio.reshape(kh, kw, cin, cout, r, r)
    w = w.transpose(0, 1, 2, 4, 5, 3).reshape(kh, kw, cin, cout_rr)
    b = None
    if bias is not None:
        b = bias.reshape(cout, r, r).transpose(1, 2, 0).reshape(-1)
    if f == 1:
        # plain conv; output is r-packed with identity groups = shuffle groups
        p = (kh - 1) // 2
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(p, p), (p, p)], dimension_numbers=dn)
        if b is not None:
            y = y + b
        return y, identity_perm(r)
    # packed conv: treat the relabeled kernel as cin -> cout_rr; the output
    # "channel" axis of size f^2 * cout_rr then represents pack factor f*r
    y = packed_conv(x, w, b, f, in_perm=in_perm, out_perm=None)
    # output groups: outer subpos (a, b) [identity] each holding shuffle
    # groups (i, j) major -> composed (f*r)-packing permutation
    new_perm = compose_shuffle_perm(identity_perm(f), f, r)
    return y, new_perm
