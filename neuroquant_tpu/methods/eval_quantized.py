"""Evaluate a calibrated/entropy-coded model: artifact (or bitstream) ->
dequantized decoder -> PSNR/MS-SSIM/FPS.

Closes the loop the reference leaves implicit (it pickles the whole torch
QuantModel object, calibrate_network.py:305-308, and never ships a loader):
reconstruct fake-quantized parameters from the saved QuantState — or, with
--from_bitstream, decode the arithmetic-coded integer weights and rebuild the
dequantized weights from codes + scales alone, proving the bitstream is a
complete representation.

Run:
  python -m neuroquant_tpu.methods.eval_quantized --artifact <...pth> \
      --data_path /root/reference/bunny [--from_bitstream <...nqtb>]
"""

from __future__ import annotations

import argparse
import logging
import pickle
import sys

import jax
import jax.numpy as jnp
import numpy as np

from neuroquant_tpu.data import VideoDataSet
from neuroquant_tpu.methods import common
from neuroquant_tpu.models import build_model, example_input
from neuroquant_tpu.ops.hadamard import fwht
from neuroquant_tpu.quantization.qmodel import _get, _set, quantize_params
from neuroquant_tpu.quantization.spec import QuantSpec
from neuroquant_tpu.utils.torch_compat import state_dict_to_params


def parse_args(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--artifact", type=str, required=True)
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--from_bitstream", type=str, default=None,
                   help="reconstruct weights from this .nqtb stream instead "
                        "of the saved QuantState")
    p.add_argument("--data_split", type=str, default="1_1_1")
    p.add_argument("-p", "--print-freq", default=50, type=int)
    p.add_argument("--eval_fps", action="store_true", default=False,
                   help="also report device-side decode FPS (jitted scan, "
                        "the quantized counterpart of regress --eval_fps)")
    return p.parse_args(argv)


def spec_from_artifact(artifact) -> QuantSpec:
    qs = artifact["quant_spec"]
    return QuantSpec(
        layer_names=tuple(qs["layer_names"]),
        layer_paths=tuple(tuple(p) for p in qs["layer_paths"]),
        n_bits=tuple(qs["n_bits"]), channel_wise=qs["channel_wise"],
        scale_method=qs["scale_method"], hadamard=qs["hadamard"],
        sym=qs["sym"])


def params_from_codes(params, spec: QuantSpec, codes: dict):
    """Dequantize integer codes -> weights (inverse-FWHT if hadamard)."""
    out = params
    for name, path in zip(spec.layer_names, spec.layer_paths):
        c = codes[name]
        layer = dict(_get(params, path))
        w_deq = (np.asarray(c["w"], np.float32) - np.asarray(c["w_zp"])) \
            * np.asarray(c["w_delta"])
        w_deq = jnp.asarray(w_deq)
        if spec.hadamard:
            cin = layer["kernel"].shape[2]
            w_deq = fwht(w_deq, axis=2)[:, :, :cin, :]
        b_deq = (np.asarray(c["b"], np.float32) - np.asarray(c["b_zp"])) \
            * np.asarray(c["b_delta"])
        layer["kernel"] = w_deq
        layer["bias"] = jnp.asarray(b_deq)
        out = _set(out, path, layer)
    return out


def params_from_stream(params, spec: QuantSpec, decoded: dict):
    """Dequantize entirely from the decoded bitstream — codes AND scales.

    The stream's scale block is the f16 concatenation
    [w_delta, w_zp, b_delta, b_zp] (codec.compress_artifact); splitting it
    needs only the spec (per-channel layout) and kernel C_out. For AdaRound
    states this is lossless: deltas/zero-points were f16-cast at the phase-2
    hand-off (ops/quant.f16_round), so the f16 stream values are exact.
    """
    out = params
    for name, path in zip(spec.layer_names, spec.layer_paths):
        d = decoded[name]
        layer = dict(_get(params, path))
        cout = layer["kernel"].shape[-1]
        n_wd = cout if spec.channel_wise else 1
        sc = np.asarray(d["scales"], np.float32)
        assert sc.size == 2 * n_wd + 2, (name, sc.size, n_wd)
        wshape = (1, 1, 1, cout) if spec.channel_wise else ()
        w_delta = sc[:n_wd].reshape(wshape)
        w_zp = sc[n_wd:2 * n_wd].reshape(wshape)
        b_delta, b_zp = sc[2 * n_wd], sc[2 * n_wd + 1]
        w_deq = jnp.asarray(
            (d["w"].astype(np.float32) - w_zp) * w_delta)
        if spec.hadamard:
            cin = layer["kernel"].shape[2]
            w_deq = fwht(w_deq, axis=2)[:, :, :cin, :]
        layer["kernel"] = w_deq
        layer["bias"] = jnp.asarray(
            (d["b"].astype(np.float32) - b_zp) * b_delta)
        out = _set(out, path, layer)
    return out


def main(argv):
    common.enable_persistent_cache()
    args = parse_args(argv)
    logging.basicConfig(stream=sys.stdout, level=logging.INFO)

    with open(args.artifact, "rb") as f:
        artifact = pickle.load(f)
    arch, cfg = artifact["arch"], artifact["cfg"]
    args.arch = arch
    args.metric_names = common.METRIC_NAMES
    args.outf = "."

    dataset = VideoDataSet(cfg, args.data_path)
    common.split_dataset(args, dataset)

    model = build_model(arch, cfg)
    params = model.init(jax.random.PRNGKey(0), example_input(arch, cfg, 1))
    params = state_dict_to_params(arch, artifact["state_dict"], params)
    spec = spec_from_artifact(artifact)

    if args.from_bitstream:
        from neuroquant_tpu.coding import decompress_artifact
        with open(args.from_bitstream, "rb") as f:
            stream = f.read()
        decoded = decompress_artifact(stream)
        # cross-check every decoded payload against the artifact's codes
        codes = artifact["int_codes"]
        for name in codes:
            np.testing.assert_array_equal(decoded[name]["w"],
                                          np.asarray(codes[name]["w"]))
            np.testing.assert_array_equal(decoded[name]["b"],
                                          np.asarray(codes[name]["b"]))
        # reconstruct from the stream alone (codes + f16 scales) — the
        # artifact contributes only unquantized parts (encoder, shapes)
        qparams = params_from_stream(params, spec, decoded)
        logging.info("reconstructed weights+biases+scales from bitstream %s",
                     args.from_bitstream)
    else:
        state = jax.tree_util.tree_map(jnp.asarray, artifact["quant_state"])
        # any-layer alpha => adaround mode; quantize_params resolves the
        # per-layer mode from alpha presence (mixed-rounding states)
        mode = ("adaround" if any("w_alpha" in s for s in state.values())
                else "uaq")
        qparams = jax.jit(
            lambda p, s: quantize_params(p, spec, s, mode=mode, soft=False))(
            params, state)

    results, _, _ = common.evaluate(model, qparams, dataset, args, cfg,
                                    eval_fps=args.eval_fps)
    s, _ = common.best_metrics_str(results)
    logging.info("Quantized eval: %s", s)
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
