"""Stage 2 — Omega mixed-precision bit allocation.

CLI-compatible re-design of methods/bit_assign.py: evaluate the FP32 model
(harvesting embeddings), then for each candidate bit vector build a QuantSpec,
initialize scales, and score the perturbation with the Omega Hessian criterion
(or diagonal Fisher); the lowest score wins. The Hessian-vector product is
jax.grad over jax.jvp in a single jitted 10-batch scan (sensitivity.py) —
running the fused Pallas tail via its custom_jvp rule — instead of the
reference's per-batch double backward (bit_assign.py:57-118).

Run:
  python -m neuroquant_tpu.methods.bit_assign --config configs/HNeRV/Bunny_1280x640_3M.yaml \
      --arch hnerv --data_path /root/reference/bunny --vid Bunny --outf hnerv \
      --ckpt <epoch300.pth> --batch_size 2 --channel_wise --init max --mode omega
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import time
from datetime import datetime

import jax
import numpy as np

from neuroquant_tpu.config import get_config, validate_config
from neuroquant_tpu.data import VideoDataSet
from neuroquant_tpu.logging_utils import setup_logger
from neuroquant_tpu.methods import common
from neuroquant_tpu.quantization import (
    average_bits, init_quant_state, make_spec, sensitivity_criterion,
)
from neuroquant_tpu.utils.torch_compat import load_pth

# toy candidate sets from the reference (bit_assign.py:27-36)
HNERV_CANDIDATES = {
    "candidate1": [2, 3, 4, 6, 4, 4, 2],
    "candidate2": [6, 5, 4, 5, 5, 6, 6],
}
NERV_CANDIDATES = {
    "candidate1": [5, 6, 3, 4, 5, 4, 3],
    "candidate2": [6, 5, 5, 6, 7, 6, 7],
}


def parse_args(argv):
    parser = argparse.ArgumentParser(
        description="running parameters",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--seed", default=903, type=int)
    parser.add_argument("--outf", default="unify")
    parser.add_argument("--config", type=str)
    parser.add_argument("--arch", type=str)
    parser.add_argument("-p", "--print-freq", default=50, type=int)
    parser.add_argument("--data_path", type=str)
    parser.add_argument("--vid", type=str)
    parser.add_argument("--data_split", type=str, default="1_1_1")
    parser.add_argument("--batch_size", default=12, type=int)
    parser.add_argument("--hadamard", action="store_true")
    parser.add_argument("--channel_wise", action="store_true")
    parser.add_argument("--init", default="max", type=str,
                        choices=["max", "mse", "gaussian", "l1", "l2"])
    parser.add_argument("--mode", default="omega", type=str,
                        choices=["omega", "fisher_diag"])
    parser.add_argument("--ckpt", default="None", type=str)
    parser.add_argument("--hvp_impl", default="xla", type=str,
                        choices=["pallas", "xla"],
                        help="HVP decode execution. 'xla' (default): the "
                             "XLA packed path — measured FASTER for the "
                             "10-batch HVP at Bunny scale (3.9 vs 9.4 s "
                             "per candidate warm; the pallas_hvp jvp rule "
                             "pays 3 conv calls/layer without act fusion). "
                             "'pallas': the fused kernels via the "
                             "custom_jvp tail (tail_apply_fo) — validated "
                             "bit-comparable (3.881e-03 vs 3.883e-03 on "
                             "the reference winner), for geometries where "
                             "the XLA packed execution is the slow path "
                             "(UVG-scale plans)")
    parser.add_argument("--remat", action="store_true",
                        help="jax.checkpoint the HVP loss (fits PNeRV's "
                             "batch-2 HVP in HBM at the cost of recompute)")
    parser.add_argument("--candidates", default="", type=str,
                        help="optional: semicolon-separated bit lists, e.g. "
                             "'6,5,4,5,5,6,6;2,3,4,6,4,4,2' (defaults to the "
                             "reference's toy candidates)")
    parser.add_argument("--search", default="", type=str,
                        choices=["", "lagrangian"],
                        help="omega-guided allocation SEARCH instead of "
                             "scoring a fixed candidate list: per-layer "
                             "score curves from uniform-bit HVPs -> "
                             "Lagrangian lambda-sweep proposals under "
                             "--target_avg_bits -> exact omega re-scoring "
                             "of the proposals (the criterion stays the "
                             "reference's, the search only nominates)")
    parser.add_argument("--target_avg_bits", default=5.0, type=float,
                        help="parameter-weighted average-bit budget for "
                             "--search")
    parser.add_argument("--bit_range", default=[2, 8], type=int, nargs=2,
                        help="inclusive per-layer bit range for --search")
    return parser.parse_args(argv)


def lagrangian_candidates(curves, p_l, bit_choices, target_avg: float,
                          n_keep: int = 4):
    """Bit allocations minimizing sum_l s_l(b_l) + lambda * sum_l p_l b_l
    over a lambda sweep, filtered to the average-bit budget.

    curves: {b: [s_l for each layer]} per-layer omega scores at uniform-b
    allocations (block-diagonal surrogate of the joint criterion); p_l:
    per-layer parameter counts. Returns up to n_keep allocations on the
    budget's efficient edge (highest average bits <= target), always
    including the best-scoring single proposal."""
    p = np.asarray(p_l, np.float64)
    p_frac = p / p.sum()
    n_layers = len(p_l)
    seen = {}
    for lam in np.logspace(-8, 4, 200):
        bits = [min(bit_choices,
                    key=lambda b: curves[b][l] + lam * p_frac[l] * b)
                for l in range(n_layers)]
        avg = float((p * np.asarray(bits)).sum() / p.sum())
        if avg <= target_avg + 1e-9:
            surrogate = float(sum(curves[b][l] for l, b in enumerate(bits)))
            seen[tuple(bits)] = (avg, surrogate)
    if not seen:
        lo = min(bit_choices)
        return [[lo] * n_layers]
    ranked = sorted(seen.items(), key=lambda kv: -kv[1][0])  # avg desc
    keep = [list(k) for k, _ in ranked[:n_keep]]
    best_sur = min(seen.items(), key=lambda kv: kv[1][1])[0]
    if list(best_sur) not in keep:
        keep.append(list(best_sur))
    return keep


def assign(args, cfg):
    common.seed_all(args.seed)
    args.metric_names = common.METRIC_NAMES

    dataset = VideoDataSet(cfg, args.data_path)
    common.split_dataset(args, dataset)

    rng = jax.random.PRNGKey(args.seed)
    # The omega criterion is an HVP, computed reverse-over-forward:
    # Hv = grad(w -> jvp(L, w, v)). The 'pallas_hvp' tail execution carries
    # a custom_jvp rule built from first-order Pallas conv primitives
    # (tail_fused.tail_apply_fo), so both differentiation passes run the
    # fused kernels. --hvp_impl xla selects the XLA packed execution instead
    # (identical math; the round-3 fallback). Infeasible plans demote
    # automatically (gate_fused_impl).
    # fisher_diag is a plain gradient — the production fused tail handles it
    cfg["fused_tail"] = ("off" if args.hvp_impl == "xla" else
                         "pallas_hvp" if args.mode == "omega" else "auto")
    model, params = common.setup_run(args, cfg, rng)
    args.outf = os.path.join(
        args.outf, "sensitivity-{}_{}-init_batch{}_CW".format(
            args.mode, args.init, args.batch_size))
    os.makedirs(args.outf, exist_ok=True)
    setup_logger(os.path.join(args.outf, time.strftime("%Y%m%d_%H%M%S") + ".log"))

    assert args.ckpt != "None"
    logging.info("=> loading checkpoint '{}'".format(args.ckpt))
    params = load_pth(args.ckpt, args.arch, params)

    logging.info("=======================Full-precision model========================")
    print_str = "Evaluation ... \n {} Results for checkpoint: {}\n".format(
        datetime.now().strftime("%Y_%m_%d_%H_%M_%S"), args.ckpt)
    results, _, _ = common.evaluate(model, params, dataset, args, cfg)
    s, _ = common.best_metrics_str(results)
    logging.info(print_str + s)

    if args.search == "lagrangian":
        # Phase A: per-layer omega curves from uniform-bit allocations —
        # (Hv)_l . v_l under the joint uniform-b perturbation, the same
        # quantity the reference logs per layer (bit_assign.py:195-203)
        bit_choices = list(range(args.bit_range[0], args.bit_range[1] + 1))
        n_layers = len(make_spec(args.arch, cfg).layer_names)
        curves = {}
        for b in bit_choices:
            spec = make_spec(args.arch, cfg, channel_wise=args.channel_wise,
                             scale_method=args.init,
                             hadamard=args.hadamard).with_bits([b] * n_layers)
            state = init_quant_state(params, spec)
            _, per_layer = sensitivity_criterion(
                args.mode, args.arch, model, params, spec, state,
                dataset.frames, dataset.norm_idx, args.batch_size,
                seed=args.seed, remat=args.remat,
                log_fn=lambda s: None)
            curves[b] = per_layer
            logging.info(f"[search] uniform W{b}: per-layer "
                         + " ".join(f"{v:.2e}" for v in per_layer))
        from neuroquant_tpu.quantization.qmodel import _get
        spec0 = make_spec(args.arch, cfg, channel_wise=args.channel_wise,
                          scale_method=args.init, hadamard=args.hadamard)
        p_l = [int(np.prod(_get(params, p)["kernel"].shape))
               + int(np.prod(_get(params, p)["bias"].shape))
               for p in spec0.layer_paths]
        cands = lagrangian_candidates(curves, p_l, bit_choices,
                                      args.target_avg_bits)
        candidate_dict = {f"lagrangian{i + 1}": c
                          for i, c in enumerate(cands)}
        logging.info(f"[search] {len(cands)} proposals under avg "
                     f"{args.target_avg_bits}: {cands}")
    elif args.candidates:
        candidate_dict = {
            f"candidate{i + 1}": [int(b) for b in c.split(",")]
            for i, c in enumerate(args.candidates.split(";"))}
    elif args.arch == "hnerv":
        candidate_dict = HNERV_CANDIDATES
    elif args.arch == "nerv":
        candidate_dict = NERV_CANDIDATES
    else:
        raise ValueError(f"no default candidates for arch {args.arch}")

    best_score, best_candidate, best_bits = float("inf"), None, None
    for candidate, bits in candidate_dict.items():
        spec = make_spec(args.arch, cfg, channel_wise=args.channel_wise,
                         scale_method=args.init,
                         hadamard=args.hadamard).with_bits(bits)
        state = init_quant_state(params, spec)
        avg_bits = average_bits(params, spec)
        logging.info(f"[{candidate}: {bits}] Average Quantization Bit-Width:\t"
                     f"{avg_bits:.4f}")

        score, _ = sensitivity_criterion(
            args.mode, args.arch, model, params, spec, state,
            dataset.frames, dataset.norm_idx, args.batch_size, seed=args.seed,
            remat=args.remat)
        logging.info(f"[{candidate}: {bits}] The {args.mode} sensitivity "
                     f"score =\t{score:.3e}")
        if score < best_score:
            best_score, best_candidate, best_bits = score, candidate, bits

    logging.info("=" * 60)
    logging.info(f"Best Candidate: {best_candidate}")
    logging.info(f"Bit Configuration: {best_bits}")
    logging.info(f"Minimum Score: {best_score:.4e}")
    logging.info("=" * 60)
    return best_candidate, best_bits, best_score


def main(argv):
    common.enable_persistent_cache()
    args = parse_args(argv)
    cfg = validate_config(get_config(args.config), args.arch)
    args.outf = os.path.join("results", args.outf)
    args.exp_id = common.exp_id(args, cfg)
    args.outf = os.path.join(args.outf, args.exp_id)
    return assign(args, cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
