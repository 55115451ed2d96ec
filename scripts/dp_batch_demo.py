"""DP calibration at a chip-filling batch: quality parity demonstration.

The multi-chip throughput claim ("DP multiplies calibration throughput by
the chip count") requires running the network-wise calibration at a batch
that actually fills the chips: a v5e-8 at 2 frames/chip means batch 16, not
the reference's batch 2. Batch size changes the optimization itself —
steps_per_epoch = len(train)//batch and total epochs = int(iters/spe)
(reference calib_model.py:120-228; same math in quantization/calibrate.py)
— so a measured quality-parity run is needed, not an extrapolation.

This script runs BOTH configurations on the virtual 8-device CPU mesh
(tests/conftest.py's environment) over a real Bunny crop (subsampled with
--frame_step to fit the 1-core CPU-mesh budget):
  A) batch 2,  1 device   (the reference configuration)
  B) batch 16, 8 devices  (2 frames/chip DP over the mesh)
with the SAME total optimization-step budget (`iters` counts steps in both,
reference semantics), and reports quantized PSNR for each.

Usage:  python scripts/dp_batch_demo.py [--iters 1056] [--crop 120 240]
        (self-re-execs onto the virtual CPU mesh if needed)
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def reexec_on_cpu_mesh(n: int):
    if os.environ.get("NQ_DP_DEMO_CHILD"):
        return
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={n}").strip()
    env["NQ_DP_DEMO_CHILD"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=528)
    ap.add_argument("--crop", type=int, nargs=2, default=[80, 160])
    ap.add_argument("--frame_step", type=int, default=2,
                    help="keep every k-th frame (1-core CPU-mesh budget)")
    ap.add_argument("--data_path", default="/root/reference/bunny")
    ap.add_argument("--out", default="results/dp_batch_demo.json")
    args = ap.parse_args()
    reexec_on_cpu_mesh(8)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuroquant_tpu.data import VideoDataSet
    from neuroquant_tpu.metrics import psnr_fn_single
    from neuroquant_tpu.models import build_model
    from neuroquant_tpu.parallel import make_mesh
    from neuroquant_tpu.quantization import init_quant_state, make_spec
    from neuroquant_tpu.quantization.calibrate import model_reconstruction
    from neuroquant_tpu.quantization.qmodel import quantize_params

    h, w = args.crop
    cfg = dict(
        crop_h=h, crop_w=w, diff_enc=False, stage_block=1,
        enc_strides=[5, 2, 2], enc_channel=[16, 16, 8],
        channel_reduce=1.2, channel_lbound=4, dec_in_channel=24,
        dec_kernels=[1, 3, 3], dec_strides=[5, 2, 2], dec_norm="none",
        dec_acts="gelu", out_bias="tanh", loss="l2", epoch=30, workers=0,
        eval_freq=10, batch_size=2, learning_rate=0.002)
    dataset = VideoDataSet(cfg, args.data_path)
    frames = dataset.frames[::args.frame_step]
    n = frames.shape[0]
    print(f"devices: {len(jax.devices())}, frames: {n} @ {h}x{w}",
          flush=True)

    model = build_model("hnerv", cfg)
    params = model.init(jax.random.PRNGKey(903), frames[:1])

    # a short FP32 overfit so the quantization has signal to preserve
    import optax
    opt = optax.adam(2e-3, eps=1e-8)

    @jax.jit
    def train_epoch(params, opt_state, frames):
        def step(carry, idx):
            params, opt_state = carry
            def loss(p):
                pred = model.apply(p, frames[idx])
                return jnp.mean((pred - frames[idx]) ** 2)
            l, g = jax.value_and_grad(loss)(params)
            up, opt_state = opt.update(g, opt_state, params)
            return (optax.apply_updates(params, up), opt_state), l
        idxs = jnp.arange(n - n % 4).reshape(-1, 4)
        (params, opt_state), ls = jax.lax.scan(step, (params, opt_state),
                                               idxs)
        return params, opt_state, ls.mean()

    opt_state = opt.init(params)
    t0 = time.time()
    for e in range(30):
        params, opt_state, l = train_epoch(params, opt_state, frames)
    print(f"fp32 overfit: 30 epochs in {time.time() - t0:.0f}s "
          f"(loss {float(l):.5f})", flush=True)

    @jax.jit
    def eval_psnr(params, frames):
        def body(_, idx):
            emb = model.apply(params, frames[idx][None], method="encode")
            out = model.apply(params, emb, method="decode")
            return None, psnr_fn_single(out, frames[idx][None])
        _, ps = jax.lax.scan(body, None, jnp.arange(n))
        return ps.mean()

    fp32_psnr = float(eval_psnr(params, frames))
    cali = jax.jit(lambda p, x: model.apply(p, x, method="encode"))(
        params, frames)
    bits = [6, 5, 4, 5, 5]
    results = {"fp32_psnr": round(fp32_psnr, 3), "iters": args.iters,
               "crop": [h, w], "runs": {}}

    # Three configurations:
    #   batch2_1dev        — the reference semantics (the quality bar)
    #   batch16_8dev       — DP at 2 frames/chip, SAME step budget (8x the
    #                        frame passes; isolates the batch-semantics change)
    #   batch16_8dev_eq    — DP at 2 frames/chip, iters/8 steps (the SAME
    #                        total frame passes as the reference run — this is
    #                        the configuration behind the "v5e-8 multiplies
    #                        calibration wall-clock by the chip count" claim)
    for tag, batch, mesh_n, n_iters in (
            ("batch2_1dev", 2, 0, args.iters),
            ("batch16_8dev", 16, 8, args.iters),
            ("batch16_8dev_eq", 16, 8, max(args.iters // 8, 1))):
        spec = make_spec("hnerv", cfg, channel_wise=True, scale_method="max",
                         hadamard=True).with_bits(bits)
        state = init_quant_state(params, spec)
        mesh = make_mesh(mesh_n) if mesh_n else None
        spe = n // batch
        t0 = time.time()
        state, mode = model_reconstruction(
            model, params, spec, state, cali, frames, list(range(n)),
            batch_size=batch, iters=n_iters, weight=0.01,
            b_range=(20, 2), warmup=0.2, lr=0.003, seed=903,
            log_fn=lambda m: None, mesh=mesh)
        wall = time.time() - t0
        qp = quantize_params(params, spec, state, mode=mode, soft=False)
        q_psnr = float(eval_psnr(qp, frames))
        results["runs"][tag] = {
            "batch": batch, "devices": max(mesh_n, 1), "iters": n_iters,
            "steps_per_epoch": spe,
            "epochs": int(n_iters / spe),
            "quantized_psnr": round(q_psnr, 3),
            # quantized PSNR minus FP32 PSNR: positive = the quantized model
            # BEAT its fp32 parent (possible at this tiny scale where the
            # calibration's GT-frame loss keeps optimizing the reconstruction)
            "psnr_vs_fp32_db": round(q_psnr - fp32_psnr, 3),
            "wall_s": round(wall, 1),
        }
        print(f"{tag}: quantized {q_psnr:.3f} dB (fp32 {fp32_psnr:.3f}), "
              f"spe={spe}, wall={wall:.0f}s", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
