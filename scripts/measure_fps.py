"""Device-side decode throughput (frames/sec/chip) on the real TPU.

BASELINE.json's third metric. Reference numbers (single CUDA GPU, batch 1):
HNeRV FP32 ~174 FPS, NeRV FP32 ~402 FPS, HNeRV quantized ~84 FPS (the
reference's quantized decode runs fake-quant + FWHT inside every forward;
here the decoder is dequantized ONCE — the bitstream decode path — so the
quantized model decodes at FP32 speed).

Usage: python scripts/measure_fps.py <hnerv_ckpt> <nerv_ckpt> <calib_artifact>
"""

import logging
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

logging.basicConfig(stream=sys.stderr, level=logging.INFO)


def main(hnerv_ckpt, nerv_ckpt, artifact_path):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from neuroquant_tpu.config import get_config
    from neuroquant_tpu.data import VideoDataSet
    from neuroquant_tpu.methods.common import measure_decode_fps
    from neuroquant_tpu.models import build_model
    from neuroquant_tpu.quantization.qmodel import quantize_params
    from neuroquant_tpu.methods.eval_quantized import spec_from_artifact
    from neuroquant_tpu.utils.torch_compat import load_pth, state_dict_to_params

    out = {}

    # --- HNeRV FP32 + quantized ---
    cfg = get_config("configs/HNeRV/Bunny_1280x640_3M.yaml")
    ds = VideoDataSet(cfg, "/root/reference/bunny")
    model = build_model("hnerv", cfg)
    params = model.init(jax.random.PRNGKey(0), ds.frames[:1])
    params = load_pth(hnerv_ckpt, "hnerv", params)
    emb = jax.jit(lambda p, x: model.apply(p, x, method="encode"))(params, ds.frames)
    out["hnerv_fp32"] = measure_decode_fps(model, params, emb, 1)

    with open(artifact_path, "rb") as f:
        art = pickle.load(f)
    spec = spec_from_artifact(art)
    qparams = state_dict_to_params("hnerv", art["state_dict"], params)
    state = jax.tree_util.tree_map(jnp.asarray, art["quant_state"])
    qp = quantize_params(qparams, spec, state, mode="adaround", soft=False)
    out["hnerv_quantized"] = measure_decode_fps(model, qp, emb, 1)

    # --- NeRV FP32 ---
    cfg = get_config("configs/NeRV/Bunny_1280x640_3M.yaml")
    cfg["n_frames"] = len(ds)
    nmodel = build_model("nerv", cfg)
    nidx = jnp.asarray([0.0])
    nparams = nmodel.init(jax.random.PRNGKey(0), nidx)
    nparams = load_pth(nerv_ckpt, "nerv", nparams)
    nemb = jax.jit(lambda p, x: nmodel.apply(p, x, method="encode"))(nparams, ds.norm_idx)
    out["nerv_fp32"] = measure_decode_fps(nmodel, nparams, nemb, 1)

    for k, v in out.items():
        print(f"{k}: {v:.1f} FPS")


if __name__ == "__main__":
    main(*sys.argv[1:4])
