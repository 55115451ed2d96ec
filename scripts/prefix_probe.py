"""Prefix cost anatomy for the calibration step (HNeRV Bunny, batch 2).

The decode prefix (decoder0 + blocks[:pack_start] at 2x4 / 10x20 / 40x80)
runs as XLA convs; decode_stages measured 0.363 ms/frame forward. This
probe splits that between the tiny early stages and the last prefix block
(blocks[2]: 64->848 k=5 at 40x80, ~95% of prefix FLOPs), fwd and fwd+bwd,
to size the win of running blocks[2] through a 1-layer fused CF plan
(tail_apply) instead.

Run on the real TPU. Uses the scan-with-consumed-outputs methodology of
scripts/calib_breakdown.py (hoisting/DCE traps documented there).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from neuroquant_tpu.config import get_config
from neuroquant_tpu.models import build_model
from neuroquant_tpu.ops.pixelshuffle import pixel_shuffle

REPS = 100
BATCH = 2
N = 8


def main():
    cfg = get_config("configs/HNeRV/Bunny_1280x640_3M.yaml")
    model = build_model("hnerv", cfg)
    frames = jnp.asarray(np.random.RandomState(0).rand(N, 640, 1280, 3),
                         jnp.float32)
    params = model.init(jax.random.PRNGKey(903), frames[:1])
    cali = jax.jit(lambda p, x: model.apply(p, x, method="encode"))(
        params, frames)
    t = int(jax.eval_shape(
        lambda p: 0, params) is None)  # placeholder; pack_start read below

    def prefix_upto(m, emb, upto):
        c = m.cfg
        x = m.decoder0(emb)
        x = pixel_shuffle(x, (c.fc_h, c.fc_w))
        for j in range(upto):
            x = m.blocks[j](x)
        return x

    ps = model.apply(params, method=lambda m: m.pack_start)
    print(f"pack_start = {ps}")

    def bench(name, body):
        @jax.jit
        def run(params, cali):
            def step(acc, i):
                idx = (i + jnp.arange(BATCH)) % N
                return acc + body(params, cali[idx], i), None
            acc, _ = jax.lax.scan(step, 0.0, jnp.arange(REPS))
            return acc
        # float() fetch, not block_until_ready: the latter does not
        # synchronize through the tunneled backend for these programs
        # (decode_stages.py notes) — the first version of this probe read
        # dispatch-only times. The window carries one tunnel round trip;
        # subtract the measured null RTT (methods/common._null_rtt).
        from neuroquant_tpu.methods.common import _null_rtt
        rtt = _null_rtt()
        float(run(params, cali))
        t0 = time.time()
        float(run(params, cali))
        dt = (time.time() - t0 - rtt) / REPS * 1000
        print(f"{name:40s} {dt:7.3f} ms/iter")
        return dt

    # iteration-dependent input nudge so scan bodies are not hoisted
    def fwd(upto):
        def body(p, emb, i):
            emb = emb * (1.0 + i.astype(emb.dtype) * 1e-6)
            out = model.apply(p, method=lambda m: prefix_upto(m, emb, upto))
            return out.astype(jnp.float32).mean()
        return body

    def fwdbwd(upto):
        def body(p, emb, i):
            emb = emb * (1.0 + i.astype(emb.dtype) * 1e-6)

            def loss(pp):
                out = model.apply(
                    pp, method=lambda m: prefix_upto(m, emb, upto))
                return out.astype(jnp.float32).mean()
            l, g = jax.value_and_grad(loss)(p)
            return l + sum(jnp.sum(x) * 1e-30
                           for x in jax.tree_util.tree_leaves(g))
        return body

    bench("prefix fwd: dec0+PS only", fwd(0))
    for j in range(1, ps + 1):
        bench(f"prefix fwd: through block {j - 1}", fwd(j))
    bench("prefix fwd+bwd: dec0+PS only", fwdbwd(0))
    for j in range(1, ps + 1):
        bench(f"prefix fwd+bwd: through block {j - 1}", fwdbwd(j))


if __name__ == "__main__":
    main()
