"""PNeRV decode stage anatomy (one v5e chip): where do the 16.6 ms/frame go?

Times cumulative prefixes of the decode (exc block, each fusion stage, the
packed tail) plus within-stage pieces of the MOST expensive fusion stage
(block conv vs KFc+norm+act vs BSM convs vs gate elementwise), using the
scan-with-consumed-outputs methodology of scripts/calib_breakdown.py.
Informs whether stage packing / CF-Pallas stage convs are worth building
(VERDICT r4 item 5) or the bound is elsewhere (relayouts, norms, KFc
latency).
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

REPS = 50
BATCH = 1
N = 4


def main():
    cfg = get_config("configs/PNeRV/Bunny_1280x640_3M.yaml")
    model = build_model("pnerv", cfg)
    frames = jnp.asarray(np.random.RandomState(0).rand(N, 640, 1280, 3),
                         jnp.float32)
    params = model.init(jax.random.PRNGKey(903), frames[:1])
    cali = jax.jit(lambda p, x: model.apply(p, x, method="encode"))(
        params, frames)
    print("embedding:", cali.shape)

    def bench(name, method):
        @jax.jit
        def run(params, cali):
            def step(acc, i):
                idx = (i + jnp.arange(BATCH)) % N
                emb = cali[idx] + i.astype(cali.dtype) * 1e-30
                out = model.apply(params, emb, method=method)
                return acc + out.astype(jnp.float32).mean(), None
            acc, _ = jax.lax.scan(step, 0.0, jnp.arange(REPS))
            return acc
        # float() fetch, not block_until_ready: the latter does not
        # synchronize through the tunneled backend for these programs
        # (decode_stages.py notes) — the first version of this probe read
        # dispatch-only times (~0.01 ms for a 16 ms decode)
        float(run(params, cali))
        t0 = time.time()
        float(run(params, cali))
        dt = (time.time() - t0) / REPS * 1000
        print(f"{name:44s} {dt:8.3f} ms/frame-batch")
        return dt

    n_fused = len(cfg["kfc_strides"]) - 1

    def upto(n_stages, tail=False):
        def method(m, content):
            x = m.dec_exc(content)
            for i in range(min(n_stages, n_fused)):
                x = m._fuse(content, x, i)
            if tail:
                return m._tail(x)
            return x
        return method

    bench("exc block only", upto(0))
    for i in range(1, n_fused + 1):
        bench(f"through fusion stage {i - 1}", upto(i))
    bench("full decode (stages + packed tail)", upto(n_fused, tail=True))

    # within-stage pieces of the last (most expensive) fusion stage
    last = n_fused - 1

    def stage_piece(piece):
        def method(m, content):
            x = m.dec_exc(content)
            for i in range(last):
                x = m._fuse(content, x, i)
            i = last
            if piece == "block":
                return m.dec_layers[i](x)
            if piece == "kfc":
                pym = m.shortcuts[i](content)
                pym = m.shortcut_norms[i](pym)
                return m.act_fn(pym)
            x2 = m.dec_layers[i](x)
            pym = m.act_fn(m.shortcut_norms[i](m.shortcuts[i](content)))
            if piece == "bsm":
                return m.bsm_z[i](x2) + m.bsm_r[i](pym)
            # full gate
            memory = jax.nn.relu(m.bsm_z[i](x2) + m.bsm_r[i](pym))
            att = jax.nn.sigmoid(m.bsm_h[i](memory))
            return att * x2 + (1 - att) * m.bsm_r[i](pym)
        return method

    base = bench(f"stage {last}: prefix only (stages 0..{last - 1})",
                 upto(last))
    bench(f"stage {last}: + block conv", stage_piece("block"))
    bench(f"stage {last}: + KFc/norm/act alone", stage_piece("kfc"))
    bench(f"stage {last}: + block + bsm_z/r", stage_piece("bsm"))
    bench(f"stage {last}: full fuse", upto(last + 1))


if __name__ == "__main__":
    main()
