"""PNeRV BSM stage-3 probe: where do the 7.2 ms/frame go and what do
candidate fusions buy? (round-4 anatomy: block conv 2.2, KFc+norm 0.6,
bsm_z/r convs 1.7, bsm_h + gate elementwise 3.2 at (320, 640, 100).)

Times, on one chip at the real stage-3 geometry (batch 1):
  1. the current _fuse composition (XLA)
  2. gate algebra r + att*(x - r)  (one fewer elementwise pass)
  3. bf16 elementwise domain
  4. the two elementwise chains as explicit single-pass Pallas kernels
     (memory = relu(z+r); out = sigmoid(h)*x + (1-sigmoid(h))*r)

Methodology: timed_scan with index-consuming bodies + host-fetch sync
(see calib_breakdown.py traps)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

H, W, C = 320, 640, 100
B = 1

_FETCH = [None]


def fetch_baseline():
    if _FETCH[0] is None:
        f = jax.jit(lambda x: jnp.sum(x))
        x = jnp.ones((8, 128))
        float(f(x))
        t0 = time.time()
        float(f(x))
        _FETCH[0] = time.time() - t0
    return _FETCH[0]


def timed(fn, args, iters=100):
    @jax.jit
    def loop(*a):
        def body(acc, i):
            out = fn(i, *a)
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(iters))
        return acc

    float(loop(*args))
    t0 = time.time()
    float(loop(*args))
    return (time.time() - t0 - fetch_baseline()) / iters * 1e3


def conv3(x, w, b):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn) + b


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C) * 0.1, jnp.float32)
    pym = jnp.asarray(rng.randn(B, H, W, C) * 0.1, jnp.float32)
    wz, wr, wh = (jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.float32)
                  for _ in range(3))
    bz, br, bh = (jnp.asarray(rng.randn(C) * 0.01, jnp.float32)
                  for _ in range(3))

    def cur(i, x, pym):
        xx = x + i * 1e-30
        z = conv3(xx, wz, bz)
        r = conv3(pym, wr, br)
        memory = jax.nn.relu(z + r)
        att = jax.nn.sigmoid(conv3(memory, wh, bh))
        return att * xx + (1 - att) * r

    def lerp(i, x, pym):
        xx = x + i * 1e-30
        z = conv3(xx, wz, bz)
        r = conv3(pym, wr, br)
        memory = jax.nn.relu(z + r)
        att = jax.nn.sigmoid(conv3(memory, wh, bh))
        return r + att * (xx - r)

    def bf16(i, x, pym):
        xx = (x + i * 1e-30).astype(jnp.bfloat16)
        py = pym.astype(jnp.bfloat16)
        z = conv3(xx, wz.astype(jnp.bfloat16), bz.astype(jnp.bfloat16))
        r = conv3(py, wr.astype(jnp.bfloat16), br.astype(jnp.bfloat16))
        memory = jax.nn.relu(z + r)
        att = jax.nn.sigmoid(conv3(memory, wh.astype(jnp.bfloat16),
                                   bh.astype(jnp.bfloat16)))
        return (r + att * (xx - r)).astype(jnp.float32)

    # isolate: convs only (no gate elementwise)
    def convs_only(i, x, pym):
        xx = x + i * 1e-30
        z = conv3(xx, wz, bz)
        r = conv3(pym, wr, br)
        h = conv3(z, wh, bh)
        return z + r + h

    # isolate: gate elementwise only (conv outputs precomputed)
    z0 = conv3(x, wz, bz)
    r0 = conv3(pym, wr, br)
    h0 = conv3(jax.nn.relu(z0 + r0), wh, bh)

    def gate_only(i, x, pym):
        xx = x + i * 1e-30
        att = jax.nn.sigmoid(h0 + i * 1e-30)
        return att * xx + (1 - att) * r0

    print(f"fetch baseline {fetch_baseline()*1e3:.1f} ms")
    for name, fn in [("current _fuse chain", cur),
                     ("lerp algebra", lerp),
                     ("bf16 domain", bf16),
                     ("convs only (z,r,h)", convs_only),
                     ("gate elementwise only", gate_only)]:
        print(f"{name:28s} {timed(fn, (x, pym)):7.2f} ms/frame")


if __name__ == "__main__":
    main()
