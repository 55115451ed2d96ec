"""Cross-framework parity against the ACTUAL reference implementation.

Imports the torch NeRV from /root/reference (timm stubbed — it is only
needed for ConvNeXt init helpers), copies its random init into our Flax
model via the state-dict mapping, and trains BOTH with the same frame
order and per-step lr schedule. The PSNR trajectories must match to
~1e-3 dB: this pins model semantics, PositionEncoding values, Adam, and
the lr schedule all at once.

Skipped when /root/reference is not mounted.
"""

import math
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(os.path.join(REF, "models")),
                                reason="reference repo not mounted")


def _import_reference_nerv():
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        ml = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")

        def trunc_normal_(t, std=.02):
            return t.normal_(0, std)

        class DropPath:          # only instantiated for drop_path > 0
            def __init__(self, *a, **k):
                pass

        layers.trunc_normal_ = trunc_normal_
        layers.DropPath = DropPath
        sys.modules.update({"timm": timm, "timm.models": ml,
                            "timm.models.layers": layers})
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.NeRV import NeRV as RefNeRV
    return RefNeRV


def test_nerv_training_trajectory_matches_reference(frame_dir):
    import torch
    import jax
    import jax.numpy as jnp
    import optax

    from neuroquant_tpu.data import VideoDataSet
    from neuroquant_tpu.models import build_model
    from neuroquant_tpu.schedules import make_lr_schedule
    from neuroquant_tpu.utils.torch_compat import state_dict_to_params

    RefNeRV = _import_reference_nerv()

    N, E = 6, 2
    cfg = dict(crop_h=80, crop_w=160, diff_enc=False, base=1.25, level=16,
               channel_reduce=2, channel_lbound=6, dec_in_channel=32,
               dec_kernels=[3, 3, 3], dec_strides=[5, 4, 4], dec_norm="none",
               dec_acts="gelu", out_bias="tanh", loss="l2", epoch=E,
               workers=0, eval_freq=1, batch_size=1, learning_rate=2e-3)
    ds = VideoDataSet(cfg, frame_dir)
    frames = np.asarray(ds.frames[:N])
    nidx64 = np.arange(N, dtype=np.float64) / N   # collate semantics: float64

    torch.manual_seed(903)
    ref = RefNeRV(cfg)

    cfg["n_frames"] = N
    ours = build_model("nerv", cfg)
    params = ours.init(jax.random.PRNGKey(0),
                       jnp.asarray(nidx64[:1], jnp.float32))
    params = state_dict_to_params("nerv", ref.state_dict(), params)

    # identical forward at init (incl. the PositionEncoding table)
    with torch.no_grad():
        ref_out, _, _ = ref.decode(ref.encode(torch.tensor(nidx64[:2])))
    our_out = ours.apply(params, jnp.asarray(nidx64[:2], jnp.float32))
    assert np.abs(ref_out.permute(0, 2, 3, 1).numpy()
                  - np.asarray(our_out)).max() < 1e-5

    sched = make_lr_schedule("cosine_0.1_1_0.1", 2e-3, E * N)
    t_frames = torch.from_numpy(frames).permute(0, 3, 1, 2).contiguous()

    def psnr_of(mses):
        return float(np.mean([-10 * math.log10(m + 1e-9) for m in mses]))

    # --- reference training ---
    opt_t = torch.optim.Adam(ref.parameters(), lr=2e-3, weight_decay=0)
    ref_traj, step = [], 0
    for e in range(E):
        for i in np.random.RandomState(100 + e).permutation(N):
            for g in opt_t.param_groups:
                g["lr"] = float(sched(step))
            step += 1
            out, _, _ = ref(torch.tensor(nidx64[i:i + 1]))
            loss = torch.mean((out - t_frames[i:i + 1]) ** 2)
            opt_t.zero_grad(); loss.backward(); opt_t.step()
        with torch.no_grad():
            ref_traj.append(psnr_of(
                [float(torch.mean((ref(torch.tensor(nidx64[i:i + 1]))[0]
                                   - t_frames[i:i + 1]) ** 2))
                 for i in range(N)]))

    # --- ours ---
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=2e-3, eps=1e-8)
    ostate = opt.init(params)
    jf, jn = jnp.asarray(frames), jnp.asarray(nidx64, jnp.float32)

    @jax.jit
    def train_step(params, ostate, i, lr):
        def loss_fn(p):
            out = ours.apply(p, jn[i][None])
            return jnp.mean((out - jf[i][None]) ** 2)
        _, g = jax.value_and_grad(loss_fn)(params)
        ostate.hyperparams["learning_rate"] = lr
        upd, ostate = opt.update(g, ostate, params)
        return optax.apply_updates(params, upd), ostate

    @jax.jit
    def eval_mses(params):
        out = ours.apply(params, jn)
        return jnp.mean((out - jf) ** 2, axis=(1, 2, 3))

    our_traj, step = [], 0
    for e in range(E):
        for i in np.random.RandomState(100 + e).permutation(N):
            params, ostate = train_step(params, ostate, int(i),
                                        float(sched(step)))
            step += 1
        our_traj.append(psnr_of(np.asarray(eval_mses(params))))

    np.testing.assert_allclose(our_traj, ref_traj, atol=2e-3)
