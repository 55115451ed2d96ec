"""Data parallelism over frames via jax.sharding — the TPU-native answer to
the reference's (absent) distributed story.

The reference is single-GPU (SURVEY.md §2.9: torch.distributed imported but
never used; MPI only in the vendored loss-landscape tool). The natural scaling
axis for per-video INR overfitting/calibration is the *frame batch*: params
are replicated, batches are sharded over a 1-D 'data' mesh, and XLA inserts
the psum for gradients over ICI. The same mesh parallelizes eval sweeps and
the loss-landscape grid (draw/loss_landscape.py).

Everything here works identically on a real multi-chip TPU slice and on a
virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N), which
is how tests and the driver's multi-chip dry-run validate the shardings.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n <= len(devs), f"need {n} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n]), (axis,))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Shard the leading (batch/frame) axis across the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def data_parallel_step(step_fn: Callable, mesh: Mesh, axis: str = "data",
                       donate_state: bool = True):
    """Wrap `step_fn(state, batch) -> (state, aux)` for DP execution.

    state is replicated, batch sharded on its leading axis; jit + sharding
    annotations let XLA insert the gradient all-reduce over ICI. No pmap, no
    explicit collectives — the compiler owns the schedule.
    """
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))
    return jax.jit(
        step_fn,
        in_shardings=(repl, shard),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )
