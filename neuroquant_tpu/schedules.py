"""Learning-rate schedules parsed from strings like ``cosine_0.1_1_0.1``.

Reference semantics: utils.py:79-99 (`adjust_lr`), evaluated per *fractional
epoch* ``(epoch + step/steps_per_epoch) / total_epochs``. Re-expressed here as a
pure function of progress t in [0, 1) so it can live inside a jitted train step
(an optax-style schedule over the flat step counter is provided too).
"""

from __future__ import annotations

import math
from functools import partial

import jax.numpy as jnp


def lr_multiplier(lr_type: str, t, eta_min: float = 0.05):
    """Multiplier on the base lr at training progress t ∈ [0, 1).

    Accepts python floats or traced jnp scalars. `lr_type` grammar matches
    utils.py:79-99: ``cosine_<up_ratio>_<up_pow>_<min_lr>`` or
    ``hybrid_<up_ratio>_<up_pow>_<down_pow>_<min_lr>_<final_lr>``.
    """
    parts = lr_type.split("_")
    kind = parts[0]
    if "hybrid" in kind:
        up_ratio, up_pow, down_pow, min_lr, final_lr = [float(x) for x in parts[1:]]
        warm = min_lr + (1.0 - min_lr) * (t / up_ratio) ** up_pow
        decay = 1 - (1 - final_lr) * ((t - up_ratio) / (1.0 - up_ratio)) ** down_pow
        return jnp.where(t < up_ratio, warm, decay)
    elif "cosine" in kind:
        up_ratio, up_pow, min_lr = [float(x) for x in parts[1:]]
        warm = min_lr + (1.0 - min_lr) * (t / up_ratio) ** up_pow
        cos = 0.5 * (jnp.cos(math.pi * (t - up_ratio) / (1 - up_ratio)) + 1.0)
        cos = jnp.maximum(cos, eta_min)
        return jnp.where(t < up_ratio, warm, cos)
    raise NotImplementedError(f"unknown lr_type {lr_type!r}")


def make_lr_schedule(lr_type: str, base_lr: float, total_steps: int,
                     eta_min: float = 0.05):
    """optax-compatible schedule over the flat step counter.

    Progress per step matches the reference's per-step fractional-epoch update
    (methods/regress.py:260-261): t = step / total_steps.
    """
    def schedule(step):
        t = step / total_steps
        return base_lr * lr_multiplier(lr_type, t, eta_min)
    return schedule


def data_split(img_list, split_num_list, shuffle_data: bool = False, rand_num: int = 0):
    """Seen/unseen frame split ``a_b_c`` (reference: utils.py:42-53).

    For every window of c frames, the first a are training ("seen") and frames
    at positions >= b are validation ("unseen").
    """
    import random

    valid_train_length, total_train_length, total_data_length = split_num_list
    img_list = list(img_list)
    if shuffle_data:
        random.Random(rand_num).shuffle(img_list)
    train_list, val_list = [], []
    for cur_i, frame_id in enumerate(img_list):
        if (cur_i % total_data_length) < valid_train_length:
            train_list.append(frame_id)
        elif (cur_i % total_data_length) >= total_train_length:
            val_list.append(frame_id)
    return train_list, val_list
