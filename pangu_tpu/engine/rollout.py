"""Autoregressive multi-day rollout as a compiled ``lax.scan``.

Replaces the reference's host-side ONNX-runtime feedback loop
(/root/reference/inference/inference_singleOutput.py:92-105), where every
24 h step round-trips the full state through host numpy. Here the whole
rollout is one XLA program: the state stays on device, buffers are donated
so the output of step t is written in place as the input of step t+1, and
de-normalisation + re-normalisation between steps fuse into the model.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pangu_tpu.config import ModelConfig
from pangu_tpu.data.constants import denorm_data
from pangu_tpu.models import pangu


def single_step(params, upper, surface, constants, cfg: ModelConfig,
                precision=None):
    """One 24 h forecast in *physical* units: forward (normalises inside)
    then de-normalise the prediction (models/pangu_sample.py:200-205)."""
    out_u, out_s = pangu.forward(params, upper, surface, constants, cfg,
                                 deterministic=True, precision=precision)
    return denorm_data(out_u, out_s, constants)


def make_rollout(cfg: ModelConfig, constants, steps: int, *,
                 return_trajectory: bool = False, precision=None):
    """Build a jitted rollout fn: (params, upper, surface) -> final state
    [, stacked per-step trajectory]. ``steps`` = horizon // 24
    (inference_singleOutput.py:92). State buffers are donated."""

    def rollout(params, upper, surface):
        def body(carry, _):
            u, s = single_step(params, carry[0], carry[1], constants, cfg,
                               precision)
            return (u, s), ((u, s) if return_trajectory else None)

        (u, s), traj = jax.lax.scan(body, (upper, surface), None,
                                    length=steps)
        return ((u, s), traj) if return_trajectory else (u, s)

    return jax.jit(rollout, donate_argnums=(1, 2))
