"""Device-mesh construction and axis conventions.

Replaces the reference's NCCL/torch.distributed scaffolding
(/root/reference/era5_data/utils_dist.py:13-59) with the JAX-native story:
``jax.distributed.initialize`` for multi-host launch, a named
``jax.sharding.Mesh`` over ICI, and XLA collectives compiled into the step
by GSPMD — including the gradient all-reduce the reference forgot to wire
(utils_dist.py:125 ``gather_grad`` is never called; SURVEY.md §2.4).

Axis conventions (see pangu_tpu/parallel/sharding.py for the specs):
  dp — batch data parallelism (gradient psum over this axis)
  sp — longitude (sequence/spatial) parallelism: the (H, W) token grid is
       sharded along W; windowed attention is local in W, so communication
       is only the halo/permute XLA inserts for rolls and patch merges
  tp — tensor parallelism over attention heads / MLP hidden
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh

from pangu_tpu.config import MeshConfig

AXES = ("dp", "sp", "tp")


_DISTRIBUTED_INITIALIZED = False


def _should_initialize(environ=None) -> bool:
    """True when the environment describes a multi-process launch: an
    explicit coordinator address (the reference's env-var launcher,
    utils_dist.py:24-28) or a multi-task SLURM allocation (its SLURM
    launcher, utils_dist.py:31-59 — JAX's cluster autodetection derives
    the coordinator from SLURM_* itself)."""
    env = os.environ if environ is None else environ
    if ("JAX_COORDINATOR_ADDRESS" in env or "COORDINATOR_ADDRESS" in env):
        return True
    try:
        return int(env.get("SLURM_NTASKS", "1")) > 1
    except ValueError:
        return False


def initialize_distributed(environ=None) -> None:
    """Multi-host bring-up (idempotent). MUST be called before anything
    touches the backend: ``jax.devices()``/``jax.process_count()``
    initialise the *local* backend, after which
    ``jax.distributed.initialize()`` is too late — so this guards with a
    module flag plus the distributed client state, never with a backend
    query."""
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return
    try:  # already initialised elsewhere (e.g. by a launcher wrapper)?
        from jax._src import distributed as _dist
        if _dist.global_state.client is not None:
            _DISTRIBUTED_INITIALIZED = True
            return
    except Exception:
        pass
    if _should_initialize(environ):
        jax.distributed.initialize()
        _DISTRIBUTED_INITIALIZED = True


def build_mesh(cfg: MeshConfig, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = cfg.dp * cfg.sp * cfg.tp
    if n > len(devices):
        raise ValueError(
            f"mesh {cfg} needs {n} devices, have {len(devices)}")
    # Auto axis types: classic GSPMD propagation from the few annotations in
    # pangu_tpu/parallel/sharding.py (JAX 0.9 defaults to Explicit mode).
    return jax.make_mesh((cfg.dp, cfg.sp, cfg.tp), AXES,
                         devices=devices[:n],
                         axis_types=(jax.sharding.AxisType.Auto,) * 3)


def auto_mesh_config(n_devices: int, *, lon_windows: int = 30,
                     max_heads: int = 6, batch: int = 0) -> MeshConfig:
    """Choose (dp, sp, tp) with dp | batch, sp | lon_windows (half-res
    longitude window count) and tp | max_heads (smallest head count).

    Searches all exact factorisations, preferring (in order) total devices
    used, then sp — longitude sharding cuts the dominant activation
    memory — then dp, then tp. May return a mesh smaller than n_devices
    when no exact factorisation satisfies the divisibility constraints
    (e.g. batch 1 on 8 chips); callers that require the full world should
    pick a batch size that factors.
    """
    batch = batch or 1
    best: Optional[Tuple[tuple, MeshConfig]] = None
    for dp in range(1, n_devices + 1):
        if batch % dp:
            continue
        for sp in range(1, n_devices // dp + 1):
            if dp * sp > n_devices or lon_windows % sp:
                continue
            for tp in range(1, n_devices // (dp * sp) + 1):
                size = dp * sp * tp
                if size > n_devices or max_heads % tp:
                    continue
                key = (size, sp, dp, tp)
                if best is None or key > best[0]:
                    best = (key, MeshConfig(dp=dp, sp=sp, tp=tp))
    assert best is not None
    if best[1].size < n_devices:
        import logging
        logging.getLogger("pangu_tpu").warning(
            "auto_mesh_config: no (dp,sp,tp) factorisation uses all "
            "%d devices (batch=%d, lon_windows=%d, heads=%d); using %s "
            "= %d devices — %d idle. Pick a batch size that factors.",
            n_devices, batch, lon_windows, max_heads, best[1], best[1].size,
            n_devices - best[1].size)
    return best[1]
