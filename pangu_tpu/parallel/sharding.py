"""Sharding rules: how params, optimizer state, batches and activations
lay out over the (dp, sp, tp) mesh.

The design follows the scaling-book recipe: annotate a small number of
shardings (params, inputs, a token-grid constraint per stage) and let
GSPMD propagate and insert collectives. This is the TPU-native
replacement for the reference's (absent) model parallelism and its broken
data parallelism (SURVEY.md §2.4):

  * dp shards the batch; the gradient psum is compiled into the jitted
    step automatically;
  * sp shards the longitude axis of both the raw (lat, lon) fields and
    the (B, Z, H, W, C) token grid — windowed attention is W-local, so the
    only sp communication is the halo/permute traffic from rolls
    (models/layers.py:199-201 becomes a collective permute over ICI) and
    patch-merge boundaries;
  * tp shards the earth-specific bias tables — by far the largest
    parameter group (~87% of all weights) — along their z-type-major
    window-type axis, which is exactly how the wm trunk shards compute
    (z windows over tp, models/pangu.wm_core_mesh); the MLP hidden
    dimension and the proj input rows additionally shard megatron-style
    for the XLA fallback paths.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


# ---- activation constraints ----------------------------------------------

TOKEN_SPEC = P("dp", None, None, "sp", None)       # (B, Z, H, W, C)
UPPER_SPEC = P("dp", None, None, None, "sp")       # (B, V, L, lat, lon)
SURFACE_SPEC = P("dp", None, None, "sp")           # (B, V, lat, lon)


def _mesh_axes():
    mesh = jax.sharding.get_abstract_mesh()
    return getattr(mesh, "axis_names", ()) or ()


def constrain(x, spec: P):
    """Apply a sharding constraint when (and only when) running under a
    mesh that defines the referenced axes; no-op single-device."""
    axes = _mesh_axes()
    if not axes:
        return x
    if any(a is not None and a not in axes for a in spec):
        return x
    return jax.lax.with_sharding_constraint(x, spec)


def shard_tokens(x):
    return constrain(x, TOKEN_SPEC)


def multi_device_mesh_active() -> bool:
    """True when running under a mesh with more than one device — used to
    gate single-device-only code paths (e.g. Pallas kernels, which GSPMD
    cannot partition; the XLA path shards cleanly instead)."""
    mesh = jax.sharding.get_abstract_mesh()
    shape = getattr(mesh, "shape", None) or {}
    try:
        sizes = list(shape.values())
    except AttributeError:
        sizes = list(shape)
    return any(s > 1 for s in sizes)


# ---- parameter / optimizer-state layout ----------------------------------

def param_spec(path: tuple, leaf) -> P:
    """PartitionSpec for one parameter leaf, keyed by its pytree path."""
    names = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    if leaf.ndim == 0 or any(isinstance(n, str) and n.startswith("lora")
                             for n in names):
        return P()   # scalars + LoRA factors (tiny) stay replicated
    if "bias_table" in names:
        # (ntype, heads, N, N): shard the z-type-major type axis — the
        # layout the wm trunk's tp (z-window) sharding consumes directly
        # (spec_b reads rows zz*nlat+hh, ops/earth_block_wm.py), so the
        # ~87%-of-params tables never reshard on the fast path
        return P("tp", None, None, None)
    if "mlp" in names and "fc1" in names:
        return P(None, "tp") if leaf.ndim == 2 else P("tp")
    if "mlp" in names and "fc2" in names:
        return P("tp", None) if leaf.ndim == 2 else P(None)
    if "attn" in names and "proj" in names and leaf.ndim == 2:
        # proj input rows are head-major: row-shard aligns with
        # head-parallel attention outputs
        return P("tp", None)
    return P()


def param_shardings(mesh, params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf)),
        params)


def batch_shardings(mesh):
    return {
        "upper": NamedSharding(mesh, UPPER_SPEC),
        "surface": NamedSharding(mesh, SURFACE_SPEC),
        "target_upper": NamedSharding(mesh, UPPER_SPEC),
        "target_surface": NamedSharding(mesh, SURFACE_SPEC),
    }


def replicated(mesh):
    return NamedSharding(mesh, P())
