"""Top-level Pangu-Weather model: parameter pytree init + pure forward.

Reference: PanguModel (/root/reference/models/pangu_model.py:8-87) —
embed -> enc(2 blocks @192) -> skip -> downsample -> enc(6 @384) ->
dec(6 @384) -> upsample -> dec(2 @192) -> concat skip -> recover.

TPU-native realisation: a single pure function over a nested-dict params
pytree; per-block ``jax.checkpoint`` (rematerialisation) during training
replaces torch.utils.checkpoint (models/pangu_model.py:30,
models/layers.py:115-119); roll/no-roll alternation is a static Python
flag per block index, so everything compiles to one XLA program.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pangu_tpu.config import ModelConfig
from pangu_tpu.models import layers as L
from pangu_tpu.parallel.sharding import shard_tokens

# Training-path kernel toggle (A/B harness: scripts/train_fused_ab.py):
# ModelConfig.train_fused routes the training forward through the
# whole-block kernels with a per-block custom_vjp remat backward
# (ops/earth_block_fused.py).  TRAIN_FUSED is the process default for
# legacy scripts that monkeypatch it; config wins when it disagrees with
# neither (both default True).
TRAIN_FUSED = True


# ---------------------------------------------------------------------------
# Parameter initialisation
# ---------------------------------------------------------------------------

def _trunc_normal(key, shape, dtype, std=0.02):
    # timm trunc_normal_: N(0, std) truncated to +-2 std
    # (models/pangu_model.py:41-48)
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32
                                             ).astype(dtype)


def _dense_params(key, d_in, d_out, dtype, bias=True):
    p = {"kernel": _trunc_normal(key, (d_in, d_out), dtype)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p


def _ln_params(dim, dtype):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_params(rng, cfg: ModelConfig):
    """Initialise the full parameter pytree (trunc-normal dense kernels and
    bias tables, zero biases, unit LayerNorm — models/pangu_model.py:41-48,
    models/layers.py:313-314)."""
    dtype = jnp.dtype(cfg.param_dtype)
    keys = iter(jax.random.split(rng, 512))

    params = {
        "patch_embed": {
            "upper": _dense_params(next(keys), cfg.upper_patch_features,
                                   cfg.dims[0], dtype),
            "surface": _dense_params(next(keys), cfg.surface_patch_features,
                                     cfg.dims[0], dtype),
        },
        "stages": [],
    }
    for i in range(4):
        geom = cfg.stage(i)
        blocks = []
        for _ in range(geom.depth):
            n = geom.window_tokens
            blocks.append({
                "norm1": _ln_params(geom.dim, dtype),
                "norm2": _ln_params(geom.dim, dtype),
                "attn": {
                    "qkv": _dense_params(next(keys), geom.dim, 3 * geom.dim,
                                         dtype),
                    "proj": _dense_params(next(keys), geom.dim, geom.dim,
                                          dtype),
                    "bias_table": _trunc_normal(
                        next(keys),
                        (geom.num_window_types, geom.heads, n, n), dtype),
                },
                "mlp": {
                    "fc1": _dense_params(next(keys), geom.dim,
                                         cfg.mlp_ratio * geom.dim, dtype),
                    "fc2": _dense_params(next(keys), cfg.mlp_ratio * geom.dim,
                                         geom.dim, dtype),
                },
            })
        params["stages"].append({"blocks": blocks})

    c0 = cfg.dims[0]
    params["downsample"] = {
        "norm": _ln_params(4 * c0, dtype),
        "reduce": _dense_params(next(keys), 4 * c0, 2 * c0, dtype, bias=False),
    }
    params["upsample"] = {
        "expand": _dense_params(next(keys), cfg.dims[2], 4 * cfg.dims[3],
                                dtype, bias=False),
        "norm": _ln_params(cfg.dims[3], dtype),
        "mix": _dense_params(next(keys), cfg.dims[3], cfg.dims[3], dtype,
                             bias=False),
    }
    pz, ph, pw = cfg.patch
    params["patch_recovery"] = {
        "upper": _dense_params(next(keys), 2 * cfg.dims[3],
                               cfg.upper_vars * pz * ph * pw, dtype),
        "surface": _dense_params(next(keys), 2 * cfg.dims[3],
                                 cfg.surface_vars * ph * pw, dtype),
    }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _stage_drops(n_blocks: int, rates, offset: int, rng, B: int):
    """Per-block (B, 2) stochastic-depth branch scales, drawn with the
    SAME splits/keys as the XLA drop_path path so the streams match
    bit-for-bit across implementations."""
    drops = []
    r = rng
    for j in range(n_blocks):
        rate = rates[offset + j]
        r1 = r2 = None
        if r is not None:
            r, brng = jax.random.split(r)
            _, r1, _, r2 = tuple(jax.random.split(brng, 4))

        def scale(rk, rate=rate):
            if rk is None or rate == 0.0:
                return jnp.ones((B,), jnp.float32)
            keep = 1.0 - rate
            m = jax.random.bernoulli(rk, keep, (B, 1, 1, 1, 1))
            return m.reshape(B).astype(jnp.float32) / keep

        drops.append(jnp.stack([scale(r1), scale(r2)], axis=1))
    return drops


def _run_stage(stage_params, x, cfg: ModelConfig, stage_idx: int, *,
               rng, deterministic, precision):
    """Apply one EarthSpecificLayer: blocks alternate roll=False/True by
    block index (models/layers.py:110-125)."""
    geom = cfg.stage(stage_idx)
    rates = cfg.drop_path_rates()
    offset = sum(cfg.depths[:stage_idx])

    if cfg.attn_impl == "pallas" and deterministic:
        from pangu_tpu.ops.earth_block_fused import (run_stage_fused,
                                                     run_stage_fused_sharded,
                                                     stage_shardable,
                                                     stage_supports_fused)
        from pangu_tpu.parallel.sharding import multi_device_mesh_active
        if stage_supports_fused(stage_params):
            if not multi_device_mesh_active():
                # whole-stage fused path: pad/roll/crop folded into the
                # block kernels' index maps, one pallas_call per block
                if cfg.block_layout == "wm":
                    from pangu_tpu.ops.earth_block_wm import run_stage_wm
                    return run_stage_wm(stage_params, x, geom,
                                        fast_math=cfg.kernel_fast_math,
                                        chunk_target=cfg.lon_chunk,
                                        lat_group=cfg.lat_group)
                return run_stage_fused(stage_params, x, geom,
                                       fast_math=cfg.kernel_fast_math,
                                       chunk_target=cfg.lon_chunk,
                                       unroll=cfg.attn_unroll)
            mesh = jax.sharding.get_abstract_mesh()
            shape = dict(getattr(mesh, "shape", {}) or {})
            if (set(shape) >= {"dp", "sp"}
                    and stage_shardable(geom, shape, x.shape[0])):
                # >1-device mesh: same kernels per (dp, sp) shard via
                # shard_map; lon rolls become ppermute halo exchanges
                if cfg.block_layout == "wm":
                    from pangu_tpu.ops.earth_block_wm import \
                        run_stage_wm_sharded
                    return run_stage_wm_sharded(stage_params, x, geom, mesh,
                                                fast_math=cfg.kernel_fast_math,
                                                chunk_target=cfg.lon_chunk,
                                                lat_group=cfg.lat_group)
                return run_stage_fused_sharded(stage_params, x, geom, mesh,
                                               fast_math=cfg.kernel_fast_math,
                                               chunk_target=cfg.lon_chunk,
                                               unroll=cfg.attn_unroll)

    if (cfg.attn_impl == "pallas" and not deterministic
            and cfg.train_fused and TRAIN_FUSED):
        from pangu_tpu.ops.earth_block_fused import (run_stage_train,
                                                     run_stage_train_sharded,
                                                     stage_shardable,
                                                     stage_supports_fused)
        from pangu_tpu.parallel.sharding import multi_device_mesh_active
        if stage_supports_fused(stage_params):
            # training: whole-block kernels as the primal, per-block
            # custom_vjp backward; stochastic depth as per-sample branch
            # scales, drawn with the SAME splits/keys as the XLA path
            # below so losses match bit-for-bit across paths
            if not multi_device_mesh_active():
                drops = _stage_drops(len(stage_params["blocks"]), rates,
                                     offset, rng, x.shape[0])
                if cfg.block_layout == "wm":
                    from pangu_tpu.ops.earth_block_bwd import \
                        run_stage_train_wm
                    return run_stage_train_wm(stage_params, x, geom, drops,
                                              fast_math=cfg.kernel_fast_math,
                                              chunk_target=cfg.lon_chunk)
                return run_stage_train(stage_params, x, geom, drops,
                                       fast_math=cfg.kernel_fast_math,
                                       chunk_target=cfg.lon_chunk,
                                       unroll=cfg.attn_unroll,
                                       grid_bwd=cfg.grid_bwd)
            mesh = jax.sharding.get_abstract_mesh()
            shape = dict(getattr(mesh, "shape", {}) or {})
            if (set(shape) >= {"dp", "sp"}
                    and stage_shardable(geom, shape, x.shape[0])):
                # >1-device mesh: whole-block kernels per (dp, sp) shard;
                # lon rolls become differentiable ppermute halo exchanges
                drops = _stage_drops(len(stage_params["blocks"]), rates,
                                     offset, rng, x.shape[0])
                return run_stage_train_sharded(
                    stage_params, x, geom, drops, mesh,
                    fast_math=cfg.kernel_fast_math, chunk_target=cfg.lon_chunk,
                    unroll=cfg.attn_unroll, grid_bwd=cfg.grid_bwd)

    for j, bp in enumerate(stage_params["blocks"]):
        brng = None
        if rng is not None:
            rng, brng = jax.random.split(rng)

        block_fn = functools.partial(
            L.earth_block, geom=geom, precision=precision,
            attn_impl=cfg.attn_impl, fast_math=cfg.kernel_fast_math,
            roll=(j % 2 == 1), drop_rate=rates[offset + j],
            deterministic=deterministic)
        if cfg.remat and not deterministic:
            block_fn = jax.checkpoint(block_fn)
        x = block_fn(bp, x, rng=brng)
    return x


def _maybe_run_stages12_merged(s1, s2, x, cfg: ModelConfig, rng1, rng2,
                               deterministic):
    """Run encoder stage 1 and decoder stage 2 as ONE rolled-coordinate
    kernel chain (they share geometry and are consecutive,
    models/pangu_model.py:64-72): the canonicalising roll + crop + re-pad
    between them disappears. Returns None when the fused path doesn't
    apply (then the caller runs the stages separately)."""
    if cfg.attn_impl != "pallas" or cfg.depths[1] % 2 != 0:
        return None
    from pangu_tpu.ops.earth_block_fused import (run_stage_fused,
                                                 run_stage_train,
                                                 stage_supports_fused)
    from pangu_tpu.parallel.sharding import multi_device_mesh_active
    if multi_device_mesh_active():
        return None
    if not (stage_supports_fused(s1) and stage_supports_fused(s2)):
        return None
    geom = cfg.stage(1)
    combined = {"blocks": list(s1["blocks"]) + list(s2["blocks"])}
    if deterministic:
        if cfg.block_layout == "wm":
            from pangu_tpu.ops.earth_block_wm import run_stage_wm
            return run_stage_wm(combined, x, geom, fast_math=cfg.kernel_fast_math,
                                chunk_target=cfg.lon_chunk,
                                lat_group=cfg.lat_group)
        return run_stage_fused(combined, x, geom, fast_math=cfg.kernel_fast_math,
                               chunk_target=cfg.lon_chunk,
                               unroll=cfg.attn_unroll)
    if not (cfg.train_fused and TRAIN_FUSED):
        return None
    rates = cfg.drop_path_rates()
    B = x.shape[0]
    # per-stage rng streams, exactly as the unmerged path draws them
    drops = (_stage_drops(len(s1["blocks"]), rates, sum(cfg.depths[:1]),
                          rng1, B)
             + _stage_drops(len(s2["blocks"]), rates, sum(cfg.depths[:2]),
                            rng2, B))
    if cfg.block_layout == "wm":
        from pangu_tpu.ops.earth_block_bwd import run_stage_train_wm
        return run_stage_train_wm(combined, x, geom, drops,
                                  fast_math=cfg.kernel_fast_math,
                                  chunk_target=cfg.lon_chunk)
    return run_stage_train(combined, x, geom, drops,
                           fast_math=cfg.kernel_fast_math,
                           chunk_target=cfg.lon_chunk,
                           unroll=cfg.attn_unroll, grid_bwd=cfg.grid_bwd)


def forward_core(params, x, cfg: ModelConfig, *,
                 rng: Optional[jax.Array] = None, deterministic: bool = True,
                 precision=None, taps: Optional[dict] = None):
    """Encoder/decoder trunk on the embedded token grid: stages + down/up
    sampling. (B, Z, H, W, C) tokens in; returns the pre-recovery features
    as the PAIR (skip, decoder_out) — each (B, Z, H, W, C) — rather than
    their concat (models/pangu_model.py:56-84): patch_recovery and the
    token-space transition split their kernels' input rows instead, which
    skips a ~400 MB concat materialisation per step.

    Exposed separately from :func:`forward` so the token-space rollout
    (engine/transition.py) can chain autoregressive steps without
    round-tripping through the canonical physical-unit state."""
    rngs = [None] * 6
    if rng is not None and not deterministic:
        rngs = list(jax.random.split(rng, 6))

    def tap(name, val):
        if taps is not None:
            taps[name] = val
        return val

    def down(px, xx):
        if cfg.attn_impl == "pallas":
            from pangu_tpu.ops.updown import down_sample_fused
            from pangu_tpu.parallel.sharding import multi_device_mesh_active
            if not multi_device_mesh_active():
                y = down_sample_fused(px, xx)
                if y is not None:
                    return y
        return L.down_sample(px, xx, precision, rng=rngs[4])

    def up(px, xx):
        if cfg.attn_impl == "pallas":
            from pangu_tpu.ops.updown import up_sample_fused
            from pangu_tpu.parallel.sharding import multi_device_mesh_active
            if not multi_device_mesh_active():
                y = up_sample_fused(px, xx, cfg.h_tokens)
                if y is not None:
                    return y
        return L.up_sample(px, xx, cfg.h_tokens, precision, rng=rngs[5])

    x = tap("stage0", _run_stage(params["stages"][0], x, cfg, 0, rng=rngs[0],
                                 deterministic=deterministic,
                                 precision=precision))
    skip = x
    x = shard_tokens(tap("downsample", down(params["downsample"], x)))
    merged = (None if taps is not None else _maybe_run_stages12_merged(
        params["stages"][1], params["stages"][2], x, cfg,
        rngs[1], rngs[2], deterministic))
    if merged is not None:
        x = merged
    else:
        x = tap("stage1", _run_stage(params["stages"][1], x, cfg, 1,
                                     rng=rngs[1],
                                     deterministic=deterministic,
                                     precision=precision))
        x = tap("stage2", _run_stage(params["stages"][2], x, cfg, 2,
                                     rng=rngs[2],
                                     deterministic=deterministic,
                                     precision=precision))
    x = shard_tokens(tap("upsample", up(params["upsample"], x)))
    x = tap("stage3", _run_stage(params["stages"][3], x, cfg, 3, rng=rngs[3],
                                 deterministic=deterministic,
                                 precision=precision))

    return skip, x


def wm_core_supported(params, cfg: ModelConfig) -> bool:
    """True when the all-window-major trunk (forward_core_wm) applies:
    pallas wm kernels, no LoRA leaves anywhere on the trunk, and even
    stage depths (so every stage ends at the same half-window offset).
    Under a >1-device mesh the trunk runs per (dp, sp) shard via
    shard_map (see :func:`wm_core_mesh`); tp or a non-divisible lon
    extent falls back to the sharded v2/XLA paths."""
    from pangu_tpu.ops.earth_block_fused import stage_supports_fused
    from pangu_tpu.parallel.sharding import multi_device_mesh_active
    if cfg.attn_impl != "pallas" or cfg.block_layout != "wm":
        return False
    if multi_device_mesh_active() and wm_core_mesh(cfg) is None:
        return False
    if any(d % 2 for d in cfg.depths):
        return False
    if not all(stage_supports_fused(s) for s in params["stages"]):
        return False
    return not ("lora_a" in params["downsample"]["reduce"]
                or "lora_a" in params["upsample"]["expand"]
                or "lora_a" in params["upsample"]["mix"])


def wm_core_mesh(cfg: ModelConfig):
    """The active mesh when the all-wm trunk can run per (dp, sp, tp)
    shard: requires dp/sp axes, every stage's longitude windows divisible
    by sp, and — when tp > 1 — every stage's Z windows divisible by tp
    (the tp axis shards Z windows, and with them the z-type-major
    earth-specific bias tables, ~87% of all parameters; the shifted
    blocks' z-roll becomes a one-z-row ppermute halo, exactly like sp's
    lon halo). Returns None otherwise (or single-device)."""
    mesh = jax.sharding.get_abstract_mesh()
    shape = dict(getattr(mesh, "shape", {}) or {})
    if not shape or all(s == 1 for s in shape.values()):
        return None
    if not {"dp", "sp"} <= set(shape):
        return None
    sp = shape["sp"]
    if any(cfg.stage(i).num_lon_windows % sp for i in range(4)):
        return None
    tp = shape.get("tp", 1)
    if tp > 1:
        wz = cfg.window[0]
        if any((cfg.stage(i).z // wz) % tp for i in range(4)):
            return None
        if any(cfg.stage(i).z % wz for i in range(4)):
            return None
    return mesh


def _wm_param_specs(params, tp: int):
    """shard_map in/out specs for the params pytree on the wm trunk:
    bias tables — z-type-major axis 0, ~87% of all parameters — shard
    over tp with the z windows; everything else rides replicated (the
    non-table weights total ~2% of the bytes)."""
    from jax.sharding import PartitionSpec as P
    if tp <= 1:
        return P()

    def spec(path, leaf):
        names = [getattr(p, "key", None) for p in path]
        if "bias_table" in names:
            return P("tp", None, None, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def forward_core_wm(params, xs, cfg: ModelConfig, *,
                    sp_axis: Optional[str] = None, sp_size: int = 1,
                    tp_axis: Optional[str] = None, tp_size: int = 1):
    """The encoder/decoder trunk entirely in window-major storage: stage
    chains keep wm io (zero relayout), DownSample/UpSample consume the
    rolled storage directly (ops/updown_wm.py) and the stage-end rolls
    never materialise.  ``xs``: stage-0 wm entry storage in canonical
    coordinates (B, nz, nlat, nlon, N, C).  Returns
    ``(skip_wm, dec_wm, off)`` — the pre-recovery pair, each still rolled
    by ``off`` (the autoregressive transition and the recovery fold the
    roll-back into their own reads).  Gate with :func:`wm_core_supported`.

    Under ``shard_map`` with longitude windows sharded over ``sp_axis``,
    xs is the LOCAL shard; the stage chains resolve each shifted block's
    lon component via a ppermute halo (ops/earth_block_wm._lon_shift_wm),
    so the returned ``off`` has lon component 0 and the down/up/recovery
    consumers stitch only z/lat — no cross-shard reads.

    Same component order as the reference trunk
    (/root/reference/models/pangu_model.py:56-84)."""
    from pangu_tpu.ops.earth_block_wm import run_stage_wm
    from pangu_tpu.ops.updown_wm import down_sample_wm, up_sample_wm

    g0, g1 = cfg.stage(0), cfg.stage(1)
    g2, g3 = cfg.stage(2), cfg.stage(3)
    kw = dict(fast_math=cfg.kernel_fast_math, chunk_target=cfg.lon_chunk,
              io_layout="wm", lat_group=cfg.lat_group,
              sp_axis=sp_axis, sp_size=sp_size,
              tp_axis=tp_axis, tp_size=tp_size)

    skip, off0 = run_stage_wm(params["stages"][0], xs, g0, **kw)
    x = down_sample_wm(params["downsample"], skip, g0, g1, off0,
                       fast_math=cfg.kernel_fast_math)
    combined = {"blocks": (list(params["stages"][1]["blocks"])
                           + list(params["stages"][2]["blocks"]))}
    x, off12 = run_stage_wm(combined, x, g1, **kw)
    x = up_sample_wm(params["upsample"], x, g2, g3, off12,
                     fast_math=cfg.kernel_fast_math)
    dec, off3 = run_stage_wm(params["stages"][3], x, g3, **kw)
    assert off0 == off3, "even depths keep skip and decoder in step"
    return skip, dec, off3


def forward_core_wm_train(params, xs, cfg: ModelConfig, *,
                          rng: Optional[jax.Array] = None,
                          drops: Optional[list] = None,
                          sp_axis: Optional[str] = None, sp_size: int = 1,
                          tp_axis: Optional[str] = None, tp_size: int = 1):
    """Training-mode encoder/decoder trunk entirely in window-major
    storage: whole-block forward+backward kernels with wm io
    (ops/earth_block_bwd.run_stage_train_wm) chained through
    differentiable wm DownSample/UpSample
    (ops/updown_wm.down/up_sample_wm_train) — no canonical token grid,
    no stage-boundary rolls/relayouts anywhere in the forward, and the
    cotangent chain carries the same coordinate offsets backwards.

    ``xs``: stage-0 wm entry storage (B, nz, nlat, nlon, N, C).  Returns
    ``(skip_wm, dec_wm, off)`` exactly like :func:`forward_core_wm`.
    Stochastic-depth streams are drawn with the SAME splits/keys as the
    XLA path (rngs[i] per stage), so losses match bit-for-bit; under
    ``shard_map`` pass pre-drawn per-stage ``drops`` instead (drawn at
    GLOBAL batch size outside the shard_map, dp-sharded on axis 0) so
    every batch row keeps its single-device stream.

    Under ``shard_map`` with longitude sharded over ``sp_axis``, xs is
    the LOCAL shard: each shifted block's lon component runs as a
    differentiable ppermute halo at the storage level
    (ops/earth_block_wm._lon_shift_wm) and the returned ``off`` has lon
    component 0 — the down/up/recovery consumers stitch only z/lat.
    Gate with :func:`wm_core_supported`."""
    from pangu_tpu.ops.earth_block_bwd import run_stage_train_wm
    from pangu_tpu.ops.updown_wm import (down_sample_wm_train,
                                         up_sample_wm_train)

    g0, g1 = cfg.stage(0), cfg.stage(1)
    g2, g3 = cfg.stage(2), cfg.stage(3)
    if drops is None:
        rates = cfg.drop_path_rates()
        B = xs.shape[0]
        rngs = [None] * 6
        if rng is not None:
            rngs = list(jax.random.split(rng, 6))
        dr = [_stage_drops(cfg.depths[i], rates, sum(cfg.depths[:i]),
                           rngs[i], B) for i in range(4)]
    else:
        dr = drops
    kw = dict(fast_math=cfg.kernel_fast_math, chunk_target=cfg.lon_chunk,
              io_in="wm", io_out="wm", sp_axis=sp_axis, sp_size=sp_size,
              tp_axis=tp_axis, tp_size=tp_size)

    skip, off0 = run_stage_train_wm(params["stages"][0], xs, g0, dr[0], **kw)
    x = down_sample_wm_train(params["downsample"], skip, g0, g1, off0,
                             fast_math=cfg.kernel_fast_math)
    combined = {"blocks": (list(params["stages"][1]["blocks"])
                           + list(params["stages"][2]["blocks"]))}
    x, off12 = run_stage_train_wm(combined, x, g1, dr[1] + dr[2], **kw)
    x = up_sample_wm_train(params["upsample"], x, g2, g3, off12,
                           fast_math=cfg.kernel_fast_math)
    dec, off3 = run_stage_train_wm(params["stages"][3], x, g3, dr[3], **kw)
    assert off0 == off3, "even depths keep skip and decoder in step"
    return skip, dec, off3


def forward(params, upper, surface, constants, cfg: ModelConfig, *,
            rng: Optional[jax.Array] = None, deterministic: bool = True,
            precision=None, taps: Optional[dict] = None):
    """Full forward step.

    upper (B, 5, levels, lat, lon), surface (B, 4, lat, lon), raw physical
    units in; *normalised* prediction out (models/pangu_model.py:50-87).

    ``taps``: pass a dict to collect per-stage activations (embed,
    stage0..3, downsample, upsample) — the golden-activation hook used by
    cli/parity_check.py to localise any divergence against a reference
    activation dump.
    """
    cdt = jnp.dtype(cfg.compute_dtype)
    upper = upper.astype(cdt)
    surface = surface.astype(cdt)

    if cfg.attn_impl == "pallas" and cfg.lora_fused:
        # LoRA on the fast path (/root/reference/finetune/lora_tune.py:
        # 124-139 is the capability): merge W + s·A@B per step as traced
        # rank-16 matmuls so the fused whole-block kernels see plain
        # dense sites; lora_a/lora_b still receive gradients through the
        # merge (base kernels stay frozen by the optimizer mask). Exact
        # vs the unmerged two-matmul form except for the LoRA-branch
        # dropout.  Element-mode dropout (peft-exact per-token masks,
        # lora_drop) has no merged form — that configuration keeps the
        # unmerged XLA path.  Feature-mode dropout (lora_drop_feat,
        # init_lora(dropout_mode="feature")) is token-constant and merges
        # EXACTLY — the per-step mask is drawn inside merge_lora from a
        # fold_in of the step rng, leaving the drop-path streams (which
        # use split()) untouched.
        from pangu_tpu.models.lora import (has_lora, has_lora_dropout,
                                           merge_lora)
        if has_lora(params) and (deterministic
                                 or not has_lora_dropout(params)):
            drop_rng = (rng if not deterministic
                        and has_lora_dropout(params, "lora_drop_feat")
                        else None)
            params = merge_lora(params, rng=drop_rng)

    if (deterministic and taps is None and precision is None
            and cfg.edge_kernels and wm_core_supported(params, cfg)):
        # edge-kernel fast path: embed writes the wm entry storage
        # directly and recovery reads the rolled wm exit pair directly —
        # neither the canonical token grid nor its relayouts ever exist
        from pangu_tpu.ops.embed_wm import embed_supported, embed_wm
        from pangu_tpu.ops.recovery_wm import (recovery_supported,
                                               recovery_wm)
        from pangu_tpu.parallel.sharding import multi_device_mesh_active
        if (not multi_device_mesh_active() and embed_supported(cfg)
                and recovery_supported(cfg)):
            xs = embed_wm(params["patch_embed"], upper, surface, constants,
                          cfg)
            skip, dec, off = forward_core_wm(params, xs, cfg)
            return recovery_wm(params["patch_recovery"], skip, dec, off,
                               cfg)

    if (not deterministic and taps is None and precision is None
            and cfg.edge_kernels and cfg.train_fused and TRAIN_FUSED
            and wm_core_supported(params, cfg)):
        # training edge fast path: Pallas embed/recovery with direct-math
        # XLA backwards (ops/embed_wm.embed_wm_train,
        # ops/recovery_wm.recovery_wm_train) around the all-wm training
        # trunk — the canonical token grid and the XLA conv/interleave
        # gauntlets exist in NEITHER direction of the train step
        from pangu_tpu.ops.embed_wm import embed_supported, embed_wm_train
        from pangu_tpu.ops.recovery_wm import (recovery_supported,
                                               recovery_wm_train)
        from pangu_tpu.parallel.sharding import multi_device_mesh_active
        if (not multi_device_mesh_active() and embed_supported(cfg)
                and recovery_supported(cfg)):
            xs = embed_wm_train(params["patch_embed"], upper, surface,
                                constants, cfg)
            skip, dec, off = forward_core_wm_train(params, xs, cfg, rng=rng)
            return recovery_wm_train(params["patch_recovery"], skip, dec,
                                     off, cfg)

    x = L.patch_embed(params["patch_embed"], upper, surface, constants, cfg,
                      precision)
    if taps is not None:
        taps["embed"] = x
    if deterministic and taps is None and wm_core_supported(params, cfg):
        # single-step fast path: the trunk runs all-window-major (the
        # same kernels the rollout chains); only the embed output and the
        # pre-recovery pair exist in canonical layout
        from pangu_tpu.ops.earth_block_wm import (from_window_major,
                                                  to_window_major)
        geom = cfg.stage(0)
        from pangu_tpu.parallel.sharding import multi_device_mesh_active
        mesh = wm_core_mesh(cfg)
        wm_mesh_ok = (mesh is not None
                      and x.shape[0] % dict(mesh.shape)["dp"] == 0)
        if wm_mesh_ok:
            # >1-device mesh: run the whole wm trunk per (dp, sp, tp)
            # shard — pad/to_wm/stages/down/up/canon are all lon- and
            # z-window-local, the only cross-shard traffic is the shifted
            # blocks' lon/z halo ppermutes inside run_stage_wm
            from jax.sharding import PartitionSpec as P
            tp = dict(mesh.shape).get("tp", 1)

            def trunk(p, xc):
                xsl = to_window_major(
                    jnp.pad(xc, ((0, 0), (0, 0),
                                 (0, geom.h_padded - xc.shape[2]),
                                 (0, 0), (0, 0))), geom.window)
                sk, de, off = forward_core_wm(
                    p, xsl, cfg, sp_axis="sp",
                    sp_size=dict(mesh.shape)["sp"],
                    tp_axis="tp" if tp > 1 else None, tp_size=tp)

                def canon_l(t):
                    t = from_window_major(t, geom.window)
                    # per-shard roll: the z component is 0 under tp>1
                    # (storage-resolved) and the lon component is 0
                    # under sp>1; under sp=1 the lon roll is local and
                    # must still be applied (it is NOT storage-resolved)
                    return jnp.roll(t, off,
                                    axis=(1, 2, 3))[:, :, :geom.h]

                return canon_l(sk), canon_l(de)

            spec = P("dp", "tp" if tp > 1 else None, None, "sp", None)
            skip, dec = jax.shard_map(
                trunk, mesh=mesh, in_specs=(_wm_param_specs(params, tp),
                                            spec),
                out_specs=(spec, spec), check_vma=False)(params, x)
            return L.patch_recovery(params["patch_recovery"],
                                    (skip, dec), cfg, precision)
        if not multi_device_mesh_active():
            xs = to_window_major(
                jnp.pad(x, ((0, 0), (0, 0),
                            (0, geom.h_padded - x.shape[2]),
                            (0, 0), (0, 0))), geom.window)
            skip, dec, off = forward_core_wm(params, xs, cfg)

            def canon(t):
                t = from_window_major(t, geom.window)
                return jnp.roll(t, off, axis=(1, 2, 3))[:, :, :geom.h]

            return L.patch_recovery(params["patch_recovery"],
                                    (canon(skip), canon(dec)), cfg,
                                    precision)
        # mesh active but the wm trunk can't shard this batch: fall
        # through to the per-stage sharded paths
    if (not deterministic and taps is None and cfg.train_fused
            and TRAIN_FUSED and wm_core_supported(params, cfg)):
        from pangu_tpu.ops.earth_block_wm import (from_window_major,
                                                  to_window_major)
        from pangu_tpu.parallel.sharding import multi_device_mesh_active
        mesh = wm_core_mesh(cfg)
        if mesh is not None and x.shape[0] % dict(mesh.shape)["dp"] == 0:
            # >1-device mesh: the whole wm TRAINING trunk per (dp, sp)
            # shard — the lon component of every half-window shift is a
            # differentiable ppermute halo (run_stage_train_wm sp_axis),
            # and shard_map's transpose psums the replicated parameter
            # grads across shards (the gradient sync the reference's DDP
            # setup forgot, /root/reference/era5_data/utils_dist.py:125).
            # Stochastic-depth scales are drawn OUTSIDE the shard_map at
            # global batch size (dp-sharded on axis 0) so every batch row
            # keeps its single-device stream bit-for-bit.
            from jax.sharding import PartitionSpec as P
            geom = cfg.stage(0)
            rates = cfg.drop_path_rates()
            B = x.shape[0]
            rngs = [None] * 6
            if rng is not None:
                rngs = list(jax.random.split(rng, 6))
            dr = [_stage_drops(cfg.depths[i], rates, sum(cfg.depths[:i]),
                               rngs[i], B) for i in range(4)]
            sp_size = dict(mesh.shape)["sp"]
            tp = dict(mesh.shape).get("tp", 1)

            def trunk_train(p, xc, drs):
                xsl = to_window_major(
                    jnp.pad(xc, ((0, 0), (0, 0),
                                 (0, geom.h_padded - xc.shape[2]),
                                 (0, 0), (0, 0))), geom.window)
                sk, de, off = forward_core_wm_train(
                    p, xsl, cfg, drops=drs, sp_axis="sp", sp_size=sp_size,
                    tp_axis="tp" if tp > 1 else None, tp_size=tp)

                def canon_l(t):
                    t = from_window_major(t, geom.window)
                    # per-shard roll: the z component is 0 under tp>1
                    # (storage-resolved) and the lon component is 0
                    # under sp>1; under sp=1 the lon roll is local and
                    # must still be applied (it is NOT storage-resolved)
                    return jnp.roll(t, off,
                                    axis=(1, 2, 3))[:, :, :geom.h]

                return canon_l(sk), canon_l(de)

            spec = P("dp", "tp" if tp > 1 else None, None, "sp", None)
            spec_d = jax.tree.map(lambda _: P("dp", None), dr)
            skip, dec = jax.shard_map(
                trunk_train, mesh=mesh,
                in_specs=(_wm_param_specs(params, tp), spec, spec_d),
                out_specs=(spec, spec), check_vma=False)(params, x, dr)
            return L.patch_recovery(params["patch_recovery"],
                                    (skip, dec), cfg, precision)
        if not multi_device_mesh_active():
            # training fast path: the whole trunk (blocks AND stage
            # boundaries) runs window-major — forward relayouts/rolls
            # exist only at the embed entry and recovery exit
            geom = cfg.stage(0)
            xs = to_window_major(
                jnp.pad(x, ((0, 0), (0, 0),
                            (0, geom.h_padded - x.shape[2]),
                            (0, 0), (0, 0))), geom.window)
            skip, dec, off = forward_core_wm_train(params, xs, cfg, rng=rng)

            def canon(t):
                t = from_window_major(t, geom.window)
                return jnp.roll(t, off, axis=(1, 2, 3))[:, :, :geom.h]

            return L.patch_recovery(params["patch_recovery"],
                                    (canon(skip), canon(dec)), cfg,
                                    precision)
    x = shard_tokens(x)
    x = forward_core(params, x, cfg, rng=rng, deterministic=deterministic,
                     precision=precision, taps=taps)
    return L.patch_recovery(params["patch_recovery"], x, cfg, precision)


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def summarize(params, cfg: ModelConfig) -> str:
    """Human-readable parameter summary (the role of torch_summarize,
    era5_data/utils.py:136-166)."""
    lines = [f"PanguModel ({cfg.lat}x{cfg.lon}, {cfg.levels} levels, "
             f"dims {cfg.dims}, depths {cfg.depths})"]
    total = 0
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    groups: dict = {}
    for path, leaf in flat:
        key = str(getattr(path[0], "key", path[0]))
        if key == "stages":
            key = f"stage[{path[1].idx}]"
        n = int(np.prod(leaf.shape))
        groups[key] = groups.get(key, 0) + n
        total += n
    for key, n in groups.items():
        lines.append(f"  {key:<16} {n:>12,} params ({100*n/max(total,1):.1f}%)")
    lines.append(f"  total            {total:>12,} params")
    return "\n".join(lines)
