"""Whole-stage fused Earth-specific blocks: pad + roll + windowed
attention + block tail in ONE pallas_call per block, for BOTH shifted and
unshifted blocks.

The reference block (models/layers.py:183-253) does, in order: lat-pad
(181 -> 186), optional half-window ``torch.roll`` on (Z, H, W), window
partition, biased/masked attention, reverse partition, roll-back, crop,
then the residual/LN/MLP tail. Round-1 kernels fused attention (+ tail
for unshifted blocks) but left pad/roll/crop to XLA — ~30-40 ms of pure
HBM copies per forward at full resolution.

This module removes ALL of that data movement with two TPU-native ideas:

1. **Roll = index arithmetic, not data movement.** A half-window shift
   means window (zz, hh) covers storage rows offset by (dz, dh, dw). The
   kernel reads those rows directly: the z/lat offsets come from FOUR
   fine-grained BlockSpecs (z row singles x lat half-window groups) whose
   index maps add the offset modulo the grid — wrap-around included, which
   is exactly ``torch.roll`` semantics. The longitude offset is a cheap
   in-register rotate of the full-W tile. Each input element is still
   read exactly once per block.

2. **Shifted blocks write in rolled coordinates.** The block's output IS
   its own attention grid; rolling back immediately (reference
   layers.py:239-243) only to roll again next block is wasted bandwidth.
   Instead the storage tensor carries a coordinate offset; the NEXT
   block's reads fold in the inverse shift, and one final ``jnp.roll``
   at stage end restores canonical coordinates (4 rolls per forward
   instead of 16 roll/pad/crop chains).

   The residual shortcut is valid in any coordinates (token-local), so
   the tail fuses into shifted blocks too — all 16 blocks are now single
   kernels.

3. **Zero-pad rows are synthesised, not stored.** The reference re-pads
   zeros every block so pad tokens enter attention as zeros
   (layers.py:192); here a per-row iota mask zeroes any row whose
   canonical latitude index >= the real token count before the qkv
   projection. Bit-identical semantics, no pad/crop copies.

The earth-specific bias table is passed in its native dtype (the fp32
upcast is done per-tile in VMEM, killing the per-block 60 MB XLA
materialisation of ``bias_table.astype(f32) + mask``); the shifted-window
mask rides as its own small operand.

Deterministic (inference/eval) path only — training keeps the XLA/
grid-attention path because stochastic depth needs per-sample RNG across
the whole residual branch, and pallas_call has no autodiff.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pangu_tpu.ops.block_tail import tail_math

# Tuning defaults (measured on v5e via scripts/chunk_sweep.py): how many
# longitude windows ride the attention dot_general batch dim per
# fori_loop step (stage-0 block: 5 -> 15.8 ms, 10 -> 14.4, 30 -> 15.0;
# stage-1: 9.0 / 8.8 / -).  Overridable per run via ModelConfig.lon_chunk
# / ModelConfig.attn_unroll (config.py) — no env-var knobs.
DEFAULT_LON_CHUNK = 10
_V2_SEMANTICS = ("parallel", "parallel", "arbitrary")


def _lon_chunk(nlon: int, target: int | None = None) -> int:
    """Largest divisor of nlon that is <= target (lon windows batched per
    attention dot_general)."""
    if target is None:
        target = DEFAULT_LON_CHUNK
    for c in range(min(nlon, target), 0, -1):
        if nlon % c == 0:
            return c
    return 1


def _make_v2_kernel(heads: int, hd: int, window, nlon: int, c: int,
                    h_real: int, hp: int, dw: int, canon_add: int,
                    n_x_refs: int, has_mask: bool, fast_math: bool,
                    has_drop: bool = False,
                    chunk_target: int | None = None, unroll: bool = False):
    wz, wh, ww = window
    n = wz * wh * ww
    g = wh // 2
    scale = hd ** -0.5
    chunk = _lon_chunk(nlon, chunk_target)

    def kernel(*refs):
        xs = refs[:n_x_refs]
        i = n_x_refs
        (wqkv_ref, bqkv_ref, wp_ref, bp_ref, b_ref) = refs[i:i + 5]
        i += 5
        ids_ref = None
        if has_mask:
            ids_ref = refs[i]
            i += 1
        drop_ref = None
        if has_drop:
            drop_ref = refs[i]                       # (1, 2) SMEM scalars
            i += 1
        (n1s_ref, n1b_ref, n2s_ref, n2b_ref,
         w1_ref, b1_ref, w2_ref, b2_ref) = refs[i:i + 8]
        o_ref = refs[i + 8]
        qkv_s, attn_s = refs[i + 9:i + 11]           # VMEM scratch

        # ---- assemble the (wz, wh, W, C) window row, already "rolled" --
        if n_x_refs == 1:
            x = xs[0][0]
        else:
            rows = []
            for zi in range(wz):
                lat = jnp.concatenate(
                    [xs[zi * 2 + j][0, 0] for j in range(2)], axis=0)
                rows.append(lat)
            x = jnp.stack(rows, axis=0)
        if dw:
            # window lon w reads storage lon (w + dw) mod W
            x = jnp.roll(x, -dw, axis=2)

        # ---- zero-synthesise the latitude pad rows (layers.py:192) -----
        if h_real < hp:
            hh = pl.program_id(2)
            lat_iota = jax.lax.broadcasted_iota(jnp.int32, (wz, wh, 1, 1), 1)
            canon = jax.lax.rem(wh * hh + lat_iota + canon_add, hp)
            x = jnp.where(canon < h_real, x, jnp.zeros_like(x))

        xw = x.reshape(wz, wh, nlon, ww, c).transpose(2, 0, 1, 3, 4)
        xf = xw.reshape(nlon * n, c)
        dt = x.dtype

        # ---- ONE wide qkv projection: full MXU lanes (the per-head
        # (C, hd) formulation runs at 25% lane occupancy — measured 1.7x
        # slower end to end) --------------------------------------------
        qkv = jax.lax.dot_general(
            xf, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qkv = qkv + bqkv_ref[...][None].astype(jnp.float32)
        qkv_s[...] = qkv.astype(dt).reshape(nlon, n, 3 * c)

        bias = b_ref[0].astype(jnp.float32)          # (heads, n, n)
        if ids_ref is not None:
            # shifted-window mask rebuilt from per-token region ids (tiny
            # operand; the (N, N) -100 tensor never touches HBM)
            r = ids_ref[...][0]                      # (1, n) int32
            bias = bias + jnp.where(r[0][None, :] != r[0][:, None],
                                    jnp.float32(-100.0), jnp.float32(0.0))

        # ---- attention: fori_loop over lon-window chunks; per head the
        # q/k/v tiles come from lane-offset REF slices of the wide qkv
        # scratch (reshapes across lanes are Mosaic-unsupported), and the
        # chunk rides the (single allowed) dot_general batch dim ---------
        def body(ll, carry):
            lo = ll * chunk
            for h in range(heads):
                q = qkv_s[pl.ds(lo, chunk), :, h * hd:(h + 1) * hd]
                k = qkv_s[pl.ds(lo, chunk), :, c + h * hd:c + (h + 1) * hd]
                v = qkv_s[pl.ds(lo, chunk), :,
                          2 * c + h * hd:2 * c + (h + 1) * hd]
                s = jax.lax.dot_general(
                    q, k, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                s = s * jnp.float32(scale) + bias[h][None]
                m = jnp.max(s, axis=-1, keepdims=True)
                e = jnp.exp(s - m)
                pr = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
                o = jax.lax.dot_general(
                    pr, v, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                attn_s[pl.ds(lo, chunk), :,
                       h * hd:(h + 1) * hd] = o.astype(dt)
            return carry

        steps = nlon // chunk
        if unroll and steps > 1:
            for ll in range(steps):
                body(ll, 0)
        else:
            jax.lax.fori_loop(0, steps, body, 0, unroll=False)

        # ---- ONE wide output projection --------------------------------
        a = jax.lax.dot_general(
            attn_s[...].reshape(nlon * n, c), wp_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        a = (a + bp_ref[...][None].astype(jnp.float32)).astype(dt)

        # ---- block tail, token-local so valid in rolled coords ---------
        s1 = s2 = None
        if drop_ref is not None:
            s1, s2 = drop_ref[0, 0], drop_ref[0, 1]
        y = tail_math(a, xf, n1s_ref[...], n1b_ref[...], n2s_ref[...],
                      n2b_ref[...], w1_ref[...], b1_ref[...], w2_ref[...],
                      b2_ref[...], fast_math, s1, s2)

        y = y.reshape(nlon, wz, wh, ww, c).transpose(1, 2, 0, 3, 4)
        o_ref[0] = y.reshape(wz, wh, nlon * ww, c).astype(o_ref.dtype)

    return kernel


def _block_v2_call(p, xs, geom, delta: Tuple[int, int, int],
                   canon_add: int, mask: Optional[jax.Array],
                   fast_math: bool, drop: Optional[jax.Array] = None,
                   chunk_target: int | None = None, unroll: bool = False):
    """One whole block on the storage tensor ``xs`` (B, Z, Hp, W, C).

    ``delta`` maps window rows to storage rows (window row r of window
    (zz, hh) reads storage row (wz*zz + r + dz) mod Z etc.); ``canon_add``
    is the lat offset from window coords to canonical (padded) coords,
    used for zero-pad synthesis. ``drop`` is an optional (B, 2) fp32 array
    of stochastic-depth branch scales (attention branch, MLP branch) per
    sample — SMEM scalars in the kernel.
    """
    b, z, hp, w, c = xs.shape
    wz, wh, ww = geom.window
    heads = geom.heads
    hd = c // heads
    nlat = hp // wh
    nlon = w // ww
    n = wz * wh * ww
    dz, dh, dw = delta
    stitch = dz != 0 or dh != 0
    g = wh // 2

    if stitch:
        hstep = dh // g
        hp_g = hp // g

        def mk_x_spec(i, j):
            return pl.BlockSpec(
                (1, 1, g, w, c),
                lambda bb, zz, hh, i=i, j=j: (
                    bb, (wz * zz + i + dz) % z, (2 * hh + j + hstep) % hp_g,
                    0, 0),
                memory_space=pltpu.VMEM)

        x_specs = [mk_x_spec(i, j) for i in range(wz) for j in range(2)]
    else:
        x_specs = [pl.BlockSpec((1, wz, wh, w, c),
                                lambda bb, zz, hh: (bb, zz, hh, 0, 0),
                                memory_space=pltpu.VMEM)]

    dt = xs.dtype
    wqkv = p["attn"]["qkv"]["kernel"].astype(dt)
    bqkv = p["attn"]["qkv"]["bias"].astype(dt)
    wp = p["attn"]["proj"]["kernel"].astype(dt)
    bp = p["attn"]["proj"]["bias"].astype(dt)
    bias = p["attn"]["bias_table"]          # native dtype; cast per-tile

    spec_b = pl.BlockSpec((1, heads, n, n),
                          lambda bb, zz, hh: (zz * nlat + hh, 0, 0, 0),
                          memory_space=pltpu.VMEM)

    def fullspec(shape):
        return pl.BlockSpec(shape, lambda bb, zz, hh: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    operands = [xs, wqkv, bqkv, wp, bp, bias]
    in_specs = x_specs + [fullspec(wqkv.shape), fullspec(bqkv.shape),
                          fullspec(wp.shape), fullspec(bp.shape), spec_b]
    if stitch:
        operands = [xs, xs, xs, xs] + operands[1:]
    if mask is not None:
        # (ntype, 1, n) int32 region ids; the middle singleton keeps the
        # trailing block dims equal to the array dims (Mosaic constraint)
        operands.append(mask.reshape(mask.shape[0], 1, n))
        in_specs.append(pl.BlockSpec(
            (1, 1, n), lambda bb, zz, hh: (zz * nlat + hh, 0, 0),
            memory_space=pltpu.VMEM))
    if drop is not None:
        operands.append(drop.astype(jnp.float32))
        in_specs.append(pl.BlockSpec(
            (1, 2), lambda bb, zz, hh: (bb, 0),
            memory_space=pltpu.SMEM))

    tail = [p["norm1"]["scale"].astype(dt), p["norm1"]["bias"].astype(dt),
            p["norm2"]["scale"].astype(dt), p["norm2"]["bias"].astype(dt),
            p["mlp"]["fc1"]["kernel"].astype(dt),
            p["mlp"]["fc1"]["bias"].astype(dt),
            p["mlp"]["fc2"]["kernel"].astype(dt),
            p["mlp"]["fc2"]["bias"].astype(dt)]
    hidden = tail[4].shape[-1]
    operands += tail
    in_specs += [fullspec((c,)), fullspec((c,)), fullspec((c,)),
                 fullspec((c,)), fullspec((c, hidden)), fullspec((hidden,)),
                 fullspec((hidden, c)), fullspec((c,))]

    out_spec = pl.BlockSpec((1, wz, wh, w, c),
                            lambda bb, zz, hh: (bb, zz, hh, 0, 0),
                            memory_space=pltpu.VMEM)

    scratch = [pltpu.VMEM((nlon, n, 3 * c), dt),
               pltpu.VMEM((nlon, n, c), dt)]

    return pl.pallas_call(
        _make_v2_kernel(heads, hd, geom.window, nlon, c, geom.h, hp, dw,
                        canon_add, len(x_specs), mask is not None,
                        fast_math, drop is not None, chunk_target, unroll),
        out_shape=jax.ShapeDtypeStruct(xs.shape, dt),
        grid=(b, z // wz, nlat),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_V2_SEMANTICS,
            vmem_limit_bytes=128 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * z * hp * w * c * (4 * c + 2 * n + 8 * c),
            bytes_accessed=2 * xs.size * dt.itemsize
            + bias.size * bias.dtype.itemsize,
            transcendentals=b * (z // wz) * nlat * nlon * heads * n * n),
    )(*operands)


def _has_lora(p) -> bool:
    return ("lora_a" in p["attn"]["qkv"] or "lora_a" in p["attn"]["proj"]
            or "lora_a" in p["mlp"]["fc1"] or "lora_a" in p["mlp"]["fc2"])


# ---------------------------------------------------------------------------
# Training path: whole-block kernels as the primal forward, per-block
# custom_vjp backward (rematerialising) through the fused grid-attention
# custom_vjp (pallas fwd + pallas bwd) + the XLA tail — no pad/partition
# copies anywhere. Stochastic depth rides as per-sample branch scales.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _block_v2_train_core(geom, delta: Tuple[int, int, int], canon_add: int,
                         has_mask: bool, fast_math: bool,
                         chunk_target: int | None = None,
                         unroll: bool = False, grid_bwd: str = "pallas"):
    """custom_vjp for one whole block on the rolled-coordinate storage
    tensor: forward = the v2 kernel (_block_v2_call), backward = vjp of
    the equivalent XLA/grid composition (recompute-in-backward, i.e. the
    same memory profile as jax.checkpoint per block). The shifted-window
    region-id table is a closed-over trace-time constant (~70 KB) — the
    fp32 bias+mask tensor never materialises."""
    from pangu_tpu.models import layers as L
    from pangu_tpu.ops.window_attention import _grid_core

    wz, wh, ww = geom.window
    dz, dh, dw = delta
    hp, h_real = geom.h_padded, geom.h
    heads = geom.heads
    window = tuple(geom.window)
    ids_np = None
    if has_mask:
        ids_np = L.window_region_ids(geom.z, hp, window)
    attn_core = _grid_core(heads, window,
                           (geom.z, hp) if has_mask else None,
                           bwd_impl=grid_bwd)

    def ref(bp, xs, drop):
        x = xs
        if dz or dh or dw:
            # window coords read storage rows offset by delta (the v2
            # kernel does this via BlockSpec index maps / in-VMEM rotate)
            x = jnp.roll(x, (-dz, -dh, -dw), axis=(1, 2, 3))
        if h_real < hp:
            # zero-synthesised pad rows (reference layers.py:192)
            lat = (jnp.arange(hp) + canon_add) % hp
            keep = (lat < h_real)[None, None, :, None, None]
            x = jnp.where(keep, x, jnp.zeros_like(x))
        a = attn_core(
            x, bp["attn"]["qkv"]["kernel"], bp["attn"]["qkv"]["bias"],
            bp["attn"]["proj"]["kernel"], bp["attn"]["proj"]["bias"],
            bp["attn"]["bias_table"])
        s1 = s2 = None
        if drop is not None:
            s1 = drop[:, 0].reshape(-1, 1, 1, 1, 1).astype(x.dtype)
            s2 = drop[:, 1].reshape(-1, 1, 1, 1, 1).astype(x.dtype)
        br1 = L.layer_norm(bp["norm1"], a, fast=fast_math)
        x1 = x + (br1 if s1 is None else br1 * s1)
        c = x.shape[-1]
        dt = x.dtype
        h = jax.nn.gelu(
            jnp.dot(x1.reshape(-1, c), bp["mlp"]["fc1"]["kernel"].astype(dt))
            + bp["mlp"]["fc1"]["bias"].astype(dt), approximate=bool(fast_math))
        y = (jnp.dot(h, bp["mlp"]["fc2"]["kernel"].astype(dt))
             + bp["mlp"]["fc2"]["bias"].astype(dt)).reshape(x1.shape)
        br2 = L.layer_norm(bp["norm2"], y, fast=fast_math)
        return x1 + (br2 if s2 is None else br2 * s2)

    @jax.custom_vjp
    def fused(bp, xs, drop):
        ids = None if ids_np is None else jnp.asarray(ids_np)
        return _block_v2_call(bp, xs, geom, delta, canon_add, ids,
                              fast_math, drop=drop,
                              chunk_target=chunk_target, unroll=unroll)

    def fwd(bp, xs, drop):
        return fused(bp, xs, drop), (bp, xs, drop)

    def bwd(res, g):
        # Tie the residuals to the cotangent so the scheduler cannot
        # hoist the rematerialisation into the forward pass (it depends
        # only on residuals otherwise — jax.checkpoint plants the same
        # barrier; without it peak HBM grows by ~2 GiB at full size).
        res, g = jax.lax.optimization_barrier((res, g))
        _, vjp = jax.vjp(ref, *res)
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


def run_stage_train(stage_params, x, geom, drops, *, fast_math: bool = False,
                    chunk_target: int | None = None, unroll: bool = False,
                    grid_bwd: str = "pallas"):
    """Training forward of one EarthSpecificLayer through the whole-block
    kernels (same rolled-coordinate storage trick as run_stage_fused),
    differentiable via per-block custom_vjp rematerialisation.

    ``drops``: per-block (B, 2) fp32 stochastic-depth branch scales
    (attention, MLP) — precomputed by the caller so the RNG stream matches
    the XLA path exactly; pass None entries for rate-0 blocks."""
    wz, wh, ww = geom.window
    B, Z, H, W, C = x.shape
    hp = geom.h_padded
    xs = jnp.pad(x, ((0, 0), (0, 0), (0, hp - H), (0, 0), (0, 0)))
    half = (wz // 2, wh // 2, ww // 2)
    off = (0, 0, 0)

    for j, bp in enumerate(stage_params["blocks"]):
        shifted = (j % 2 == 1)
        target = half if shifted else (0, 0, 0)
        delta = tuple(t - o for t, o in zip(target, off))
        core = _block_v2_train_core(geom, delta, target[1], shifted,
                                    fast_math, chunk_target, unroll,
                                    grid_bwd)
        xs = core(bp, xs, drops[j])
        off = target

    if off != (0, 0, 0):
        xs = jnp.roll(xs, off, axis=(1, 2, 3))
    return xs[:, :, :H]


def run_stage_train_sharded(stage_params, x, geom, drops, mesh, *,
                            fast_math: bool = False,
                            chunk_target: int | None = None,
                            unroll: bool = False, grid_bwd: str = "pallas"):
    """Training forward+backward of one EarthSpecificLayer through the
    whole-block kernels on a >1-device mesh (VERDICT round-1 item 3).

    shard_map over (dp=batch, sp=longitude): the per-block custom_vjp
    cores run per shard with the LONGITUDE component of each half-window
    shift materialised as a ``lax.ppermute`` halo exchange (``_lon_shift``)
    BEFORE the kernel — in-kernel lon rotates would wrap at shard
    boundaries.  The halo exchange is an ordinary differentiable op, so
    the backward's recompute gets the reverse ppermute for free from its
    vjp, and shard_map's transpose psums the replicated parameter
    gradients across shards — the gradient sync the reference's DDP setup
    forgot to wire (/root/reference/era5_data/utils_dist.py:125)."""
    from jax.sharding import PartitionSpec as P

    sp = int(dict(mesh.shape).get("sp", 1))
    spec_x = P("dp", None, None, "sp", None)
    spec_d = P("dp", None)

    def inner(params, xx, dr):
        wz, wh, ww = geom.window
        B, Z, H, W, C = xx.shape
        hp = geom.h_padded
        xs = jnp.pad(xx, ((0, 0), (0, 0), (0, hp - H), (0, 0), (0, 0)))
        half = (wz // 2, wh // 2, ww // 2)
        off = (0, 0, 0)
        for j, bp in enumerate(params["blocks"]):
            shifted = (j % 2 == 1)
            target = half if shifted else (0, 0, 0)
            delta = tuple(t - o for t, o in zip(target, off))
            if delta[2]:
                xs = _lon_shift(xs, delta[2], "sp", sp)
                delta = (delta[0], delta[1], 0)
            core = _block_v2_train_core(geom, delta, target[1], shifted,
                                        fast_math, chunk_target, unroll,
                                        grid_bwd)
            xs = core(bp, xs, dr[j])
            off = target
        if off != (0, 0, 0):
            xs = jnp.roll(xs, off[:2], axis=(1, 2))
            xs = _lon_shift(xs, -off[2], "sp", sp)
        return xs[:, :, :H]

    return jax.shard_map(inner, mesh=mesh,
                         in_specs=(P(), spec_x, [spec_d] * len(drops)),
                         out_specs=spec_x, check_vma=False)(
        stage_params, x, list(drops))


def _lon_shift(xs, dw: int, sp_axis: Optional[str], sp_size: int):
    """Global ``jnp.roll(xs, -dw, axis=3)`` on a storage tensor whose lon
    axis may be sharded over mesh axis ``sp_axis`` (shard_map context).

    The longitude roll is the ONLY cross-shard communication the
    shifted-window blocks need (reference torch.roll on W,
    models/layers.py:199-201): each shard exchanges a half-window halo
    (|dw| columns of (B, Z, Hp, C)) with one neighbour over ICI via
    ``lax.ppermute`` — the wrap-around is physically exact on a sphere.
    """
    if dw == 0:
        return xs
    if sp_axis is None or sp_size == 1:
        return jnp.roll(xs, -dw, axis=3)
    if dw > 0:
        # left shift: local tail comes from the right neighbour's head
        halo = jax.lax.ppermute(
            xs[:, :, :, :dw], sp_axis,
            [((i + 1) % sp_size, i) for i in range(sp_size)])
        return jnp.concatenate([xs[:, :, :, dw:], halo], axis=3)
    d = -dw
    halo = jax.lax.ppermute(
        xs[:, :, :, -d:], sp_axis,
        [((i - 1) % sp_size, i) for i in range(sp_size)])
    return jnp.concatenate([halo, xs[:, :, :, :-d]], axis=3)


def stage_supports_fused(stage_params) -> bool:
    return not any(_has_lora(bp) for bp in stage_params["blocks"])


def stage_shardable(geom, mesh_shape: dict, batch: int) -> bool:
    """True when the fused stage can run under shard_map on this mesh:
    dp must divide the batch, every longitude shard must hold whole
    windows, and tp must be 1 (head-sharding would split the per-head
    loop across chips and force a psum before the fused tail)."""
    dp = mesh_shape.get("dp", 1)
    sp = mesh_shape.get("sp", 1)
    tp = mesh_shape.get("tp", 1)
    return (tp == 1 and batch % dp == 0
            and geom.w % (sp * geom.window[2]) == 0)


def run_stage_fused_sharded(stage_params, x, geom, mesh, *,
                            fast_math: bool = False,
                            chunk_target: int | None = None,
                            unroll: bool = False):
    """shard_map wrapper: run the whole-block kernels per (dp, sp) shard.

    GSPMD cannot partition a ``pallas_call``, so under a >1-device mesh
    the kernels must be invoked per shard with manual collectives — the
    batch splits over dp, longitude over sp (windowed attention is
    W-local), and the only communication is the half-window halo exchange
    of the shifted blocks' longitude roll (see ``_lon_shift``). This keeps
    the fused-kernel win on a real slice instead of falling back to XLA.
    """
    from jax.sharding import PartitionSpec as P

    sp = int(dict(mesh.shape).get("sp", 1))
    spec_x = P("dp", None, None, "sp", None)

    def inner(params, xx):
        return run_stage_fused(params, xx, geom, fast_math=fast_math,
                               sp_axis="sp", sp_size=sp,
                               chunk_target=chunk_target, unroll=unroll)

    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation, which the vma checker insists on
    return jax.shard_map(inner, mesh=mesh, in_specs=(P(), spec_x),
                         out_specs=spec_x, check_vma=False)(stage_params, x)


def run_stage_fused(stage_params, x, geom, *, fast_math: bool = False,
                    sp_axis: Optional[str] = None, sp_size: int = 1,
                    chunk_target: int | None = None, unroll: bool = False):
    """Run one EarthSpecificLayer (stack of alternating no-roll/roll
    blocks, models/layers.py:110-125) entirely in whole-block kernels.

    x: (B, Z, H, W, C) canonical token grid; returns the same. Storage
    between blocks carries a coordinate offset (see module docstring);
    a single roll + crop at stage end restores canonical layout.

    Under ``shard_map`` with the lon axis sharded over mesh axis
    ``sp_axis`` (sp_size shards), x is the LOCAL shard: the longitude
    component of each roll runs as a ppermute halo exchange instead of the
    in-kernel rotate (which would wrap at shard boundaries), and z/lat
    components stay in the kernels' index maps. W must be a multiple of
    the window so every shard holds whole windows.
    """
    wz, wh, ww = geom.window
    B, Z, H, W, C = x.shape
    hp = geom.h_padded
    xs = jnp.pad(x, ((0, 0), (0, 0), (0, hp - H), (0, 0), (0, 0)))
    half = (wz // 2, wh // 2, ww // 2)
    off = (0, 0, 0)
    mask = None
    sharded = sp_axis is not None and sp_size > 1

    for j, bp in enumerate(stage_params["blocks"]):
        shifted = (j % 2 == 1)
        target = half if shifted else (0, 0, 0)
        delta = tuple(t - o for t, o in zip(target, off))
        if shifted and mask is None:
            from pangu_tpu.models.layers import window_region_ids
            mask = jnp.asarray(window_region_ids(Z, hp, geom.window))
        if sharded and delta[2]:
            xs = _lon_shift(xs, delta[2], sp_axis, sp_size)
            delta = (delta[0], delta[1], 0)
        xs = _block_v2_call(bp, xs, geom, delta, canon_add=target[1],
                            mask=mask if shifted else None,
                            fast_math=fast_math, chunk_target=chunk_target,
                            unroll=unroll)
        off = target

    if off != (0, 0, 0):
        if sharded:
            xs = jnp.roll(xs, off[:2], axis=(1, 2))
            xs = _lon_shift(xs, -off[2], sp_axis, sp_size)
        else:
            xs = jnp.roll(xs, off, axis=(1, 2, 3))
    return xs[:, :, :H]
