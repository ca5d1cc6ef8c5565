"""Patch embedding straight into window-major storage: one Pallas kernel
replaces the XLA embed convolutions AND the canonical->wm entry relayout.

The cold single-step path was: XLA strided conv3d (~25 ms; XLA picks
badly padded layouts for the (NCDHW -> NDHWC) patch projection) followed
by ``to_window_major`` (an HBM relayout).  Here the upper-air branch is
a Pallas kernel whose per-program tile is one (z-plane, token-lat-pair):

  * the (var, z_off, h_off) gather is pure sublane work on a
    (6, 2, 8, lon) tile (lanes = lon, untouched);
  * the lane->sublane change happens in ONE 2-D transpose
    (48, 1536) -> (1536, 48) (hardware-verified, scripts/transpose_probe);
  * the stride-4 w_off de-interleave is then a sublane reshape + static
    slices, and the projection is 4 small MXU dots contracting 48 lanes;
  * the output block is written directly as 24 rows of the stage-0
    window-major entry storage — the relayout never exists.

The surface branch (1/8 of the work, and XLA handles its 2-D conv fine)
stays an XLA conv; its token plane rides into the kernel as a second ref
whose block index ignores the z grid dimension, so Mosaic fetches it
once per lat-pair, and the z=0 programs just relayout it into wm rows.

Reference semantics: PatchEmbedding_pretrain
(/root/reference/models/layers.py:12-93) — normalisation inside the
model, const-mask channels appended to surface, const_h appended to
upper, surface plane = token plane 0.  Numerics match layers.patch_embed
(same contraction order, fp32 MXU accumulation) with pad token rows
zeroed exactly like ``to_window_major(jnp.pad(...))``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pangu_tpu.config import ModelConfig

def _lon_pad(cfg: ModelConfig) -> int:
    # lon padded to a lane-transposable 128-multiple (1440 -> 1536); the
    # pad lanes only ever feed the masked wt >= w_tokens rows
    return -(-cfg.lon // 128) * 128


def _upper_weights(p, cfg: ModelConfig, dtype):
    """(V1*pz*ph*pw, C) ONNX-layout kernel -> (pw, ph*V1*pz, C): one
    48-row projection matrix per w_off, rows ordered (h_off, var, z_off)
    to match the kernel's tile gather order."""
    pz, ph, pw = cfg.patch
    v1 = cfg.upper_vars + 1
    c = cfg.dims[0]
    w = p["upper"]["kernel"].reshape(v1, pz, ph, pw, c)
    w = w.transpose(3, 2, 0, 1, 4).reshape(pw, ph * v1 * pz, c)
    return w.astype(dtype)


def embed_supported(cfg: ModelConfig) -> bool:
    geom = cfg.stage(0)
    pz, ph, pw = cfg.patch
    wz, wh, ww = geom.window
    return (pw == 4 and ph == 4 and pz == 2 and wz == 2
            and cfg.w_tokens % ww == 0 and wh % 2 == 0
            and (cfg.upper_vars + 1) * pz * ph % 8 == 0)


def _make_kernel(cfg: ModelConfig, nlon: int, wh: int, ww: int, c: int):
    pz, ph, pw = cfg.patch
    v1 = cfg.upper_vars + 1                     # + const_h channel
    rows = ph * v1 * pz                          # 48
    wt = cfg.w_tokens                            # 360
    lon_pad = _lon_pad(cfg)
    wt_pad = lon_pad // pw                       # 384
    h_real = cfg.h_tokens                        # 181

    def kernel(xn_ref, st_ref, w_ref, b_ref, o_ref, ts_s):
        hh = pl.program_id(1)
        z = pl.program_id(2)

        @pl.when(z == 0)
        def _():
            st = st_ref[0]                       # (2, wt, C) surface tokens
            t = st.reshape(2, nlon, ww, c)
            o_ref[0, 0, 0] = t.transpose(1, 0, 2, 3).reshape(nlon, 2 * ww, c)

        @pl.when(z > 0)
        def _():
            x = xn_ref[0]                        # (V1, pz, 2*ph, lon_pad)
            x = x.transpose(2, 0, 1, 3)          # (2*ph, V1, pz, lon_pad)
            x = x.reshape(2, ph, v1, pz, lon_pad)
            for sub in range(2):
                t = x[sub].reshape(rows, lon_pad)
                t = t.T                          # (LON_PAD, rows) — the one
                t = t.reshape(wt_pad, pw, rows)  # lane<->sublane transpose
                acc = None
                for wo in range(pw):
                    d = jax.lax.dot_general(
                        t[:, wo, :], w_ref[wo],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = d if acc is None else acc + d
                y = acc + b_ref[...].astype(jnp.float32)[None]
                # token-lat pad rows (>= h_tokens) are REAL zeros, exactly
                # like to_window_major(jnp.pad(...)) hands the stage
                y = jnp.where(2 * hh + sub < h_real, y, jnp.zeros_like(y))
                ts_s[sub] = y.astype(o_ref.dtype)[:wt].reshape(nlon, ww, c)
            o_ref[0, 0, 0] = ts_s[...].transpose(1, 0, 2, 3).reshape(
                nlon, 2 * ww, c)

    return kernel


def embed_wm(p, upper, surface, constants, cfg: ModelConfig, *,
             interpret: bool = False):
    """Raw (B, 5, levels, lat, lon) + (B, 4, lat, lon) physical fields ->
    stage-0 window-major entry storage (B, nz, nlat, nlon, N, C) in
    canonical coordinates, pad rows zeroed.

    Equals ``to_window_major(pad(patch_embed(...)))`` (pinned by
    tests/test_ops.py); use :func:`embed_supported` to gate."""
    from pangu_tpu.models import layers as L

    geom = cfg.stage(0)
    wz, wh, ww = geom.window
    nz = geom.z // wz
    nlat = geom.h_padded // wh
    nlon = geom.w // ww
    n = wz * wh * ww
    c = cfg.dims[0]
    pz, ph, pw = cfg.patch
    b = upper.shape[0]
    dtype = jnp.dtype(cfg.compute_dtype)

    # ---- XLA pre-pass: normalise + const_h concat + pad + cast ----------
    um = constants["upper_mean"].astype(dtype)
    us = constants["upper_std"].astype(dtype)
    up = (upper.astype(dtype) - um[None]) / us[None]
    x6 = jnp.concatenate(
        [up, jnp.broadcast_to(constants["const_h"].astype(dtype)[None, None],
                              (b, 1, cfg.levels, cfg.lat, cfg.lon))], axis=1)
    lat_in = nlat * wh * ph     # every program's 2*ph-row tile in range
    x6 = jnp.pad(x6, ((0, 0), (0, 0),
                      (0, cfg.levels_padded - cfg.levels),
                      (0, lat_in - cfg.lat), (0, _lon_pad(cfg) - cfg.lon)))

    # ---- XLA surface branch: small 2-D conv -> padded token plane -------
    sm = constants["surface_mean"].astype(dtype)
    ss = constants["surface_std"].astype(dtype)
    sf = (surface.astype(dtype) - sm[None]) / ss[None]
    sf = jnp.pad(sf, ((0, 0), (0, 0), (0, cfg.lat_padded - cfg.lat), (0, 0)))
    smv = cfg.surface_vars + cfg.const_masks
    ws = p["surface"]["kernel"].astype(dtype)
    ws = ws.reshape(smv, ph, pw, c).transpose(3, 0, 1, 2)
    xs = jax.lax.conv_general_dilated(
        sf, ws[:, :cfg.surface_vars], window_strides=(ph, pw),
        padding="VALID", dimension_numbers=("NCHW", "OIHW", "NHWC"))
    cs = jax.lax.conv_general_dilated(
        constants["surface_masks"].astype(dtype)[None],
        ws[:, cfg.surface_vars:], window_strides=(ph, pw),
        padding="VALID", dimension_numbers=("NCHW", "OIHW", "NHWC"))
    st = xs + cs + p["surface"]["bias"].astype(dtype)
    st = jnp.pad(st, ((0, 0), (0, nlat * wh - cfg.h_tokens), (0, 0), (0, 0)))

    w4 = _upper_weights(p, cfg, dtype)
    bias = p["upper"]["bias"].astype(dtype)
    v1 = cfg.upper_vars + 1

    n_hh = nlat * wh // 2                        # lat-pairs (93)
    zplanes = nz * wz                            # 8

    def xn_imap(bb, hh, z):
        # plane z>=1 is upper token plane z-1 (levels 2(z-1)..2z-1); the
        # z=0 program fetches the same block as its z=1 neighbour (free:
        # consecutive programs share the block) and ignores it
        return (bb, 0, jnp.maximum(z - 1, 0), hh, 0)

    x_spec = pl.BlockSpec((1, v1, pz, 2 * ph, _lon_pad(cfg)),
                          xn_imap, memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((1, 2, cfg.w_tokens, c),
                           lambda bb, hh, z: (bb, hh, 0, 0),
                           memory_space=pltpu.VMEM)

    def fullspec(shape):
        return pl.BlockSpec(shape, lambda bb, hh, z: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec(
        (1, 1, 1, nlon, 2 * ww, c),
        lambda bb, hh, z: (bb, z // 2, hh // (wh // 2), 0,
                           (wh // 2) * (z % 2) + hh % (wh // 2), 0),
        memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _make_kernel(cfg, nlon, wh, ww, c),
        out_shape=jax.ShapeDtypeStruct((b, nz, nlat, nlon, n, c), dtype),
        grid=(b, n_hh, zplanes),
        in_specs=[x_spec, st_spec, fullspec(w4.shape), fullspec(bias.shape)],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((2, nlon, ww, c), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (zplanes - 1) * n_hh * 2 * cfg.w_tokens
            * (ph * v1 * pz) * c,
            bytes_accessed=int(x6.size * x6.dtype.itemsize
                               + st.size * st.dtype.itemsize
                               + b * nz * nlat * nlon * n * c
                               * jnp.dtype(dtype).itemsize),
            transcendentals=0),
        interpret=interpret,
    )(x6, st, w4, bias)


# ---------------------------------------------------------------------------
# Differentiable edge: Pallas forward + Pallas/XLA backward
# ---------------------------------------------------------------------------

def _make_dw_kernel(cfg: ModelConfig, nlon: int, wh: int, ww: int, c: int):
    """Weight-grad kernel for the upper embed branch: same tile walk as
    the forward (:func:`_make_kernel`), but each program contracts its
    im2col'd patch rows against the window-major cotangent block and
    accumulates dK (pw, rows, C) + db (1, C) in fp32 output blocks that
    every program maps to.  This kills the XLA direct-math backward's
    8-D im2col materialisation, whose (.., wt, pw) trailing dims draw a
    lane-padded layout ~32x the logical size (~4.7 GB, ~21 ms/step)."""
    pz, ph, pw = cfg.patch
    v1 = cfg.upper_vars + 1
    rows = ph * v1 * pz
    wt = cfg.w_tokens
    lon_pad = _lon_pad(cfg)
    wt_pad = lon_pad // pw
    h_real = cfg.h_tokens
    f32 = jnp.float32

    def kernel(xn_ref, dy_ref, dk_ref, db_ref):
        bb = pl.program_id(0)
        hh = pl.program_id(1)
        z = pl.program_id(2)

        @pl.when((bb == 0) & (hh == 0) & (z == 0))
        def _():
            dk_ref[...] = jnp.zeros_like(dk_ref)
            db_ref[...] = jnp.zeros_like(db_ref)

        @pl.when(z > 0)
        def _():
            x = xn_ref[0]                        # (V1, pz, 2*ph, lon_pad)
            x = x.transpose(2, 0, 1, 3)          # (2*ph, V1, pz, lon_pad)
            x = x.reshape(2, ph, v1, pz, lon_pad)
            g = dy_ref[0, 0, 0].reshape(nlon, 2, ww, c)
            g = g.transpose(1, 0, 2, 3)          # (2, nlon, ww, c)
            for sub in range(2):
                t = x[sub].reshape(rows, lon_pad)
                t = t.T                          # (LON_PAD, rows) — the one
                t = t.reshape(wt_pad, pw, rows)  # lane<->sublane transpose
                y = g[sub].reshape(wt, c)
                # the forward zeroed token-lat pad rows; their incoming
                # cotangent is dead and must not reach the weight grad
                y = jnp.where(2 * hh + sub < h_real, y, jnp.zeros_like(y))
                for wo in range(pw):
                    d = jax.lax.dot_general(
                        t[:wt, wo, :], y, (((0,), (0,)), ((), ())),
                        preferred_element_type=f32)
                    dk_ref[wo] += d
                db_ref[0] += jnp.sum(y.astype(f32), axis=0)

    return kernel


def embed_dw_upper(dxs, upper, constants, cfg: ModelConfig, *,
                   interpret: bool = False):
    """Upper-branch embed weight grads straight from the window-major
    cotangent: (dK (V1*pz*ph*pw, C) fp32 in the ONNX row order of
    p['upper']['kernel'], db (C,) fp32).  const_h rows fall out of the
    same contraction (const_h rides x6 as channel V1-1, broadcast over
    batch, so accumulating over the batch grid IS its cotangent sum)."""
    geom = cfg.stage(0)
    wz, wh, ww = geom.window
    nz = geom.z // wz
    nlat = geom.h_padded // wh
    nlon = geom.w // ww
    c = cfg.dims[0]
    pz, ph, pw = cfg.patch
    v1 = cfg.upper_vars + 1
    rows = ph * v1 * pz
    b = upper.shape[0]
    dtype = dxs.dtype

    # same normalise + const_h concat + pad pre-pass as the forward (the
    # caller's optimization_barrier ties this recompute to the cotangent)
    um = constants["upper_mean"].astype(dtype)
    us = constants["upper_std"].astype(dtype)
    up = (upper.astype(dtype) - um[None]) / us[None]
    x6 = jnp.concatenate(
        [up, jnp.broadcast_to(constants["const_h"].astype(dtype)[None, None],
                              (b, 1, cfg.levels, cfg.lat, cfg.lon))], axis=1)
    lat_in = nlat * wh * ph
    x6 = jnp.pad(x6, ((0, 0), (0, 0),
                      (0, cfg.levels_padded - cfg.levels),
                      (0, lat_in - cfg.lat), (0, _lon_pad(cfg) - cfg.lon)))

    n_hh = nlat * wh // 2
    zplanes = nz * wz

    def xn_imap(bb, hh, z):
        return (bb, 0, jnp.maximum(z - 1, 0), hh, 0)

    x_spec = pl.BlockSpec((1, v1, pz, 2 * ph, _lon_pad(cfg)),
                          xn_imap, memory_space=pltpu.VMEM)
    dy_spec = pl.BlockSpec(
        (1, 1, 1, nlon, 2 * ww, c),
        lambda bb, hh, z: (bb, z // 2, hh // (wh // 2), 0,
                           (wh // 2) * (z % 2) + hh % (wh // 2), 0),
        memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((pw, rows, c), lambda bb, hh, z: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    db_spec = pl.BlockSpec((1, c), lambda bb, hh, z: (0, 0),
                           memory_space=pltpu.VMEM)

    dk4, db = pl.pallas_call(
        _make_dw_kernel(cfg, nlon, wh, ww, c),
        out_shape=(jax.ShapeDtypeStruct((pw, rows, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)),
        grid=(b, n_hh, zplanes),
        in_specs=[x_spec, dy_spec],
        out_specs=(acc_spec, db_spec),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (zplanes - 1) * n_hh * 2 * pw
            * cfg.w_tokens * rows * c,
            bytes_accessed=int(x6.size * x6.dtype.itemsize
                               + dxs.size * dxs.dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(x6, dxs)

    # kernel rows are (ph, v1, pz) per w_off (the forward's projection
    # layout, _upper_weights) -> ONNX (v1, pz, ph, pw) row order
    dk = dk4.reshape(pw, ph, v1, pz, c).transpose(2, 3, 1, 0, 4)
    return dk.reshape(v1 * pz * ph * pw, c), db[0]


def _surface_im2col(surface, constants, cfg: ModelConfig):
    """(vars (B,·), masks (broadcast)) -> per-sample (B, HT, WT, S*ph*pw)
    and shared (HT, WT, M*ph*pw) patch rows, both ordered (ch, h_off,
    w_off) to match the surface kernel row layout."""
    b = surface.shape[0]
    pz, ph, pw = cfg.patch
    dtype = surface.dtype
    ht, wt = cfg.h_tokens, cfg.w_tokens
    sm = constants["surface_mean"].astype(dtype)
    ss = constants["surface_std"].astype(dtype)
    sf = (surface - sm[None]) / ss[None]
    sf = jnp.pad(sf, ((0, 0), (0, 0), (0, cfg.lat_padded - cfg.lat), (0, 0)))
    sv = sf.reshape(b, cfg.surface_vars, ht, ph, wt, pw)
    sv = sv.transpose(0, 2, 4, 1, 3, 5).reshape(
        b, ht, wt, cfg.surface_vars * ph * pw)
    if "surface_mask_patches" in constants:
        mp = constants["surface_mask_patches"].astype(dtype)
    else:
        mk = constants["surface_masks"].astype(dtype)
        mp = mk.reshape(cfg.const_masks, ht, ph, wt, pw)
        mp = mp.transpose(1, 3, 0, 2, 4).reshape(
            ht, wt, cfg.const_masks * ph * pw)
    return sv, mp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def embed_wm_train(p, upper, surface, constants, cfg: ModelConfig):
    """Differentiable :func:`embed_wm`: the Pallas kernel runs the forward
    and the backward is direct XLA math (non-overlapping patches make the
    conv transpose a reshape, and the weight grad one tall matmul) — the
    training step never pays the XLA embed's conv/relayout gauntlet in
    EITHER direction.  Weight/bias/input cotangents match ``jax.grad`` of
    ``to_window_major(pad(L.patch_embed(...)))`` (pinned by
    tests/test_ops.py); ``constants`` are data and get zero cotangents."""
    return embed_wm(p, upper, surface, constants, cfg)


def _embed_train_fwd(p, upper, surface, constants, cfg):
    return embed_wm(p, upper, surface, constants, cfg), (p, upper, surface,
                                                         constants)


def _embed_train_bwd(cfg, res, dxs):
    from pangu_tpu.ops.earth_block_wm import from_window_major

    p, upper, surface, constants = res
    # anti-hoist: tie the normalise/im2col recomputes to the cotangent's
    # arrival, or XLA schedules them into the FORWARD and keeps the
    # ~150 MB patch tensors alive across the whole step (the same
    # slow-state HBM cliff NOTES.md documents for hand-rolled custom_vjp
    # remat; jax.checkpoint plants this barrier automatically)
    (upper, surface), dxs = jax.lax.optimization_barrier(
        ((upper, surface), dxs))
    geom = cfg.stage(0)
    pz, ph, pw = cfg.patch
    c = cfg.dims[0]
    zp, ht, wt = cfg.upper_planes, cfg.h_tokens, cfg.w_tokens
    b = upper.shape[0]
    f32 = jnp.float32

    # wm cotangent -> canonical token grid; the forward zeroed the lat-pad
    # token rows, so their incoming cotangent is dropped by the crop
    dtok = from_window_major(dxs, geom.window)[:, :, :ht]
    du_tok = dtok[:, 1:]                         # (B, ZP, HT, WT, C)
    ds_tok = dtok[:, 0]                          # (B, HT, WT, C)

    # ---- upper branch: Pallas dW kernel off the wm cotangent --------------
    fv_u = cfg.upper_vars * pz * ph * pw         # 160 variable rows
    dk_u, db_u = embed_dw_upper(dxs, upper, constants, cfg)

    # input cotangent: d(im2col) = dY @ K_vars^T, inverse-im2col'd back to
    # the field (pure reshape — patches don't overlap), un-normalised.
    # Dead-code-eliminated when only parameter grads are requested.
    kv = p["upper"]["kernel"].astype(du_tok.dtype)
    dcols = jax.lax.dot_general(
        du_tok.reshape(-1, c), kv[:fv_u], (((1,), (1,)), ((), ())),
        preferred_element_type=f32).astype(du_tok.dtype)
    dx = dcols.reshape(b, zp, ht, wt, cfg.upper_vars, pz, ph, pw)
    dx = dx.transpose(0, 4, 1, 5, 2, 6, 3, 7).reshape(
        b, cfg.upper_vars, cfg.levels_padded, cfg.lat_padded, cfg.lon)
    us = constants["upper_std"].astype(du_tok.dtype)
    d_upper = (dx[:, :, :cfg.levels, :cfg.lat] / us[None]).astype(upper.dtype)

    # ---- surface branch ----------------------------------------------------
    sv, mp = _surface_im2col(surface, constants, cfg)
    fv = cfg.surface_vars * ph * pw
    dk_s_vars = jax.lax.dot_general(
        sv.reshape(-1, fv), ds_tok.reshape(-1, c),
        (((0,), (0,)), ((), ())), preferred_element_type=f32)
    ds_sum = jnp.sum(ds_tok.astype(f32), axis=0)  # masks broadcast over B
    dk_s_masks = jax.lax.dot_general(
        mp.reshape(-1, mp.shape[-1]).astype(f32), ds_sum.reshape(-1, c),
        (((0,), (0,)), ((), ())), preferred_element_type=f32)
    db_s = jnp.sum(ds_sum, axis=(0, 1))

    ks = p["surface"]["kernel"].astype(ds_tok.dtype)
    dsv = jax.lax.dot_general(
        ds_tok.reshape(-1, c), ks[:fv], (((1,), (1,)), ((), ())),
        preferred_element_type=f32).astype(ds_tok.dtype)
    dsf = dsv.reshape(b, ht, wt, cfg.surface_vars, ph, pw)
    dsf = dsf.transpose(0, 3, 1, 4, 2, 5).reshape(
        b, cfg.surface_vars, cfg.lat_padded, cfg.lon)
    ss = constants["surface_std"].astype(ds_tok.dtype)
    d_surface = (dsf[:, :, :cfg.lat] / ss[None]).astype(surface.dtype)

    dp = {
        "upper": {"kernel": dk_u.astype(p["upper"]["kernel"].dtype),
                  "bias": db_u.astype(p["upper"]["bias"].dtype)},
        "surface": {"kernel": jnp.concatenate([dk_s_vars, dk_s_masks]
                                              ).astype(
                                                  p["surface"]["kernel"].dtype),
                    "bias": db_s.astype(p["surface"]["bias"].dtype)},
    }
    dconst = jax.tree.map(jnp.zeros_like, constants)
    return dp, d_upper, d_surface, dconst


embed_wm_train.defvjp(_embed_train_fwd, _embed_train_bwd)
