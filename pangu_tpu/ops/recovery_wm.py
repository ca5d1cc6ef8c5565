"""Patch recovery straight from rolled window-major storage: one Pallas
kernel per branch replaces the stage-3 roll-back + crop relayouts AND the
XLA recovery transpose gauntlet.

The cold single-step tail was: from_window_major + jnp.roll + crop (two
HBM relayouts of the 175 MB skip/decoder pair) then patch_recovery's
dense + 8-D interleave transpose (~31 ms; XLA picks a hugely padded
layout for the interleave — NOTES.md measured ~4.7 GB/sample at bf16).
Here each program owns one (z-plane, lat-window) slab:

  * the roll-back is the same modular chunk-stitch read the wm down/up
    kernels use (two lat-window chunks + _lon_unroll, zero relayout);
  * the split-row dense (skip | decoder, models/pangu_model.py:83-85)
    runs as two MXU dots with fp32 accumulation;
  * the (h_off) de-interleave is a 2-D lane<->sublane transpose per
    token-lat row (hardware-verified, scripts/transpose_probe.py);
  * the (w_off) lane interleave into physical longitude runs on the MXU
    as a 0/1 selection matmul (384 -> 1440 lanes, 4wt+wo order) — the
    selection matrix also zeroes the wt >= w_tokens garbage rows.

Reference semantics: PatchRecovery_pretrain
(/root/reference/models/layers.py:501-545) — out features ordered
(var, z_off, h_off, w_off), outputs stay normalised, crop to the real
(levels, lat) extents.  Numerics match layers.patch_recovery (pinned by
tests/test_ops.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pangu_tpu.config import ModelConfig
from pangu_tpu.ops.updown_wm import _lon_unroll

_FPAD = 256          # dense out-features padded to a transposable lane count


def recovery_supported(cfg: ModelConfig) -> bool:
    geom = cfg.stage(3)
    pz, ph, pw = cfg.patch
    wz, wh, ww = geom.window
    return (pw == 4 and ph == 4 and pz == 2 and wz == 2
            and cfg.upper_vars * pz * ph * pw <= _FPAD
            and cfg.w_tokens % ww == 0)


@functools.lru_cache(maxsize=8)
def _sel_matrix(wt: int, wt_pad: int, pw: int, lon: int):
    """(pw, wt_pad, lon) 0/1 interleave: row wt of slab wo feeds physical
    lon 4*wt+wo; the wt >= w_tokens pad rows stay all-zero, killing the
    uninitialised scratch rows they would otherwise leak."""
    s = np.zeros((pw, wt_pad, lon), np.float32)
    for wo in range(pw):
        for w in range(wt):
            s[wo, w, pw * w + wo] = 1.0
    return s


def _stitch_rows(chunks, wh, ww, off, dwo):
    """Kernel-side: chunk list -> (nlon, wh*ww, C) canonical token rows
    (h-major, w-minor) for this program's lat window."""
    if len(chunks) == 1:
        x = chunks[0][0, 0, 0]
    else:
        cat = jnp.concatenate([ch[0, 0, 0] for ch in chunks], axis=1)
        start = (wh - off[1]) % wh
        x = cat[:, start * ww:(start + wh) * ww]
    return _lon_unroll(x, ww, dwo)


def _make_upper_kernel(cfg: ModelConfig, geom, off, nk: int, nlon: int):
    wz, wh, ww = geom.window
    pz, ph, pw = cfg.patch
    v = cfg.upper_vars
    c = geom.dim
    wt = cfg.w_tokens
    wt_pad = -(-wt // 128) * 128                 # 360 -> 384 (transposable)
    feat = v * pz * ph * pw                      # 160
    rvo = v * pz * ph                            # 40 rows after wo split
    dwo = -off[2]

    def kernel(*refs):
        sk = refs[:nk]
        dc = refs[nk:2 * nk]
        wsk_ref, wdc_ref, b_ref, s_ref, o_ref, y_s, o_s = refs[2 * nk:]

        xs = _stitch_rows(sk, wh, ww, off, dwo)      # (nlon, wh*ww, C)
        xd = _stitch_rows(dc, wh, ww, off, dwo)
        y = jax.lax.dot_general(
            xs.reshape(nlon * wh * ww, c), wsk_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        y = y + jax.lax.dot_general(
            xd.reshape(nlon * wh * ww, c), wdc_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        y = (y + b_ref[...].astype(jnp.float32)[None]).astype(o_ref.dtype)
        # rows (iw, h, w) -> per token-lat row h: (wt, FPAD) slabs
        y = y.reshape(nlon, wh, ww, _FPAD)
        yt = y.transpose(1, 0, 2, 3).reshape(wh, wt, _FPAD)
        for h in range(wh):
            y_s[h, :wt] = yt[h]
            # pad rows must be FINITE zeros: the selection matmul zeroes
            # their columns, but NaN/Inf garbage times 0 is still NaN
            y_s[h, wt:] = jnp.zeros((wt_pad - wt, _FPAD), y_s.dtype)
            t = y_s[h].T                             # (FPAD, wt_pad)
            t = t[:feat].reshape(rvo, pw, wt_pad)    # (r=(v,zo,ho), wo, wt)
            acc = None
            for wo in range(pw):
                d = jax.lax.dot_general(
                    t[:, wo, :], s_ref[wo],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            o_s[h] = acc.astype(o_ref.dtype)         # (rvo, lon)
        out = o_s[...].reshape(wh, v, pz, ph, cfg.lon)
        o_ref[0, :, :, :, :] = out.transpose(1, 2, 0, 3, 4).reshape(
            v, pz, wh * ph, cfg.lon)

    return kernel


def _make_surface_kernel(cfg: ModelConfig, geom, off, nk: int, nlon: int):
    wz, wh, ww = geom.window
    pz, ph, pw = cfg.patch
    s_vars = cfg.surface_vars
    c = geom.dim
    wt = cfg.w_tokens
    wt_pad = -(-wt // 128) * 128
    feat = s_vars * ph * pw                      # 64
    rvo = s_vars * ph                            # 16
    dwo = -off[2]

    def kernel(*refs):
        sk = refs[:nk]
        dc = refs[nk:2 * nk]
        wsk_ref, wdc_ref, b_ref, s_ref, o_ref, y_s, o_s = refs[2 * nk:]

        xs = _stitch_rows(sk, wh, ww, off, dwo)
        xd = _stitch_rows(dc, wh, ww, off, dwo)
        y = jax.lax.dot_general(
            xs.reshape(nlon * wh * ww, c), wsk_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        y = y + jax.lax.dot_general(
            xd.reshape(nlon * wh * ww, c), wdc_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        y = (y + b_ref[...].astype(jnp.float32)[None]).astype(o_ref.dtype)
        y = y.reshape(nlon, wh, ww, _FPAD)
        yt = y.transpose(1, 0, 2, 3).reshape(wh, wt, _FPAD)
        for h in range(wh):
            y_s[h, :wt] = yt[h]
            y_s[h, wt:] = jnp.zeros((wt_pad - wt, _FPAD), y_s.dtype)
            t = y_s[h].T
            t = t[:feat].reshape(rvo, pw, wt_pad)
            acc = None
            for wo in range(pw):
                d = jax.lax.dot_general(
                    t[:, wo, :], s_ref[wo],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = d if acc is None else acc + d
            o_s[h] = acc.astype(o_ref.dtype)         # (rvo, lon)
        out = o_s[...].reshape(wh, s_vars, ph, cfg.lon)
        o_ref[0] = out.transpose(1, 0, 2, 3).reshape(s_vars, wh * ph, cfg.lon)

    return kernel


def _pad_cols(w, b, dtype):
    wp = jnp.pad(w.astype(dtype), ((0, 0), (0, _FPAD - w.shape[1])))
    bp = jnp.pad(b.astype(dtype), ((0, _FPAD - b.shape[0]),))
    return wp, bp


def recovery_wm(p, skip_wm, dec_wm, off, cfg: ModelConfig, *,
                interpret: bool = False):
    """Rolled stage-3-exit window-major storage pair -> normalised output
    fields (upper (B,5,levels,lat,lon), surface (B,4,lat,lon)).

    ``skip_wm``/``dec_wm``: (B, nz, nlat, nlon, N, C) holding canonical
    token t + off at position t (run_stage_wm exit storage).  Equals
    ``patch_recovery((canon(skip), canon(dec)))`` — pinned by
    tests/test_ops.py; gate with :func:`recovery_supported`."""
    geom = cfg.stage(3)
    wz, wh, ww = geom.window
    b, nz, nlat, nlon, n, c = skip_wm.shape
    pz, ph, pw = cfg.patch
    v = cfg.upper_vars
    dtype = skip_wm.dtype
    nk = 2 if off[1] else 1
    wt_pad = -(-cfg.w_tokens // 128) * 128

    sel = jnp.asarray(_sel_matrix(cfg.w_tokens, wt_pad, pw, cfg.lon)
                      ).astype(dtype)
    wu_sk, bu = _pad_cols(p["upper"]["kernel"][:c], p["upper"]["bias"], dtype)
    wu_dc, _ = _pad_cols(p["upper"]["kernel"][c:], p["upper"]["bias"], dtype)
    ws_sk, bs = _pad_cols(p["surface"]["kernel"][:c], p["surface"]["bias"],
                          dtype)
    ws_dc, _ = _pad_cols(p["surface"]["kernel"][c:], p["surface"]["bias"],
                         dtype)

    def fullspec(shape, ng):
        return pl.BlockSpec(shape, lambda *g: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    lat_pad = nlat * wh * ph                     # 744 (24 rows per program)

    # ---- upper branch: one program per (batch, z-plane, lat-window);
    # the plane-dependent (z-window, z-part) folds into the index map ----
    def up_chunk_spec(part_k):
        def imap(bb, zt, lw):
            zp = 1 + zt
            return (bb, ((zp - off[0]) // wz) % nz,
                    (lw - (1 if off[1] else 0) + part_k) % nlat,
                    0, (zp - off[0]) % wz, 0)
        return pl.BlockSpec((1, 1, 1, nlon, n // wz, c), imap,
                            memory_space=pltpu.VMEM)

    in_specs = ([up_chunk_spec(k) for k in range(nk)]
                + [up_chunk_spec(k) for k in range(nk)]
                + [fullspec(wu_sk.shape, 3), fullspec(wu_dc.shape, 3),
                   fullspec(bu.shape, 3), fullspec(sel.shape, 3)])
    out_spec = pl.BlockSpec((1, v, pz, wh * ph, cfg.lon),
                            lambda bb, zt, lw: (bb, 0, zt, lw, 0),
                            memory_space=pltpu.VMEM)

    upper = pl.pallas_call(
        _make_upper_kernel(cfg, geom, off, nk, nlon),
        out_shape=jax.ShapeDtypeStruct(
            (b, v, cfg.upper_planes * pz, lat_pad, cfg.lon), dtype),
        grid=(b, cfg.upper_planes, nlat),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((wh, wt_pad, _FPAD), dtype),
                        pltpu.VMEM((wh, v * pz * ph, cfg.lon), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * cfg.upper_planes * nlat
            * (2 * nlon * n // wz * c * _FPAD
               + wh * pw * (v * pz * ph) * wt_pad * cfg.lon),
            bytes_accessed=int(2 * nk * (skip_wm.size + dec_wm.size)
                               * dtype.itemsize // nz // 1),
            transcendentals=0),
        interpret=interpret,
    )(*([skip_wm] * nk + [dec_wm] * nk + [wu_sk, wu_dc, bu, sel]))

    # ---- surface branch: token plane 0 --------------------------------
    def sf_chunk_spec(part_k):
        zw0 = ((0 - off[0]) // wz) % nz
        pz0 = (0 - off[0]) % wz

        def imap(bb, lw):
            return (bb, zw0, (lw - (1 if off[1] else 0) + part_k) % nlat,
                    0, pz0, 0)
        return pl.BlockSpec((1, 1, 1, nlon, n // wz, c), imap,
                            memory_space=pltpu.VMEM)

    sf_specs = ([sf_chunk_spec(k) for k in range(nk)]
                + [sf_chunk_spec(k) for k in range(nk)]
                + [fullspec(ws_sk.shape, 2), fullspec(ws_dc.shape, 2),
                   fullspec(bs.shape, 2), fullspec(sel.shape, 2)])
    sf_out_spec = pl.BlockSpec((1, cfg.surface_vars, wh * ph, cfg.lon),
                               lambda bb, lw: (bb, 0, lw, 0),
                               memory_space=pltpu.VMEM)

    surface = pl.pallas_call(
        _make_surface_kernel(cfg, geom, off, nk, nlon),
        out_shape=jax.ShapeDtypeStruct(
            (b, cfg.surface_vars, lat_pad, cfg.lon), dtype),
        grid=(b, nlat),
        in_specs=sf_specs,
        out_specs=sf_out_spec,
        scratch_shapes=[pltpu.VMEM((wh, wt_pad, _FPAD), dtype),
                        pltpu.VMEM((wh, cfg.surface_vars * ph, cfg.lon),
                                   dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*([skip_wm] * nk + [dec_wm] * nk + [ws_sk, ws_dc, bs, sel]))

    return (upper[:, :, :cfg.levels, :cfg.lat],
            surface[:, :, :cfg.lat])


# ---------------------------------------------------------------------------
# Differentiable edge: Pallas forward + Pallas backward
# ---------------------------------------------------------------------------

def _make_bwd_kernel(cfg: ModelConfig, geom, off, nk: int, nlon: int,
                     zs_surf: int, zi_surf: int):
    """Transpose of the recovery forward, one program per STORAGE block
    (bb, z-window, lat-window): reads the field-cotangent chunks that this
    block's canonical tokens produced (modular lat/z index maps — the
    inverse of the forward's stitch-read), runs the selection-matmul
    interleave TRANSPOSED (contract physical lon lanes, no 8-D im2col
    tensor ever exists), emits both wm token-cotangent blocks, and
    accumulates the head weight/bias grads in fp32 against the saved
    skip/dec storage rows.  Replaces the direct-math XLA backward whose
    (.., wt, pw)-trailing im2col drew a ~4.7 GB lane-padded layout."""
    wz, wh, ww = geom.window
    pz, ph, pw = cfg.patch
    v = cfg.upper_vars
    sv = cfg.surface_vars
    c = geom.dim
    wt = cfg.w_tokens
    wt_pad = -(-wt // 128) * 128
    rvo = v * pz * ph                            # 40 upper rows per wo
    rvs = sv * ph                                # 16 surface rows per wo
    n = wz * wh * ww
    ht = cfg.h_tokens
    lat_tok = (geom.h_padded // wh) * wh         # 186 canonical lat tokens
    f32 = jnp.float32

    def kernel(*refs):
        du = [refs[zi * nk:(zi + 1) * nk] for zi in range(2)]
        ds = refs[2 * nk:3 * nk]
        (sk_ref, dc_ref, wsk4, wdc4, ssk4, sdc4, sel_ref,
         o_sk, o_dc, ak_sk, ak_dc, as_sk, as_dc, ab_u, ab_s,
         scr_sk, scr_dc) = refs[3 * nk:]
        bb = pl.program_id(0)
        zs = pl.program_id(1)
        ls = pl.program_id(2)

        @pl.when((bb == 0) & (zs == 0) & (ls == 0))
        def _():
            for r in (ak_sk, ak_dc, as_sk, as_dc, ab_u, ab_s):
                r[...] = jnp.zeros_like(r)

        # saved storage rows -> canonical lon order (matches the dt tiles)
        xs_c = _lon_unroll(sk_ref[0, 0, 0], ww, -off[2])    # (nlon, n, C)
        xd_c = _lon_unroll(dc_ref[0, 0, 0], ww, -off[2])
        xs5 = xs_c.reshape(nlon, wz, wh, ww, c)
        xd5 = xd_c.reshape(nlon, wz, wh, ww, c)

        def field_rows(chunks, j, width):
            """This (zi, j)'s field-cotangent rows (width, lon): chunk
            concat + the off-lat cut + the per-token-lat slice."""
            if nk == 1:
                cut = chunks[0][0]
            else:
                cat = jnp.concatenate([ch[0] for ch in chunks], axis=-2)
                cut = cat[..., off[1] * ph:(off[1] + wh) * ph, :]
            r = jax.lax.slice_in_dim(cut, j * ph, (j + 1) * ph, axis=-2)
            return r.reshape(width, cfg.lon)

        def accum(zi, j, d_os, w4a, w4b, aka, akb, ab, width):
            """Shared per-(zi, j) math: transposed interleave, d_rows for
            both branches, weight/bias grad accumulation."""
            L = jax.lax.rem(ls * wh + off[1] + j, lat_tok)
            d_os = jnp.where(L < ht, d_os, jnp.zeros_like(d_os))
            xs_j = xs5[:, zi, j].reshape(wt, c)
            xd_j = xd5[:, zi, j].reshape(wt, c)
            rs = None
            rd = None
            for wo in range(pw):
                dt = jax.lax.dot_general(
                    d_os, sel_ref[wo], (((1,), (1,)), ((), ())),
                    preferred_element_type=f32).astype(d_os.dtype)
                a = jax.lax.dot_general(
                    dt, w4a[wo], (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)
                b_ = jax.lax.dot_general(
                    dt, w4b[wo], (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)
                rs = a if rs is None else rs + a
                rd = b_ if rd is None else rd + b_
                dtw = dt[:, :wt]
                aka[wo, :width] += jax.lax.dot_general(
                    dtw, xs_j, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                akb[wo, :width] += jax.lax.dot_general(
                    dtw, xd_j, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                ab[wo, :width] += jnp.sum(dtw.astype(f32), axis=1)
            scr_sk[zi, j] = rs.astype(scr_sk.dtype)[:wt]
            scr_dc[zi, j] = rd.astype(scr_dc.dtype)[:wt]

        for zi in range(2):
            is_surf = (zs == zs_surf) if zi == zi_surf else False
            if zi == zi_surf:
                @pl.when(zs == zs_surf)
                def _(zi=zi):
                    for j in range(wh):
                        d_os = field_rows(ds, j, rvs)
                        accum(zi, j, d_os, ssk4, sdc4, as_sk, as_dc,
                              ab_s, rvs)

                @pl.when(zs != zs_surf)
                def _(zi=zi):
                    for j in range(wh):
                        d_os = field_rows(du[zi], j, rvo)
                        accum(zi, j, d_os, wsk4, wdc4, ak_sk, ak_dc,
                              ab_u, rvo)
            else:
                for j in range(wh):
                    d_os = field_rows(du[zi], j, rvo)
                    accum(zi, j, d_os, wsk4, wdc4, ak_sk, ak_dc, ab_u, rvo)

        def store(scr, o_ref):
            rows = scr[...].reshape(wz, wh, nlon, ww, c)
            rows = rows.transpose(2, 0, 1, 3, 4).reshape(nlon, n, c)
            o_ref[0, 0, 0] = _lon_unroll(rows, ww, off[2])
        store(scr_sk, o_sk)
        store(scr_dc, o_dc)

    return kernel


def recovery_bwd_pallas(p, skip_wm, dec_wm, dU, dS, off, cfg: ModelConfig,
                        *, interpret: bool = False):
    """Pallas recovery backward: field cotangents (dU (B,5,levels,lat,
    lon), dS (B,4,lat,lon)) + saved rolled-wm storage pair -> (dp,
    d_skip_wm, d_dec_wm).  Equals jax.grad of
    ``L.patch_recovery((canon(skip), canon(dec)))`` — pinned by
    tests/test_ops.py::test_recovery_wm_train_grads_match_xla."""
    geom = cfg.stage(3)
    wz, wh, ww = geom.window
    b, nz, nlat, nlon, n, c = skip_wm.shape
    pz, ph, pw = cfg.patch
    v = cfg.upper_vars
    sv = cfg.surface_vars
    dtype = skip_wm.dtype
    nk = 2 if off[1] else 1
    wt_pad = -(-cfg.w_tokens // 128) * 128
    rvo = v * pz * ph
    rvs = sv * ph
    zplanes = nz * wz

    # surface token plane (canonical z 0) lives at storage
    # (zs_surf, zi_surf): zs*wz + zi + off0 == 0 (mod zplanes)
    zq = (-off[0]) % zplanes
    zs_surf, zi_surf = zq // wz, zq % wz

    lat_pad = nlat * wh * ph
    dUp = jnp.pad(dU.astype(dtype),
                  ((0, 0), (0, 0), (0, cfg.upper_planes * pz - cfg.levels),
                   (0, lat_pad - cfg.lat), (0, 0)))
    dSp = jnp.pad(dS.astype(dtype),
                  ((0, 0), (0, 0), (0, lat_pad - cfg.lat), (0, 0)))

    sel = jnp.asarray(_sel_matrix(cfg.w_tokens, wt_pad, pw, cfg.lon)
                      ).astype(dtype)
    # per-w_off weight slabs (pw, rows, C): feat = (rows, wo), wo fastest
    ku = p["upper"]["kernel"].astype(dtype)       # (2C, 160)
    ks = p["surface"]["kernel"].astype(dtype)     # (2C, 64)
    wsk4 = ku[:c].reshape(c, rvo, pw).transpose(2, 1, 0)
    wdc4 = ku[c:].reshape(c, rvo, pw).transpose(2, 1, 0)
    ssk4 = ks[:c].reshape(c, rvs, pw).transpose(2, 1, 0)
    sdc4 = ks[c:].reshape(c, rvs, pw).transpose(2, 1, 0)

    def du_spec(zi, k):
        def imap(bb, zs, ls):
            zp = (zs * wz + zi + off[0]) % zplanes
            return (bb, 0, jnp.maximum(zp - 1, 0), (ls + k) % nlat, 0)
        return pl.BlockSpec((1, v, pz, wh * ph, cfg.lon), imap,
                            memory_space=pltpu.VMEM)

    def ds_spec(k):
        return pl.BlockSpec((1, sv, wh * ph, cfg.lon),
                            lambda bb, zs, ls: (bb, 0, (ls + k) % nlat, 0),
                            memory_space=pltpu.VMEM)

    blk = pl.BlockSpec((1, 1, 1, nlon, n, c),
                       lambda bb, zs, ls: (bb, zs, ls, 0, 0, 0),
                       memory_space=pltpu.VMEM)

    def fullspec(shape):
        return pl.BlockSpec(shape, lambda bb, zs, ls: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def accspec(shape):
        return pl.BlockSpec(shape, lambda bb, zs, ls: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out_shapes = (
        jax.ShapeDtypeStruct(skip_wm.shape, dtype),          # d_skip
        jax.ShapeDtypeStruct(dec_wm.shape, dtype),           # d_dec
        jax.ShapeDtypeStruct((pw, rvo, c), jnp.float32),     # dk skip upper
        jax.ShapeDtypeStruct((pw, rvo, c), jnp.float32),     # dk dec upper
        jax.ShapeDtypeStruct((pw, rvo, c), jnp.float32),     # dk skip surf
        jax.ShapeDtypeStruct((pw, rvo, c), jnp.float32),     # dk dec surf
        jax.ShapeDtypeStruct((pw, rvo), jnp.float32),        # db upper
        jax.ShapeDtypeStruct((pw, rvo), jnp.float32),        # db surf
    )
    out_specs = (blk, blk, accspec((pw, rvo, c)), accspec((pw, rvo, c)),
                 accspec((pw, rvo, c)), accspec((pw, rvo, c)),
                 accspec((pw, rvo)), accspec((pw, rvo)))

    in_specs = ([du_spec(zi, k) for zi in range(2) for k in range(nk)]
                + [ds_spec(k) for k in range(nk)]
                + [blk, blk, fullspec(wsk4.shape), fullspec(wdc4.shape),
                   fullspec(ssk4.shape), fullspec(sdc4.shape),
                   fullspec(sel.shape)])

    outs = pl.pallas_call(
        _make_bwd_kernel(cfg, geom, off, nk, nlon, zs_surf, zi_surf),
        out_shape=out_shapes,
        grid=(b, nz, nlat),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((wz, wh, cfg.w_tokens, c), dtype),
                        pltpu.VMEM((wz, wh, cfg.w_tokens, c), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nz * nlat * wz * wh * pw
            * (rvo * cfg.lon * wt_pad + 2 * wt_pad * rvo * c
               + 2 * cfg.w_tokens * rvo * c),
            bytes_accessed=int((2 * nk + 2)
                               * (dUp.size + dSp.size) * dtype.itemsize
                               + 4 * skip_wm.size * dtype.itemsize),
            transcendentals=0),
        interpret=interpret,
    )(*([dUp] * (2 * nk) + [dSp] * nk
        + [skip_wm, dec_wm, wsk4, wdc4, ssk4, sdc4, sel]))

    (d_skip, d_dec, ak_sk, ak_dc, as_sk, as_dc, ab_u, ab_s) = outs

    def feat_of(a4, width):
        # (pw, rows, C) -> (C, rows*pw) with feat = rows*pw + wo
        return a4[:, :width].transpose(2, 1, 0).reshape(c, width * pw)

    dku = jnp.concatenate([feat_of(ak_sk, rvo), feat_of(ak_dc, rvo)], axis=0)
    dks = jnp.concatenate([feat_of(as_sk, rvs), feat_of(as_dc, rvs)], axis=0)
    dbu = ab_u.transpose(1, 0).reshape(rvo * pw)
    dbs = ab_s[:, :rvs].transpose(1, 0).reshape(rvs * pw)
    dp = {
        "upper": {"kernel": dku.astype(p["upper"]["kernel"].dtype),
                  "bias": dbu.astype(p["upper"]["bias"].dtype)},
        "surface": {"kernel": dks.astype(p["surface"]["kernel"].dtype),
                    "bias": dbs.astype(p["surface"]["bias"].dtype)},
    }
    return dp, d_skip, d_dec


def _feat_cotangents(dU, dS, cfg: ModelConfig):
    """Field cotangents -> per-token feature-space cotangents.

    The recovery interleave (var, z_off, h_off, w_off) -> (levels, lat,
    lon) is a permutation of non-overlapping patches, so its transpose is
    the inverse reshape/transpose on the zero-padded cotangent — no
    scatter, no conv_transpose."""
    pz, ph, pw = cfg.patch
    v, s = cfg.upper_vars, cfg.surface_vars
    zp, ht, wt = cfg.upper_planes, cfg.h_tokens, cfg.w_tokens
    b = dU.shape[0]
    dUp = jnp.pad(dU, ((0, 0), (0, 0), (0, zp * pz - cfg.levels),
                       (0, ht * ph - cfg.lat), (0, 0)))
    dF_u = dUp.reshape(b, v, zp, pz, ht, ph, wt, pw)
    dF_u = dF_u.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(
        b, zp, ht, wt, v * pz * ph * pw)
    dSp = jnp.pad(dS, ((0, 0), (0, 0), (0, ht * ph - cfg.lat), (0, 0)))
    dF_s = dSp.reshape(b, s, ht, ph, wt, pw)
    dF_s = dF_s.transpose(0, 2, 4, 1, 3, 5).reshape(b, ht, wt, s * ph * pw)
    return dF_u, dF_s


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def recovery_wm_train(p, skip_wm, dec_wm, off, cfg: ModelConfig):
    """Differentiable :func:`recovery_wm`: the Pallas kernels run the
    forward and the backward is direct XLA math — the token cotangents are
    two matmuls against the transposed recovery kernels written straight
    back into the ROLLED window-major storage the training trunk's
    backward consumes (to_window_major ∘ roll(-off) is the exact transpose
    of the kernel's stitch-read), and the weight grads are tall matmuls
    against the recomputed canonical token rows.  Grads match ``jax.grad``
    of ``L.patch_recovery((canon(skip), canon(dec)))`` (pinned by
    tests/test_ops.py)."""
    return recovery_wm(p, skip_wm, dec_wm, off, cfg)


def _recovery_train_fwd(p, skip_wm, dec_wm, off, cfg):
    out = recovery_wm(p, skip_wm, dec_wm, off, cfg)
    return out, (p, skip_wm, dec_wm)


def _recovery_train_bwd(off, cfg, res, cts):
    p, skip_wm, dec_wm = res
    dU, dS = cts
    # anti-hoist: tie the saved-storage reads to the cotangent's arrival,
    # or XLA schedules backward work into the FORWARD and keeps big
    # intermediates alive across the whole step (NOTES.md slow-state HBM
    # cliff; jax.checkpoint plants this barrier automatically)
    (skip_wm, dec_wm), (dU, dS) = jax.lax.optimization_barrier(
        ((skip_wm, dec_wm), (dU, dS)))
    dp, d_skip_wm, d_dec_wm = recovery_bwd_pallas(
        p, skip_wm, dec_wm, dU, dS, off, cfg)
    return dp, d_skip_wm, d_dec_wm


def _recovery_train_bwd_xla(off, cfg, res, cts):
    """The direct-math XLA backward (kept as the reference/fallback for
    recovery_bwd_pallas; tests/test_ops.py pins both against jax.grad)."""
    from pangu_tpu.ops.earth_block_wm import (from_window_major,
                                              to_window_major)

    p, skip_wm, dec_wm = res
    dU, dS = cts
    (skip_wm, dec_wm), (dU, dS) = jax.lax.optimization_barrier(
        ((skip_wm, dec_wm), (dU, dS)))
    geom = cfg.stage(3)
    c = geom.dim
    ht = cfg.h_tokens
    f32 = jnp.float32
    dF_u, dF_s = _feat_cotangents(dU, dS, cfg)

    ku = p["upper"]["kernel"].astype(dF_u.dtype)    # (2C, V*pz*ph*pw)
    ks = p["surface"]["kernel"].astype(dF_s.dtype)  # (2C, S*ph*pw)

    # token cotangents per branch: plane 0 from the surface head, planes
    # 1..ZP from the upper head (models/pangu_model.py:83-85 row split)
    def branch_ct(rows_u, rows_s):
        du = jax.lax.dot_general(
            dF_u.reshape(-1, ku.shape[1]), rows_u,
            (((1,), (1,)), ((), ())),
            preferred_element_type=f32).astype(dF_u.dtype)
        ds = jax.lax.dot_general(
            dF_s.reshape(-1, ks.shape[1]), rows_s,
            (((1,), (1,)), ((), ())),
            preferred_element_type=f32).astype(dF_s.dtype)
        b = dF_u.shape[0]
        dcanon = jnp.concatenate(
            [ds.reshape(b, 1, ht, cfg.w_tokens, c),
             du.reshape(b, cfg.upper_planes, ht, cfg.w_tokens, c)], axis=1)
        # transpose of crop∘roll(+off)∘from_wm: zero-pad, roll(-off), to_wm
        dcanon = jnp.pad(dcanon, ((0, 0), (0, 0), (0, geom.h_padded - ht),
                                  (0, 0), (0, 0)))
        return to_window_major(
            jnp.roll(dcanon, tuple(-o for o in off), axis=(1, 2, 3)),
            geom.window)

    d_skip_wm = branch_ct(ku[:c], ks[:c]).astype(skip_wm.dtype)
    d_dec_wm = branch_ct(ku[c:], ks[c:]).astype(dec_wm.dtype)

    # weight grads against the recomputed canonical token rows
    def canon(t):
        t = from_window_major(t, geom.window)
        return jnp.roll(t, off, axis=(1, 2, 3))[:, :, :ht]

    cs, cd = canon(skip_wm), canon(dec_wm)

    def head_grads(feat_ct, plane):
        parts = []
        for t in (cs, cd):
            x = t[:, 1:] if plane == "upper" else t[:, 0]
            parts.append(jax.lax.dot_general(
                x.reshape(-1, c), feat_ct.reshape(-1, feat_ct.shape[-1]),
                (((0,), (0,)), ((), ())), preferred_element_type=f32))
        dk = jnp.concatenate(parts, axis=0)
        db = jnp.sum(feat_ct.astype(f32),
                     axis=tuple(range(feat_ct.ndim - 1)))
        return dk, db

    dku, dbu = head_grads(dF_u, "upper")
    dks, dbs = head_grads(dF_s, "surface")
    dp = {
        "upper": {"kernel": dku.astype(p["upper"]["kernel"].dtype),
                  "bias": dbu.astype(p["upper"]["bias"].dtype)},
        "surface": {"kernel": dks.astype(p["surface"]["kernel"].dtype),
                    "bias": dbs.astype(p["surface"]["bias"].dtype)},
    }
    return dp, d_skip_wm, d_dec_wm


recovery_wm_train.defvjp(_recovery_train_fwd, _recovery_train_bwd)
