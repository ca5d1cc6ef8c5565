"""Window-major token-space transition: the composed recovery->embed
affine (engine/transition.py) applied directly on the ROLLED window-major
storage the decoder stages produce.

With the wm stage chains + wm down/up kernels, the skip and decoder
feature grids never exist in canonical layout; this kernel finishes the
job for the autoregressive rollout loop:

  * skip (stage-0 output) and dec (stage-3 output) are read via the same
    4-chunk modular stitch the block kernels use — the two stage-end
    roll-backs and both exit relayouts vanish;
  * the token-type selection (surface / body / top-z plane x interior /
    last-lat row — engine/transition.py docstring) happens per PROGRAM:
    all programs run the interior matrix, only the z-edge window programs
    re-run their 72-row half with the surface/top matrix, and only the
    lat-edge window program applies the last-lat correction rows
    (pl.when, so the extra matmuls cost ~1/4 + 1/4 + 1/nlat of one pass
    instead of 6x everywhere);
  * the per-token ``bias_field`` is precomputed once per rollout in
    window-major layout and added in-kernel;
  * the output IS the next step's stage-0 wm entry storage (canonical
    coordinates) — the next entry block reads it with zero relayout.

Reference semantics: the recovery->denorm->renorm->embed round trip of
/root/reference/inference/inference_singleOutput.py:92-105 composed as in
engine/transition.py (tested equal in tests/test_transition.py); this
kernel is tested against apply_transition in tests/test_transition.py.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pangu_tpu.config import ModelConfig
from pangu_tpu.engine.transition import build_transition
from pangu_tpu.ops.earth_block_wm import to_window_major


def build_transition_wm(params, constants, cfg: ModelConfig,
                        embed_params=None) -> Dict:
    """build_transition + the bias_field pre-laid-out in window-major
    storage (computed once per rollout trace).  ``embed_params``: the
    next model in a hierarchy chain (engine/transition.py)."""
    tp = build_transition(params, constants, cfg, embed_params=embed_params)
    geom = cfg.stage(0)
    bf = tp["bias_field"]                         # (Z, HT, WT, C)
    bf = jnp.pad(bf[None], ((0, 0), (0, 0),
                            (0, geom.h_padded - bf.shape[1]),
                            (0, 0), (0, 0)))
    tp = dict(tp)
    tp["bias_field_wm"] = to_window_major(bf, geom.window)
    return tp


def _make_transition_wm_kernel(window, nz: int, nlat: int, nlon: int,
                               c: int, h_real: int,
                               off: Tuple[int, int, int],
                               z_scalar: bool = False,
                               nz_global: int = None):
    """``z_scalar=True``: the kernel takes one extra SMEM scalar input
    ``z0`` (the shard's first z-window index under tp z-sharding) and the
    surface/top-plane token-type selection tests the GLOBAL z window
    ``z0 + zz`` against ``nz_global``.  ``z_scalar=False`` generates
    source-identical code to the single-device kernel (same program, same
    compile-cache key)."""
    wz, wh, ww = window
    n = wz * wh * ww
    half = n // 2
    hh_edge, loc_edge = (h_real - 1) // wh, (h_real - 1) % wh
    dwo = -off[2]
    stitch = off[0] != 0 or off[1] != 0
    n_chunks = 4 if stitch else 1
    nzg = nz if nz_global is None else nz_global

    def assemble(xs):
        if stitch:
            cut = (wh - off[1]) % wh * ww
            r72 = jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0)

            def lat_mix(top, bot):
                # canonical r reads storage r - off[1]: rows cut.. come
                # from the PREVIOUS window's tail (chunk pair order below)
                return jnp.where(r72 < cut,
                                 jnp.roll(top[0, 0, 0], -cut, axis=1),
                                 jnp.roll(bot[0, 0, 0], cut, axis=1))

            x = jnp.concatenate([lat_mix(xs[0], xs[1]),
                                 lat_mix(xs[2], xs[3])], axis=1)
        else:
            x = xs[0][0, 0, 0]
        if dwo:
            w_in_run = jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0), ww)
            if dwo > 0:
                xn = jnp.roll(x, -1, axis=0)
                x = jnp.where(w_in_run < ww - dwo,
                              jnp.roll(x, -dwo, axis=1),
                              jnp.roll(xn, ww - dwo, axis=1))
            else:
                xp = jnp.roll(x, 1, axis=0)
                x = jnp.where(w_in_run >= -dwo,
                              jnp.roll(x, -dwo, axis=1),
                              jnp.roll(xp, -(ww + dwo), axis=1))
        return x

    def kernel(*refs):
        skips = refs[:n_chunks]
        decs = refs[n_chunks:2 * n_chunks]
        (bias_ref, ms_ref, msh_ref, mu_ref, muh_ref, muz_ref,
         muzh_ref) = refs[2 * n_chunks:2 * n_chunks + 7]
        n_in = 2 * n_chunks + 7 + (1 if z_scalar else 0)
        o_ref = refs[n_in]
        y_s = refs[n_in + 1]                      # (2, nlon, half, c)

        s = assemble(skips)                       # (nlon, n, c), canonical
        d = assemble(decs)
        dt = s.dtype
        zz = pl.program_id(1)
        if z_scalar:
            zz = zz + refs[2 * n_chunks + 7][0]
        hh = pl.program_id(2)

        def app(rz, m_ref):
            m = m_ref[...].astype(dt)
            sf = s[:, rz * half:(rz + 1) * half].reshape(nlon * half, c)
            df = d[:, rz * half:(rz + 1) * half].reshape(nlon * half, c)
            y = jax.lax.dot_general(sf, m[:c], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            y = y + jax.lax.dot_general(df, m[c:],
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            return y.astype(dt).reshape(nlon, half, c)

        for rz in range(2):
            y_s[rz] = app(rz, mu_ref)             # interior planes

        @pl.when(zz == 0)
        def _():
            y_s[0] = app(0, ms_ref)               # surface plane rows

        @pl.when(zz == nzg - 1)
        def _():
            y_s[1] = app(1, muz_ref)              # top-z plane rows

        @pl.when(hh == hh_edge)
        def _():
            latmask = (jax.lax.broadcasted_iota(
                jnp.int32, (half, 1), 0) // ww % wh) == loc_edge
            for rz in range(2):
                mh = muh_ref[...]
                m0 = mu_ref[...]
                if rz == 0:
                    mh = jnp.where(zz == 0, msh_ref[...], mh)
                    m0 = jnp.where(zz == 0, ms_ref[...], m0)
                else:
                    mh = jnp.where(zz == nzg - 1, muzh_ref[...], mh)
                    m0 = jnp.where(zz == nzg - 1, muz_ref[...], m0)
                # recompute the edge rows with the last-lat matrix: the
                # correction (M_h - M) applies only where latmask
                dm_ref = mh - m0
                m = dm_ref.astype(dt)
                sf = s[:, rz * half:(rz + 1) * half].reshape(nlon * half, c)
                df = d[:, rz * half:(rz + 1) * half].reshape(nlon * half, c)
                corr = jax.lax.dot_general(
                    sf, m[:c], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                corr = corr + jax.lax.dot_general(
                    df, m[c:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                corr = corr.astype(dt).reshape(nlon, half, c)
                y_s[rz] = jnp.where(latmask[None], y_s[rz] + corr, y_s[rz])

        y = y_s[...].transpose(1, 0, 2, 3).reshape(nlon, n, c)
        o_ref[0, 0, 0] = y + bias_ref[0, 0, 0].astype(dt)

    return kernel


def apply_transition_wm(tp: Dict, skip, dec, geom,
                        off: Tuple[int, int, int], *,
                        z_base=None, nz_global: int = None):
    """skip/dec: (B, nz, nlat, nlon, N, C) rolled wm storage (offset
    ``off``); returns the next step's stage-0 wm entry storage in
    canonical coordinates (pad-row content is junk — the entry block
    zero-synthesises it away).

    Under tp z-window sharding, skip/dec/bias_field_wm are the LOCAL z
    shard: pass ``z_base`` (traced scalar — this shard's first global z
    window, ``axis_index(tp) * nz_local``) and the static ``nz_global``
    so the surface/top-plane token-type rows land on the right shard;
    ``off[0]`` must be 0 (the trunk's z halos resolve it in storage)."""
    b, nz, nlat, nlon, n, c = skip.shape
    wz, wh, ww = geom.window
    z_scalar = z_base is not None
    if z_scalar:
        assert off[0] == 0, "z offset must be storage-resolved under tp"
    stitch = off[0] != 0 or off[1] != 0

    if stitch:
        def mk(rz, rh):
            def imap(bb, zz, hh, rz=rz, rh=rh):
                return (bb,
                        ((wz * zz + rz - off[0]) // wz) % nz,
                        ((wh * hh - off[1]) // wh + rh) % nlat,
                        0, (rz - off[0]) % wz, 0)
            return pl.BlockSpec((1, 1, 1, nlon, n // 2, c), imap,
                                memory_space=pltpu.VMEM)

        x_specs = [mk(rz, rh) for rz in range(2) for rh in range(2)]
        n_chunks = 4
    else:
        x_specs = [pl.BlockSpec((1, 1, 1, nlon, n, c),
                                lambda bb, zz, hh: (bb, zz, hh, 0, 0, 0),
                                memory_space=pltpu.VMEM)]
        n_chunks = 1

    def fullspec(shape):
        return pl.BlockSpec(shape, lambda bb, zz, hh: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    bias_spec = pl.BlockSpec((1, 1, 1, nlon, n, c),
                             lambda bb, zz, hh: (0, zz, hh, 0, 0, 0),
                             memory_space=pltpu.VMEM)

    mats = [tp["M_s"], tp["M_sh"], tp["M_u"], tp["M_uh"], tp["M_uz"],
            tp["M_uzh"]]
    operands = ([skip] * n_chunks + [dec] * n_chunks
                + [tp["bias_field_wm"]] + mats)
    in_specs = (x_specs + x_specs + [bias_spec]
                + [fullspec(m.shape) for m in mats])
    if z_scalar:
        operands = operands + [jnp.reshape(z_base, (1,)).astype(jnp.int32)]
        in_specs = in_specs + [pl.BlockSpec(memory_space=pltpu.SMEM)]

    out_spec = pl.BlockSpec((1, 1, 1, nlon, n, c),
                            lambda bb, zz, hh: (bb, zz, hh, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _make_transition_wm_kernel(geom.window, nz, nlat, nlon, c,
                                   geom.h, off, z_scalar=z_scalar,
                                   nz_global=nz_global),
        out_shape=jax.ShapeDtypeStruct(skip.shape, skip.dtype),
        grid=(b, nz, nlat),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((2, nlon, n // 2, c), skip.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nz * nlat * nlon * n * 2 * c * c,
            bytes_accessed=int(3.5 * skip.size * skip.dtype.itemsize),
            transcendentals=0),
    )(*operands)
