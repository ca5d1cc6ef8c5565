"""Window-major whole-block kernels: the inter-block activation tensor is
stored as (B, nz, nlat, nlon, N, C) — one row per window token, windows
contiguous — instead of the canonical token grid (B, Z, Hp, W, C).

Why: the v2 whole-block kernels (ops/earth_block_fused.py) already fold
pad/roll/crop into index maps, but every program still performs the
(wz, wh, W, C) <-> (nlon, N, C) relayout on entry AND exit — a sublane
gather over the full activation, measured as the dominant per-block
overhead (~40 ms of the 119 ms block total per forward, NOTES.md).  In
window-major storage:

  * UNSHIFTED blocks read their (nlon, N, C) attention rows directly —
    zero relayout in or out.  The qkv/proj/MLP matmuls all run on the
    flat (nlon*N, C) view, which is a free reshape.
  * SHIFTED blocks assemble their windows from FOUR 72-row z-half chunks
    of neighbouring (zz, hh) window blocks via BlockSpec index maps
    (window row layout is (z, lat, lon)-major, so the dz=+-1 z shift
    moves whole n/2 chunks — and 72 satisfies Mosaic's 8-sublane block
    divisibility, which the finer 36-row lat chunks would not).  The
    lat and lon half-shifts interleave rows WITHIN those chunks, but in
    window-major coords each reduces to two static sublane rolls and a
    select (no gather):

        lat:  zhalf = where(row < dh*ww, roll(chunk_hh,  -dh*ww, rows),
                                         roll(chunk_hh1, +dh*ww, rows))
        lon:  out   = where(w' < ww-dw,  roll(x, -dw, rows),
                                         roll(roll(x,-1,lon), ww-dw, rows))

    with the lon-neighbour reached by a cheap leading-dim rotate.

Same coordinate-offset trick as v2: shifted blocks WRITE in their own
rolled window coordinates and the next block's reads fold in the inverse
shift, so per-block data movement never exceeds one read + one write.

Reference semantics pinned: pad/roll/window-partition/mask order of
EarthSpecificBlock (/root/reference/models/layers.py:183-253); zero
latitude-pad rows are synthesised from a row-index iota before the qkv
projection (reference re-pads zeros each block, layers.py:192).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pangu_tpu.ops.block_tail import tail_math
from pangu_tpu.ops.earth_block_fused import _lon_chunk


# ---------------------------------------------------------------------------
# Layout converters (stage boundaries only)
# ---------------------------------------------------------------------------

def to_window_major(x, window):
    """(B, Z, Hp, W, C) -> (B, nz, nlat, nlon, N, C), N ordered (z, h, w)."""
    wz, wh, ww = window
    b, z, hp, w, c = x.shape
    nz, nlat, nlon = z // wz, hp // wh, w // ww
    x = x.reshape(b, nz, wz, nlat, wh, nlon, ww, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, nz, nlat, nlon, wz * wh * ww, c)


def from_window_major(xs, window):
    """(B, nz, nlat, nlon, N, C) -> (B, Z, Hp, W, C)."""
    wz, wh, ww = window
    b, nz, nlat, nlon, n, c = xs.shape
    xs = xs.reshape(b, nz, nlat, nlon, wz, wh, ww, c)
    xs = xs.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return xs.reshape(b, nz * wz, nlat * wh, nlon * ww, c)


# ---------------------------------------------------------------------------
# The whole-block kernel, window-major edition
# ---------------------------------------------------------------------------

def _make_wm_kernel(heads: int, hd: int, window, nlon: int, c: int,
                    h_real: int, hp: int, dw: int, canon_add: int,
                    stitch: bool, has_mask: bool, fast_math: bool,
                    has_drop: bool, chunk_target: Optional[int],
                    in_layout: str = "wm", out_layout: str = "wm"):
    """in_layout/out_layout: "wm" (window-major storage rows) or "canon"
    (token-grid (wz, wh, W, C) rows, v2 layout) — the stage's FIRST block
    reads canonical and its LAST writes canonical, so the (wz,wh,W,C) <->
    (nlon,N,C) relayout happens once per stage END-POINT inside the
    kernels, never as an HBM round-trip converter."""
    wz, wh, ww = window
    n = wz * wh * ww
    scale = hd ** -0.5
    chunk = _lon_chunk(nlon, chunk_target)
    n_x_refs = (4 if stitch else 1) if in_layout == "wm" else 1

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

        # ---- assemble (nlon, N, C), window coords for z/lat ------------
        if in_layout == "canon":
            # stage entry: canonical (wz, wh, W, C) rows, unshifted
            # (delta == 0 — first block of a stage is never rolled), so
            # the only work is the one in-VMEM window relayout the v2
            # kernels pay on BOTH ends of every block
            xc = xs[0][0]                               # (wz, wh, W, c)
            if h_real < hp:
                hh = pl.program_id(2)
                lat_iota = jax.lax.broadcasted_iota(
                    jnp.int32, (wz, wh, 1, 1), 1)
                canon = jax.lax.rem(wh * hh + lat_iota + canon_add, hp)
                xc = jnp.where(canon < h_real, xc, jnp.zeros_like(xc))
            x = xc.reshape(wz, wh, nlon, ww, c).transpose(2, 0, 1, 3, 4)
            x = x.reshape(nlon, n, c)
        elif stitch:
            # 4 z-half chunks (nlon, N/2, C): [a, b] for window z-row 0
            # from lat-windows (ha, ha+1), [c, d] for z-row 1.  The lat
            # half-shift interleaves dh*ww-row runs: two sublane rolls +
            # select per z-half.
            cut = (wh // 2) * ww
            half = n // 2
            r72 = jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0)

            def lat_mix(top, bot):
                return jnp.where(r72 < cut,
                                 jnp.roll(top[0, 0, 0], -cut, axis=1),
                                 jnp.roll(bot[0, 0, 0], cut, axis=1))

            x = jnp.concatenate([lat_mix(xs[0], xs[1]),
                                 lat_mix(xs[2], xs[3])], axis=1)
        else:
            x = xs[0][0, 0, 0]

        # ---- longitude half-shift: window lon w' reads storage lon
        # (w' + dw); runs of ww-|dw| stay in lon window l, the rest spill
        # to the neighbour — two sublane rolls + select, no gather -------
        if dw:
            w_in_run = jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0), ww)
            if dw > 0:
                xn = jnp.roll(x, -1, axis=0)         # lon window l+1
                x = jnp.where(w_in_run < ww - dw,
                              jnp.roll(x, -dw, axis=1),
                              jnp.roll(xn, ww - dw, axis=1))
            else:
                xp = jnp.roll(x, 1, axis=0)          # lon window l-1
                x = jnp.where(w_in_run >= -dw,
                              jnp.roll(x, -dw, axis=1),
                              jnp.roll(xp, -(ww + dw), axis=1))

        # ---- zero-synthesise latitude pad rows (layers.py:192) ---------
        if h_real < hp and in_layout == "wm":
            hh = pl.program_id(2)
            row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
            lat_loc = jax.lax.rem(jax.lax.div(row, ww), wh)
            canon = jax.lax.rem(wh * hh + lat_loc + canon_add, hp)
            x = jnp.where(canon[None] < h_real, x, jnp.zeros_like(x))

        xf = x.reshape(nlon * n, c)
        dt = x.dtype

        # ---- ONE wide qkv projection (full MXU lanes) ------------------
        qkv = jax.lax.dot_general(
            xf, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qkv = qkv + bqkv_ref[...][None].astype(jnp.float32)
        qkv_s[...] = qkv.astype(dt).reshape(nlon, n, 3 * c)

        bias = b_ref[0].astype(jnp.float32)          # (heads, n, n)
        if ids_ref is not None:
            r = ids_ref[...][0]                      # (1, n) int32
            bias = bias + jnp.where(r[0][None, :] != r[0][:, None],
                                    jnp.float32(-100.0), jnp.float32(0.0))

        # ---- attention: per-head lane-offset slices of the qkv scratch,
        # a few lon windows per dot_general batch dim --------------------
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

        jax.lax.fori_loop(0, nlon // chunk, body, 0, unroll=False)

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

        if out_layout == "canon":
            # stage exit: one in-VMEM relayout back to token-grid rows,
            # written in this block's own (rolled) window coordinates —
            # the caller's single stage-end roll restores canonical
            y = y.reshape(nlon, wz, wh, ww, c).transpose(1, 2, 0, 3, 4)
            o_ref[0] = y.reshape(wz, wh, nlon * ww, c).astype(o_ref.dtype)
        else:
            o_ref[0, 0, 0] = y.reshape(nlon, n, c).astype(o_ref.dtype)

    return kernel


def _block_wm_call(p, xs, geom, delta: Tuple[int, int, int],
                   canon_add: int, mask: Optional[jax.Array],
                   fast_math: bool, drop: Optional[jax.Array] = None,
                   chunk_target: Optional[int] = None,
                   in_layout: str = "wm", out_layout: str = "wm"):
    """One whole block on window-major storage (B, nz, nlat, nlon, N, C).

    ``delta``: (dz, dh, dw) shift from storage coords to this block's
    window coords (window token (r_z, r_h, r_w) of window (zz, hh, l)
    reads storage token (wz*zz + r_z + dz, wh*hh + r_h + dh,
    ww*l + r_w + dw), modular).  dz in {-1, 0, 1}, dh in {-wh/2, 0, wh/2}.

    ``in_layout``/``out_layout``: "wm" or "canon" — stage end-point blocks
    read/write the canonical (B, Z, Hp, W, C) token grid directly and do
    the window relayout in VMEM (see _make_wm_kernel).
    """
    wz, wh, ww = geom.window
    heads = geom.heads
    if in_layout == "canon":
        b, z, hp, w, c = xs.shape
        nz, nlat, nlon = z // wz, hp // wh, w // ww
        n = wz * wh * ww
        assert delta == (0, 0, 0), "canonical entry blocks are unshifted"
    else:
        b, nz, nlat, nlon, n, c = xs.shape
        hp = nlat * wh
    hd = c // heads
    dz, dh, dw = delta
    stitch = (dz != 0 or dh != 0) and in_layout == "wm"
    assert n == wz * wh * ww

    if in_layout == "canon":
        x_specs = [pl.BlockSpec((1, wz, wh, nlon * ww, c),
                                lambda bb, zz, hh: (bb, zz, hh, 0, 0),
                                memory_space=pltpu.VMEM)]
    elif stitch:
        # four (nlon, N/2, C) z-half chunks: window z-row rz reads source
        # z-window ((wz*zz + rz + dz) // wz) % nz, local z-half
        # (rz+dz) % wz (= 1-rz for dz=+-1; = rz when the z component was
        # resolved at the storage level, e.g. the tp-sharded trunk's
        # _z_shift_wm); its lat rows come from lat-windows
        # ha = ((wh*hh + dh) // wh) % nlat (supplies local rows dh..wh-1)
        # and ha+1 (local 0..dh-1) — mixed in-kernel (lat_mix).  The
        # modular index maps ARE torch.roll's wrap-around.
        csz = n // 2

        def mk_x_spec(rz, rh):
            return pl.BlockSpec(
                (1, 1, 1, nlon, csz, c),
                lambda bb, zz, hh, rz=rz, rh=rh: (
                    bb,
                    ((wz * zz + rz + dz) // wz) % nz,
                    ((wh * hh + dh) // wh + rh) % nlat,
                    0, (rz + dz) % wz, 0),
                memory_space=pltpu.VMEM)

        x_specs = [mk_x_spec(rz, rh) for rz in range(2) for rh in range(2)]
    else:
        x_specs = [pl.BlockSpec((1, 1, 1, nlon, n, c),
                                lambda bb, zz, hh: (bb, zz, hh, 0, 0, 0),
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

    operands = [xs] * (4 if stitch else 1) + [wqkv, bqkv, wp, bp, bias]
    in_specs = x_specs + [fullspec(wqkv.shape), fullspec(bqkv.shape),
                          fullspec(wp.shape), fullspec(bp.shape), spec_b]
    if mask is not None:
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

    if out_layout == "canon":
        out_spec = pl.BlockSpec((1, wz, wh, nlon * ww, c),
                                lambda bb, zz, hh: (bb, zz, hh, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = (b, nz * wz, nlat * wh, nlon * ww, c)
    else:
        out_spec = pl.BlockSpec((1, 1, 1, nlon, n, c),
                                lambda bb, zz, hh: (bb, zz, hh, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = (b, nz, nlat, nlon, n, c)

    scratch = [pltpu.VMEM((nlon, n, 3 * c), dt),
               pltpu.VMEM((nlon, n, c), dt)]

    return pl.pallas_call(
        _make_wm_kernel(heads, hd, geom.window, nlon, c, geom.h, hp, dw,
                        canon_add, stitch, mask is not None, fast_math,
                        drop is not None, chunk_target,
                        in_layout=in_layout, out_layout=out_layout),
        out_shape=jax.ShapeDtypeStruct(out_shape, dt),
        grid=(b, nz, nlat),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nz * nlat * nlon * n * c * (4 * c + 2 * n + 8 * c),
            bytes_accessed=2 * xs.size * dt.itemsize
            + bias.size * bias.dtype.itemsize,
            transcendentals=b * nz * nlat * nlon * heads * n * n),
    )(*operands)


def _lon_shift_wm(xs, dw: int, ww: int, sp_axis: Optional[str],
                  sp_size: int):
    """Global longitude shift on WINDOW-MAJOR storage: canonical window
    token w' reads storage token w' + dw (the wm form of
    ``jnp.roll(canonical, -dw, axis=W)``, reference torch.roll on W,
    /root/reference/models/layers.py:199-201).

    Row-space realisation (same math the wm kernels use in-program,
    ops/earth_block_wm.py::_make_wm_kernel): rows whose in-window lon
    w_loc < ww-dw shift within their window; the rest spill to the lon
    NEIGHBOUR window — which under a longitude-sharded mesh lives on the
    next chip, so the neighbour rotate becomes a one-window-column
    ``lax.ppermute`` halo exchange over ICI instead of the in-kernel
    rotate (which would wrap at shard boundaries)."""
    if dw == 0:
        return xs
    n = xs.shape[4]
    w_in_run = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0), ww)[None, None, None]
    sharded = sp_axis is not None and sp_size > 1

    def lon_rotate(x, step: int):
        # storage window l reads window l+step (step in {-1, +1})
        if not sharded:
            return jnp.roll(x, -step, axis=3)
        if step > 0:
            halo = jax.lax.ppermute(
                x[:, :, :, :1], sp_axis,
                [((i + 1) % sp_size, i) for i in range(sp_size)])
            return jnp.concatenate([x[:, :, :, 1:], halo], axis=3)
        halo = jax.lax.ppermute(
            x[:, :, :, -1:], sp_axis,
            [((i - 1) % sp_size, i) for i in range(sp_size)])
        return jnp.concatenate([halo, x[:, :, :, :-1]], axis=3)

    if dw > 0:
        xn = lon_rotate(xs, 1)
        return jnp.where(w_in_run < ww - dw,
                         jnp.roll(xs, -dw, axis=4),
                         jnp.roll(xn, ww - dw, axis=4))
    xp = lon_rotate(xs, -1)
    return jnp.where(w_in_run >= -dw,
                     jnp.roll(xs, -dw, axis=4),
                     jnp.roll(xp, -(ww + dw), axis=4))


def _z_shift_wm(xs, dz: int, wz: int, tp_axis: Optional[str],
                tp_size: int):
    """Global Z shift on window-major storage: canonical window z-row rz
    reads storage z token (wz*zz + rz + dz) — the wm form of
    ``jnp.roll(canonical, -dz, axis=Z)`` (reference torch.roll on Z,
    /root/reference/models/layers.py:199-201, wrap masked by gen_mask).

    N is (z, lat, lon)-major, so the two z-halves of every window move as
    whole N/2 chunks: for dz=+1 the new first half is the window's own
    second half and the new second half is the NEXT z-window's first half
    — which under a z-window-sharded mesh (the tp axis of the wm trunk)
    lives on the next chip, so the neighbour rotate becomes a
    one-z-row ``lax.ppermute`` halo over ICI.  Resolving dz here lets the
    whole-block kernels keep a shard-local (dz=0) stitch, exactly like
    ``_lon_shift_wm`` does for the longitude component under sp."""
    if dz == 0:
        return xs
    assert wz == 2 and dz in (-1, 1), (wz, dz)
    half = xs.shape[4] // 2
    lo, hi = xs[:, :, :, :, :half], xs[:, :, :, :, half:]
    sharded = tp_axis is not None and tp_size > 1

    def z_rotate(x, step: int):
        # storage z-window zz reads window zz+step (step in {-1, +1})
        if not sharded:
            return jnp.roll(x, -step, axis=1)
        if step > 0:
            halo = jax.lax.ppermute(
                x[:, :1], tp_axis,
                [((i + 1) % tp_size, i) for i in range(tp_size)])
            return jnp.concatenate([x[:, 1:], halo], axis=1)
        halo = jax.lax.ppermute(
            x[:, -1:], tp_axis,
            [((i - 1) % tp_size, i) for i in range(tp_size)])
        return jnp.concatenate([halo, x[:, :-1]], axis=1)

    if dz > 0:
        return jnp.concatenate([hi, z_rotate(lo, 1)], axis=4)
    return jnp.concatenate([z_rotate(hi, -1), lo], axis=4)


def _pick_gh(nlat: int, target: int) -> int:
    """Largest divisor of nlat <= target (lat windows per program)."""
    for g in range(min(nlat, max(1, target)), 0, -1):
        if nlat % g == 0:
            return g
    return 1


def run_stage_wm(stage_params, x, geom, *, fast_math: bool = False,
                 chunk_target: Optional[int] = None,
                 io_layout: str = "canon", lat_group: int = 1,
                 sp_axis: Optional[str] = None, sp_size: int = 1,
                 tp_axis: Optional[str] = None, tp_size: int = 1):
    """Run one EarthSpecificLayer in window-major whole-block kernels.

    ``io_layout="canon"`` (default): x is canonical (B, Z, H, W, C) and
    the same comes back.  The stage's first block reads the canonical
    grid and writes window-major; interior blocks are pure window-major
    (zero relayout); the last block reads window-major and writes the
    canonical grid in its own rolled window coordinates, fixed by ONE
    stage-end roll + crop — so the (wz,wh,W,C) <-> (nlon,N,C) relayout
    runs exactly twice per stage, in VMEM, never as an HBM round trip.

    ``io_layout="wm"``: x is window-major entry storage in canonical
    coordinates (as written by ops/updown_wm or engine/transition_wm);
    returns the ROLLED window-major storage plus the final coordinate
    offset as ``(xs, off)`` — no canonicalisation at all (the consumer
    folds ``off`` into its own stitch reads).

    Under ``shard_map`` with longitude sharded over mesh axis ``sp_axis``
    (``sp_size`` shards), x is the LOCAL shard: the lon component of each
    half-window shift runs as a storage-level ``_lon_shift_wm`` (a
    one-window-column ppermute halo + two sublane rolls) BEFORE the
    kernel, and the z/lat components stay in the kernels' stitch index
    maps. The returned ``off`` then always has lon component 0, so wm
    consumers (ops/updown_wm, engine/transition_wm) never need a
    cross-shard lon read.

    Under ``shard_map`` with Z WINDOWS sharded over mesh axis ``tp_axis``
    (``tp_size`` shards — the tensor-parallel axis: the earth-specific
    bias tables, ~87% of all parameters, are type-major in z and shard
    with the z windows), x is additionally the local z shard: the z
    component of each half-window shift runs as a storage-level
    ``_z_shift_wm`` (a one-z-row ppermute halo + N-half swap) and the
    kernels keep only the lat stitch.  The returned ``off`` then has z
    component 0 as well."""
    wz, wh, ww = geom.window
    hp = geom.h_padded
    wm_io = io_layout == "wm"
    if wm_io:
        xs = x
    else:
        B, Z, H, W, C = x.shape
        xs = jnp.pad(x, ((0, 0), (0, 0), (0, hp - H), (0, 0), (0, 0)))
    half = (wz // 2, wh // 2, ww // 2)
    off = (0, 0, 0)
    mask = None
    blocks = stage_params["blocks"]
    nb = len(blocks)
    sharded = sp_axis is not None and sp_size > 1
    z_sharded = tp_axis is not None and tp_size > 1

    gh = _pick_gh(hp // wh, lat_group)
    for j, bp in enumerate(blocks):
        shifted = (j % 2 == 1)
        target = half if shifted else (0, 0, 0)
        delta = tuple(t - o for t, o in zip(target, off))
        if shifted and mask is None:
            from pangu_tpu.models.layers import window_region_ids
            # region ids are defined on the GLOBAL grid (geom.z) — under
            # z sharding each shard slices its own window-type rows
            mask = jnp.asarray(window_region_ids(geom.z, hp, geom.window))
            if z_sharded:
                ntype_loc = mask.shape[0] // tp_size
                mask = jax.lax.dynamic_slice_in_dim(
                    mask, jax.lax.axis_index(tp_axis) * ntype_loc,
                    ntype_loc, 0)
        in_l = "wm" if (wm_io or j > 0) else "canon"
        out_l = "wm" if (wm_io or j < nb - 1) else "canon"
        if sharded and delta[2] and in_l == "wm":
            # resolve the lon component at the storage level (ppermute
            # halo); the kernel keeps only the z/lat stitch
            xs = _lon_shift_wm(xs, delta[2], ww, sp_axis, sp_size)
            delta = (delta[0], delta[1], 0)
            off = (off[0], off[1], target[2])
        if z_sharded and delta[0] and in_l == "wm":
            # resolve the z component at the storage level likewise; the
            # kernel keeps only the lat stitch
            xs = _z_shift_wm(xs, delta[0], wz, tp_axis, tp_size)
            delta = (0, delta[1], delta[2])
            off = (target[0], off[1], off[2])
        if in_l == "wm" and out_l == "wm" and gh > 1:
            # interior blocks: gh lat-windows per program (wider matmuls,
            # amortised weight/bias-table streams)
            xs = _block_wm_group_call(bp, xs, geom, delta, target[1],
                                      mask if shifted else None,
                                      fast_math, gh,
                                      chunk_target=chunk_target)
        else:
            xs = _block_wm_call(bp, xs, geom, delta, canon_add=target[1],
                                mask=mask if shifted else None,
                                fast_math=fast_math,
                                chunk_target=chunk_target,
                                in_layout=in_l, out_layout=out_l)
        off = target

    if wm_io:
        if sharded and off[2]:
            # hand consumers a lon-canonical shard: they stitch only z/lat
            xs = _lon_shift_wm(xs, -off[2], ww, sp_axis, sp_size)
            off = (off[0], off[1], 0)
        if z_sharded and off[0]:
            # hand consumers a z-canonical shard: they stitch only lat
            xs = _z_shift_wm(xs, -off[0], wz, tp_axis, tp_size)
            off = (0, off[1], off[2])
        return xs, off
    if off != (0, 0, 0):
        if sharded:
            from pangu_tpu.ops.earth_block_fused import _lon_shift
            xs = jnp.roll(xs, off[:2], axis=(1, 2))
            xs = _lon_shift(xs, -off[2], sp_axis, sp_size)
        else:
            xs = jnp.roll(xs, off, axis=(1, 2, 3))
    return xs[:, :, :H]


def run_stage_wm_sharded(stage_params, x, geom, mesh, *,
                         fast_math: bool = False,
                         chunk_target: Optional[int] = None,
                         lat_group: int = 1):
    """Window-major stage chain on a >1-device mesh: the same wm kernels
    per (dp, sp) shard via shard_map — batch over dp, longitude windows
    over sp (windowed attention is W-local).  The only cross-shard
    communication is the one-window-column ppermute halo of each shifted
    block's longitude roll (``_lon_shift_wm``), riding ICI.  Canonical
    (B, Z, H, W, C) in and out."""
    from jax.sharding import PartitionSpec as P

    sp = int(dict(mesh.shape).get("sp", 1))
    spec_x = P("dp", None, None, "sp", None)

    def inner(params, xx):
        return run_stage_wm(params, xx, geom, fast_math=fast_math,
                            chunk_target=chunk_target, io_layout="canon",
                            lat_group=lat_group, sp_axis="sp", sp_size=sp)

    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation, which the vma checker insists on
    return jax.shard_map(inner, mesh=mesh, in_specs=(P(), spec_x),
                         out_specs=spec_x, check_vma=False)(stage_params, x)


# ---------------------------------------------------------------------------
# Lat-grouped interior kernels: gh lat-windows per program.
#
# In a wm-io chain every block reads and writes window-major storage, so
# programs differ only in which (zz, hh) window they touch.  Grouping gh
# lat-windows into one program makes the qkv/proj/MLP matmuls gh x wider
# (better MXU occupancy at small nlon) and amortises the per-program
# weight + bias-table streams across gh windows.  Only wm->wm blocks
# (interior of a wm-io chain) support grouping; stage end-points and
# prime nlat geometries fall back to gh=1.
# ---------------------------------------------------------------------------

def _make_wm_group_kernel(heads: int, hd: int, window, nlon: int, c: int,
                          gh: int, h_real: int, hp: int,
                          delta, canon_add: int, has_mask: bool,
                          fast_math: bool, has_drop: bool,
                          chunk_target: Optional[int]):
    wz, wh, ww = window
    n = wz * wh * ww
    half = n // 2
    scale = hd ** -0.5
    chunk = _lon_chunk(nlon, chunk_target)
    dz, dh, dw = delta
    stitch = dz != 0 or dh != 0
    n_x_refs = 4 if stitch else 1

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
            drop_ref = refs[i]
            i += 1
        (n1s_ref, n1b_ref, n2s_ref, n2b_ref,
         w1_ref, b1_ref, w2_ref, b2_ref) = refs[i:i + 8]
        o_ref = refs[i + 8]
        qkv_s, attn_s = refs[i + 9:i + 11]

        # ---- assemble (gh, nlon, N, C) in window coords ----------------
        if stitch:
            cut = (wh // 2) * ww
            r72 = jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0)
            a0 = xs[0][0, 0]                     # blkA, z-half 0
            b0 = xs[1][0, 0]                     # blkB, z-half 0
            a1 = xs[2][0, 0]
            b1 = xs[3][0, 0]

            def pair(blka, blkb):
                if dh > 0:
                    top = blka
                    bot = jnp.concatenate([blka[1:], blkb[:1]], axis=0)
                else:
                    top = jnp.concatenate([blka[gh - 1:], blkb[:gh - 1]],
                                          axis=0)
                    bot = blkb
                return jnp.where(r72[None, None] < cut,
                                 jnp.roll(top, -cut, axis=2),
                                 jnp.roll(bot, cut, axis=2))

            x = jnp.concatenate([pair(a0, b0), pair(a1, b1)], axis=2)
        else:
            x = xs[0][0, 0]                      # (gh, nlon, n, c)

        if dw:
            w_in_run = jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0), ww)[None, None]
            if dw > 0:
                xn = jnp.roll(x, -1, axis=1)
                x = jnp.where(w_in_run < ww - dw,
                              jnp.roll(x, -dw, axis=2),
                              jnp.roll(xn, ww - dw, axis=2))
            else:
                xp = jnp.roll(x, 1, axis=1)
                x = jnp.where(w_in_run >= -dw,
                              jnp.roll(x, -dw, axis=2),
                              jnp.roll(xp, -(ww + dw), axis=2))

        if h_real < hp:
            hh = pl.program_id(2)
            win_i = jax.lax.broadcasted_iota(jnp.int32, (gh, 1, 1), 0)
            row = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
            lat_loc = jax.lax.rem(jax.lax.div(row, ww), wh)
            canon = jax.lax.rem(wh * (gh * hh + win_i) + lat_loc + canon_add,
                                hp)
            x = jnp.where(canon[:, None] < h_real, x, jnp.zeros_like(x))

        xf = x.reshape(gh * nlon * n, c)
        dt = x.dtype

        qkv = jax.lax.dot_general(
            xf, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qkv = qkv + bqkv_ref[...][None].astype(jnp.float32)
        qkv_s[...] = qkv.astype(dt).reshape(gh * nlon, n, 3 * c)

        def body(t, carry):
            wi = t // (nlon // chunk)
            lo = t * chunk                       # == wi*nlon + ll*chunk
            bias = b_ref[wi].astype(jnp.float32)
            if ids_ref is not None:
                r = ids_ref[wi][0]
                bias = bias + jnp.where(r[None, :] != r[:, None],
                                        jnp.float32(-100.0), jnp.float32(0.0))
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

        jax.lax.fori_loop(0, gh * (nlon // chunk), body, 0, unroll=False)

        a = jax.lax.dot_general(
            attn_s[...].reshape(gh * nlon * n, c), wp_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        a = (a + bp_ref[...][None].astype(jnp.float32)).astype(dt)

        s1 = s2 = None
        if drop_ref is not None:
            s1, s2 = drop_ref[0, 0], drop_ref[0, 1]
        y = tail_math(a, xf, n1s_ref[...], n1b_ref[...], n2s_ref[...],
                      n2b_ref[...], w1_ref[...], b1_ref[...], w2_ref[...],
                      b2_ref[...], fast_math, s1, s2)

        o_ref[0, 0] = y.reshape(gh, nlon, n, c).astype(o_ref.dtype)

    return kernel


def _block_wm_group_call(p, xs, geom, delta, canon_add: int,
                         mask, fast_math: bool, gh: int,
                         drop=None, chunk_target: Optional[int] = None):
    """Grouped wm->wm whole block: gh lat-windows per program."""
    b, nz, nlat, nlon, n, c = xs.shape
    wz, wh, ww = geom.window
    heads = geom.heads
    hd = c // heads
    hp = nlat * wh
    dz, dh, dw = delta
    stitch = dz != 0 or dh != 0
    nblk = nlat // gh
    assert nlat % gh == 0

    if stitch:
        blk_a = 0 if dh > 0 else -1

        def mk(rz, rb):
            def imap(bb, zz, hh, rz=rz, rb=rb):
                return (bb,
                        ((wz * zz + rz + dz) // wz) % nz,
                        (hh + blk_a + rb) % nblk,
                        0, (rz + dz) % wz, 0)
            return pl.BlockSpec((1, 1, gh, nlon, n // 2, c), imap,
                                memory_space=pltpu.VMEM)

        # order: (z-half 0: blkA, blkB), (z-half 1: blkA, blkB)
        x_specs = [mk(rz, rb) for rz in range(2) for rb in range(2)]
        n_x = 4
    else:
        x_specs = [pl.BlockSpec((1, 1, gh, nlon, n, c),
                                lambda bb, zz, hh: (bb, zz, hh, 0, 0, 0),
                                memory_space=pltpu.VMEM)]
        n_x = 1

    dt = xs.dtype
    wqkv = p["attn"]["qkv"]["kernel"].astype(dt)
    bqkv = p["attn"]["qkv"]["bias"].astype(dt)
    wp = p["attn"]["proj"]["kernel"].astype(dt)
    bp = p["attn"]["proj"]["bias"].astype(dt)
    bias = p["attn"]["bias_table"]

    spec_b = pl.BlockSpec((gh, heads, n, n),
                          lambda bb, zz, hh: (zz * nblk + hh, 0, 0, 0),
                          memory_space=pltpu.VMEM)

    def fullspec(shape):
        return pl.BlockSpec(shape, lambda bb, zz, hh: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    operands = [xs] * n_x + [wqkv, bqkv, wp, bp, bias]
    in_specs = x_specs + [fullspec(wqkv.shape), fullspec(bqkv.shape),
                          fullspec(wp.shape), fullspec(bp.shape), spec_b]
    if mask is not None:
        operands.append(mask.reshape(mask.shape[0], 1, n))
        in_specs.append(pl.BlockSpec(
            (gh, 1, n), lambda bb, zz, hh: (zz * nblk + hh, 0, 0),
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

    out_spec = pl.BlockSpec((1, 1, gh, nlon, n, c),
                            lambda bb, zz, hh: (bb, zz, hh, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    scratch = [pltpu.VMEM((gh * nlon, n, 3 * c), dt),
               pltpu.VMEM((gh * nlon, n, c), dt)]

    return pl.pallas_call(
        _make_wm_group_kernel(heads, hd, geom.window, nlon, c, gh, geom.h,
                              hp, delta, canon_add, mask is not None,
                              fast_math, drop is not None, chunk_target),
        out_shape=jax.ShapeDtypeStruct(xs.shape, dt),
        grid=(b, nz, nblk),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nz * nlat * nlon * n * c * (4 * c + 2 * n + 8 * c),
            bytes_accessed=2 * xs.size * dt.itemsize
            + bias.size * bias.dtype.itemsize,
            transcendentals=b * nz * nlat * nlon * heads * n * n),
    )(*operands)
