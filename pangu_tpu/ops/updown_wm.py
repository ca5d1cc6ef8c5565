"""Window-major DownSample / UpSample kernels: consume the previous
stage's window-major ROLLED storage directly and emit the next stage's
window-major entry storage.

With the mixed-layout block chains (ops/earth_block_wm.py) the stage
boundaries were the last place the canonical token grid materialised:
exit block relayout -> stage-end jnp.roll -> crop -> lat pad -> down/up
kernel -> next stage entry relayout.  These kernels collapse all of it:

  * the stage-end roll-back is index arithmetic (the same modular
    4/6-chunk stitch reads the block kernels use for shifted windows);
  * the latitude crop + re-pad is zero-synthesis on read plus an output
    row mask (reference re-pads zeros, models/layers.py:429,469);
  * the 2x2 space-to-depth gather / depth-to-space scatter happens on
    VMEM tiles between the stitch-read and the LN+matmul;
  * the output is written directly in the next stage's window-major
    layout, so the next entry block reads with ZERO relayout.

Reference semantics: DownSample /root/reference/models/layers.py:423-459
(merge order (h_off, w_off, C), LN(4C) then (4C->2C) reduction),
UpSample layers.py:461-499 ((2C->4C') expand, depth-to-space, crop,
LN(C'), (C'->C') mix).

Training: :func:`down_sample_wm_train` / :func:`up_sample_wm_train` wrap
the same kernels in a custom_vjp whose backward recomputes through the
XLA reference composition on wm storage (anti-hoist barrier as in
ops/updown.py) — the wm-io training trunk
(models/pangu.forward_core_wm_train) chains stage boundaries through
these with zero forward-path relayouts.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pangu_tpu.ops.block_tail import _kernel_ln


def _lon_unroll(x, ww: int, dw: int):
    """Canonical lon v reads storage lon v+dw (dw<0 for roll-back) on a
    (nlon, rows, C) tile with rows (…, lon)-major — two sublane rolls and
    a select, as in the wm block kernels."""
    if dw == 0:
        return x
    rows = x.shape[1]
    w_in_run = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0), ww)
    if dw > 0:
        xn = jnp.roll(x, -1, axis=0)
        return jnp.where(w_in_run < ww - dw,
                         jnp.roll(x, -dw, axis=1),
                         jnp.roll(xn, ww - dw, axis=1))
    xp = jnp.roll(x, 1, axis=0)
    return jnp.where(w_in_run >= -dw,
                     jnp.roll(x, -dw, axis=1),
                     jnp.roll(xp, -(ww + dw), axis=1))


# ---------------------------------------------------------------------------
# DownSample (stage0 wm rolled -> stage1 wm canonical)
# ---------------------------------------------------------------------------

def _make_down_wm_kernel(window, nlon0: int, nlon1: int, c: int,
                         h_in: int, h_out: int, off, fast_math: bool):
    wz, wh, ww = window
    n = wz * wh * ww
    half = n // 2                                # rows per z-half chunk
    dwo = -off[2]

    def kernel(*refs):
        xs = refs[:6]                            # 2 z-parts x 3 lat wins
        ns_ref, nb_ref, wr_ref, o_ref, cat_s, h_s, q_s = refs[6:]
        hh = pl.program_id(2)

        lat_iota = jax.lax.broadcasted_iota(
            jnp.int32, (2 * wh * ww, 1), 0) // ww   # input lat 0..2wh-1

        for rz in range(2):
            chunks = [xs[rz * 3 + k][0, 0, 0] for k in range(3)]
            lat3 = jnp.concatenate(chunks, axis=1)   # (nlon0, 3*half? ...)
            # canonical input lats 2*wh*hh .. +2wh-1 start at local row
            # off[1] of the first window (static: 2*wh*hh - off[1] ==
            # wh*(2hh-1) + (wh - off[1]))
            start = (wh - off[1]) % wh
            lat12 = lat3[:, start * ww:(start + 2 * wh) * ww]
            lat12 = _lon_unroll(lat12, ww, dwo)      # (nlon0, 2wh*ww, c)
            # zero-synthesise lat pad rows (canonical lat >= h_in)
            lat_in = 2 * wh * hh + lat_iota
            lat12 = jnp.where(lat_in[None] < h_in, lat12,
                              jnp.zeros_like(lat12))
            # 2x2 space-to-depth, merge order (h_off, w_off, C)
            # (reference models/layers.py:449-451), staged as <=5-D
            # sublane transposes with the lane dim intact — real Mosaic
            # rejects 7-D vectors and lane-splitting reshapes that
            # interpret mode accepts (NOTES.md round-2 gotchas)
            t = lat12.reshape(nlon0, wh, 2, ww, c)   # [iw, k, ho, w, C]
            h_s[...] = t.transpose(2, 0, 1, 3, 4)    # [ho, iw, k, w, C]
            for ho in range(2):
                g5 = h_s[ho].reshape(nlon0, wh, ww // 2, 2, c)
                q_s[ho] = g5.transpose(3, 0, 1, 2, 4)  # [wo,iw,k,wp,C]
            for ho in range(2):
                for wo in range(2):
                    p5 = q_s[ho, wo].reshape(nlon1, 2, wh, ww // 2, c)
                    p5 = p5.transpose(0, 2, 1, 3, 4)   # [lp,k,wi,wp,C]
                    part = p5.reshape(nlon1, wh * ww, c)
                    cat_s[rz, :, :, (ho * 2 + wo) * c:
                          (ho * 2 + wo + 1) * c] = part

        cat = _kernel_ln(cat_s[...].reshape(2 * nlon1 * wh * ww, 4 * c),
                         ns_ref[...], nb_ref[...], fast_math)
        y = jax.lax.dot_general(cat, wr_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = y.astype(o_ref.dtype).reshape(2, nlon1, wh * ww, 2 * c)
        y = y.transpose(1, 0, 2, 3).reshape(nlon1, n, 2 * c)
        # output pad rows (downsampled lat >= h_out) are REAL zeros — the
        # next stage reads them as the zero lat-pad (layers.py:192)
        row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
        lat_out = wh * hh + jax.lax.rem(jax.lax.div(row, ww), wh)
        y = jnp.where(lat_out[None] < h_out, y, jnp.zeros_like(y))
        o_ref[0, 0, 0] = y

    return kernel


def down_sample_wm(p, xs, geom0, geom1, off: Tuple[int, int, int],
                   *, fast_math: bool = False):
    """xs: (B, nz, nlat0, nlon0, N, C) window-major storage holding the
    canonical token t + off at position t (a stage that ended shifted);
    geom0/geom1 the stage geometries around the DownSample.  Returns
    (B, nz, nlat1, nlon1, N, 2C) window-major next-stage entry storage in
    canonical coordinates, pad rows zeroed."""
    b, nz, nlat0, nlon0, n, c = xs.shape
    wz, wh, ww = geom0.window
    nlat1 = geom1.h_padded // wh
    nlon1 = nlon0 // 2          # from the (possibly shard-local) input:
                                # == geom1.w // ww single-device, == the
                                # local lon-window count under shard_map
    dt = xs.dtype

    def chunk_spec(rz, k):
        def imap(bb, zz, hh, rz=rz, k=k):
            return (bb,
                    ((wz * zz + rz - off[0]) // wz) % nz,
                    ((2 * wh * hh - off[1]) // wh + k) % nlat0,
                    0, (rz - off[0]) % wz, 0)
        return pl.BlockSpec((1, 1, 1, nlon0, n // wz, c), imap,
                            memory_space=pltpu.VMEM)

    x_specs = [chunk_spec(rz, k) for rz in range(2) for k in range(3)]

    def fullspec(shape):
        return pl.BlockSpec(shape, lambda bb, zz, hh: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    ns = p["norm"]["scale"].astype(dt)
    nb = p["norm"]["bias"].astype(dt)
    wr = p["reduce"]["kernel"].astype(dt)

    out_spec = pl.BlockSpec((1, 1, 1, nlon1, n, 2 * c),
                            lambda bb, zz, hh: (bb, zz, hh, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _make_down_wm_kernel(geom0.window, nlon0, nlon1, c, geom0.h,
                             geom1.h, off, fast_math),
        out_shape=jax.ShapeDtypeStruct((b, nz, nlat1, nlon1, n, 2 * c), dt),
        grid=(b, nz, nlat1),
        in_specs=x_specs + [fullspec(ns.shape), fullspec(nb.shape),
                            fullspec(wr.shape)],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((2, nlon1, wh * ww, 4 * c), dt),
                        pltpu.VMEM((2, nlon0, wh, ww, c), dt),
                        pltpu.VMEM((2, 2, nlon0, wh, ww // 2, c), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nz * nlat1 * nlon1 * n * 4 * c * 2 * c,
            bytes_accessed=int(2 * xs.size * dt.itemsize),
            transcendentals=0),
    )(*([xs] * 6 + [ns, nb, wr]))


# ---------------------------------------------------------------------------
# UpSample (stage2 wm rolled -> stage3 wm canonical)
# ---------------------------------------------------------------------------

def _make_up_wm_kernel(window, nlon_in: int, nlon_out: int, c_in: int,
                       c_out: int, h_in: int, off, fast_math: bool):
    wz, wh, ww = window
    n = wz * wh * ww
    dwo = -off[2]
    lat_rows = (wh // 2) * ww                    # 3 input lats per window

    def kernel(*refs):
        xs = refs[:2]                            # one z-half chunk per part
        (we_ref, ns_ref, nb_ref, wm_ref, o_ref,
         e_s, st_s, m_s, y_s) = refs[2:]
        hh = pl.program_id(2)

        # input canonical lats (wh//2)*hh .. +wh//2-1 live at local row
        # (wh//2*hh - off1) mod wh of window ((wh//2*hh - off1)//wh):
        # start is 0 or wh//2 depending on hh parity -> read both halves
        # of the window and select (static slices + one where)
        # floor mod (Python % on the traced id), NOT lax.rem — the
        # numerator goes negative at hh=0 when the storage is rolled
        start_is_hi = (((wh // 2) * hh - off[1]) % wh) // (wh // 2)
        lat_iota = jax.lax.broadcasted_iota(
            jnp.int32, (lat_rows, 1), 0) // ww

        for rz in range(2):
            chunk = xs[rz][0, 0, 0]              # (nlon_in, n//wz, c_in)
            lo = chunk[:, :lat_rows]
            hi = chunk[:, lat_rows:]
            x3 = jnp.where(start_is_hi == 0, lo, hi)
            x3 = _lon_unroll(x3, ww, dwo)        # (nlon_in, lat_rows, c_in)
            lat_in = (wh // 2) * hh + lat_iota
            x3 = jnp.where(lat_in[None] < h_in, x3, jnp.zeros_like(x3))
            e = jax.lax.dot_general(
                x3.reshape(nlon_in * lat_rows, c_in), we_ref[...],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            e_s[rz] = e.astype(o_ref.dtype).reshape(nlon_in, lat_rows,
                                                    4 * c_out)

        # depth-to-space: e [iw, k, w, (ho, wo, C)] ->
        # out [l=2iw+wi, ko=2k+ho, wglob=2wl+wo] (layers.py:481-489)
        # depth-to-space via LANE-offset feature slices + <=5-D sublane
        # transposes — real Mosaic rejects both lane-splitting reshapes
        # ((…,4C) -> (…,2,2,C)) and 7-D vector shapes that interpret mode
        # accepts (NOTES.md round-2 gotchas; reference semantics
        # models/layers.py:481-489)
        for rz in range(2):
            for ho in range(2):
                for wo in range(2):
                    sl = e_s[rz][:, :, (2 * ho + wo) * c_out:
                                 (2 * ho + wo + 1) * c_out]   # (iw,36,C)
                    t = sl.reshape(nlon_in, wh // 2, 2, ww // 2, c_out)
                    t = t.transpose(0, 2, 1, 3, 4)     # [iw,wi,k,wl,C]
                    st_s[ho, wo] = t.reshape(nlon_out, (wh // 2)
                                             * (ww // 2), c_out)
            for ho in range(2):
                b = st_s[ho]                           # (2=wo,l,k*wl,C)
                b = b.reshape(2, nlon_out, wh // 2, ww // 2, c_out)
                b = b.transpose(1, 2, 3, 0, 4)         # [l,k,wl,wo,C]
                m_s[ho] = b.reshape(nlon_out, wh // 2, ww, c_out)
            mm = m_s[...].transpose(1, 2, 0, 3, 4)     # [l,k,ho,w,C]
            y_s[rz] = mm.reshape(nlon_out, wh * ww, c_out)
        y = y_s[...].transpose(1, 0, 2, 3)             # z-major rows
        y = y.reshape(nlon_out, n, c_out)

        yf = _kernel_ln(y.reshape(nlon_out * n, c_out), ns_ref[...],
                        nb_ref[...], fast_math)
        yf = jax.lax.dot_general(yf, wm_ref[...], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o_ref[0, 0, 0] = yf.astype(o_ref.dtype).reshape(nlon_out, n, c_out)

    return kernel


def up_sample_wm(p, xs, geom2, geom3, off: Tuple[int, int, int],
                 *, fast_math: bool = False):
    """xs: (B, nz, nlat2, nlon2, N, C2) rolled wm storage of the deep
    stage; returns (B, nz, nlat3, nlon3, N, C3) window-major stage-3
    entry storage in canonical coordinates (lat pad rows carry junk that
    the consumer zero-synthesises away, exactly like block outputs)."""
    b, nz, nlat2, nlon2, n, c_in = xs.shape
    wz, wh, ww = geom2.window
    c_out = p["expand"]["kernel"].shape[-1] // 4
    nlat3 = geom3.h_padded // wh
    nlon3 = nlon2 * 2           # local under shard_map (see down_sample_wm)
    dt = xs.dtype

    def chunk_spec(rz):
        def imap(bb, zz, hh, rz=rz):
            return (bb,
                    ((wz * zz + rz - off[0]) // wz) % nz,
                    (((wh // 2) * hh - off[1]) // wh) % nlat2,
                    0, (rz - off[0]) % wz, 0)
        return pl.BlockSpec((1, 1, 1, nlon2, n // wz, c_in), imap,
                            memory_space=pltpu.VMEM)

    # the wh//2 input lats of one output window never cross a lat-window
    # boundary (start ≡ 0 or wh/2 mod wh), so ONE chunk per z-part
    x_specs = [chunk_spec(0), chunk_spec(1)]

    def fullspec(shape):
        return pl.BlockSpec(shape, lambda bb, zz, hh: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    we = p["expand"]["kernel"].astype(dt)
    ns = p["norm"]["scale"].astype(dt)
    nb = p["norm"]["bias"].astype(dt)
    wm = p["mix"]["kernel"].astype(dt)

    out_spec = pl.BlockSpec((1, 1, 1, nlon3, n, c_out),
                            lambda bb, zz, hh: (bb, zz, hh, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _make_up_wm_kernel(geom2.window, nlon2, nlon3, c_in, c_out,
                           geom2.h, off, fast_math),
        out_shape=jax.ShapeDtypeStruct((b, nz, nlat3, nlon3, n, c_out), dt),
        grid=(b, nz, nlat3),
        in_specs=x_specs + [fullspec(we.shape), fullspec(ns.shape),
                            fullspec(nb.shape), fullspec(wm.shape)],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, nlon2, (wh // 2) * ww, 4 * c_out), dt),
            pltpu.VMEM((2, 2, nlon3, (wh // 2) * (ww // 2), c_out), dt),
            pltpu.VMEM((2, nlon3, wh // 2, ww, c_out), dt),
            pltpu.VMEM((2, nlon3, wh * ww, c_out), dt)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nz * nlat2 * nlon2 * n * c_in * 4 * c_out,
            bytes_accessed=int(2 * xs.size * dt.itemsize),
            transcendentals=0),
    )(*([xs] * 2 + [we, ns, nb, wm]))


# ---------------------------------------------------------------------------
# Differentiable wm stage boundaries for the training trunk
# ---------------------------------------------------------------------------
#
# Primal = the Pallas kernels above (fast path); backward = jax.vjp of the
# XLA reference composition on the SAME wm storage (from_wm -> roll-back ->
# crop -> L.down/up_sample -> zero-pad -> to_wm).  The crop kills the junk
# lat-pad rows' gradients (the kernels zero-synthesise those rows on read,
# so their cotangent must be zero), and the zero-pad on the output side is
# consistent because the consumer (run_stage_train_wm io_in="wm") re-zeroes
# the pad rows' dx on write.  Recompute cost is two boundary chains in the
# backward only; the forward never materialises a canonical token grid.

@functools.lru_cache(maxsize=16)
def _down_wm_train_core(geom0, geom1, off: Tuple[int, int, int],
                        fast_math: bool):
    from pangu_tpu.models import layers as L
    from pangu_tpu.ops.earth_block_wm import (from_window_major,
                                              to_window_major)

    def ref(p, xs):
        x = from_window_major(xs, geom0.window)
        x = jnp.roll(x, off, axis=(1, 2, 3))[:, :, :geom0.h]
        y = L.down_sample(p, x)
        y = jnp.pad(y, ((0, 0), (0, 0), (0, geom1.h_padded - geom1.h),
                        (0, 0), (0, 0)))
        return to_window_major(y, geom1.window)

    @jax.custom_vjp
    def fused(p, xs):
        return down_sample_wm(p, xs, geom0, geom1, off,
                              fast_math=fast_math)

    def fwd(p, xs):
        return fused(p, xs), (p, xs)

    def bwd(res, g):
        res, g = jax.lax.optimization_barrier((res, g))
        _, vjp = jax.vjp(ref, *res)
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


def down_sample_wm_train(p, xs, geom0, geom1, off: Tuple[int, int, int],
                         *, fast_math: bool = False):
    """Differentiable window-major DownSample (training trunk)."""
    return _down_wm_train_core(geom0, geom1, tuple(off), fast_math)(p, xs)


@functools.lru_cache(maxsize=16)
def _up_wm_train_core(geom2, geom3, off: Tuple[int, int, int],
                      fast_math: bool):
    from pangu_tpu.models import layers as L
    from pangu_tpu.ops.earth_block_wm import (from_window_major,
                                              to_window_major)

    def ref(p, xs):
        x = from_window_major(xs, geom2.window)
        x = jnp.roll(x, off, axis=(1, 2, 3))[:, :, :geom2.h]
        y = L.up_sample(p, x, geom3.h)
        y = jnp.pad(y, ((0, 0), (0, 0), (0, geom3.h_padded - geom3.h),
                        (0, 0), (0, 0)))
        return to_window_major(y, geom3.window)

    @jax.custom_vjp
    def fused(p, xs):
        return up_sample_wm(p, xs, geom2, geom3, off, fast_math=fast_math)

    def fwd(p, xs):
        return fused(p, xs), (p, xs)

    def bwd(res, g):
        res, g = jax.lax.optimization_barrier((res, g))
        _, vjp = jax.vjp(ref, *res)
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


def up_sample_wm_train(p, xs, geom2, geom3, off: Tuple[int, int, int],
                       *, fast_math: bool = False):
    """Differentiable window-major UpSample (training trunk)."""
    return _up_wm_train_core(geom2, geom3, tuple(off), fast_math)(p, xs)
