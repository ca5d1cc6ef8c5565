"""Whole-block BACKWARD kernel: recompute + every gradient of one
Earth-specific block in ONE pallas_call, on window-major storage.

The round-1 training backward rematerialised each block through an XLA
composition (jnp.roll + grid-attention custom_vjp + XLA tail): per-step
trace showed ~417 ms of XLA tail fusions, ~223 ms of roll/partition
reshape+copy and ~67 ms of remat tails around the actual attention
gradient kernels.  This kernel removes all of it:

  * **The cotangent chain carries coordinate offsets, exactly like the
    forward storage chain.**  Block j's backward writes dx in block j's
    OWN window coordinates (plain block writes, no scatter); block j-1's
    backward folds the offset into its g-reads via the same 4-chunk
    stitch index maps the forward uses for x (ops/earth_block_wm.py).
    No jnp.roll ever materialises in the 16-block backward.
  * **Tail gradients fuse with attention gradients.**  dLN2, dMLP
    (dW1/db1/dW2/db2), dLN1, dProj, dSDPA, dQKV, dbias-table and dX are
    produced by one kernel per block; the MLP hidden activation and its
    cotangent never touch HBM.
  * Weight/bias/norm/bias-table gradients accumulate into resident fp32
    VMEM blocks across the (serialised, batch-innermost) grid, as in
    ops/window_attention._grid_attention_bwd_pallas.

Reference semantics being differentiated (pinned by
tests/test_ops.py::test_run_stage_train_wm_*): the training block of
/root/reference/models/layers.py:183-253 with timm DropPath as
per-sample branch scales — pad rows are zero-synthesised on read and
their dx is re-zeroed on write (the vjp of the crop+re-pad round trip).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pangu_tpu.ops.block_tail import _kernel_erf
from pangu_tpu.ops.earth_block_fused import _lon_chunk

_SQRT_2_OVER_PI = 0.7978845608028654
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _gelu_and_grad(z32, fast_math: bool):
    """gelu(z), gelu'(z) in fp32 (erf form; tanh form in fast_math —
    matches jax.nn.gelu(approximate=...) used by the XLA path)."""
    if fast_math:
        u = _SQRT_2_OVER_PI * (z32 + 0.044715 * z32 * z32 * z32)
        t = jnp.tanh(u)
        du = _SQRT_2_OVER_PI * (1.0 + 3 * 0.044715 * z32 * z32)
        g = 0.5 * z32 * (1.0 + t)
        dg = 0.5 * (1.0 + t) + 0.5 * z32 * (1.0 - t * t) * du
        return g, dg
    phi = 0.5 * (1.0 + _kernel_erf(z32 * jnp.float32(_INV_SQRT2)))
    pdf = jnp.float32(_INV_SQRT_2PI) * jnp.exp(-0.5 * z32 * z32)
    return z32 * phi, phi + z32 * pdf


def _ln_fwd_stats(x32, eps=1e-5):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    return (x32 - mu) * rstd, rstd


def _ln_bwd(dy32, xhat, rstd, scale32):
    """dx of y = xhat*scale + bias given dy; also (dscale, dbias) sums."""
    dxhat = dy32 * scale32[None]
    c = xhat.shape[-1]
    dx = (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
          - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)) * rstd
    dscale = jnp.sum(dy32 * xhat, axis=0, keepdims=True)
    dbias = jnp.sum(dy32, axis=0, keepdims=True)
    return dx, dscale, dbias


def _stash_p_default(c: int) -> bool:
    """Stash the attention probabilities in VMEM between the bwd kernel's
    forward and backward passes instead of recomputing the s-dot +
    softmax?  Hardware A/B (v5e, 2026-08-21, full geometry, with the
    a/x1/y scratch overlays making it fit the 128 MB cap): stash ON
    593-597 ms/step vs OFF 577-585 ms — the extra (nlon, n, heads*n)
    VMEM pressure (~7.5 MB/program) costs more Mosaic pipelining than
    the ~1.9 ms/block of skipped recompute buys, so the default is OFF.
    The path stays test-pinned (grads == XLA under PANGU_BWD_STASH_P=on)
    for future geometries where the trade may flip."""
    import os
    mode = os.environ.get("PANGU_BWD_STASH_P", "auto")
    if mode == "on":
        return True
    return False


def _make_block_bwd_kernel(heads: int, hd: int, window, nlon: int, c: int,
                           hidden: int, h_real: int, hp: int,
                           delta_x, delta_g, canon_add: int,
                           x_layout: str, g_layout: str,
                           has_mask: bool, fast_math: bool, has_drop: bool,
                           chunk_target: Optional[int], stash_p: bool):
    wz, wh, ww = window
    n = wz * wh * ww
    scale = hd ** -0.5
    chunk = _lon_chunk(nlon, chunk_target)
    dwx = delta_x[2]
    dwg = delta_g[2]
    x_stitch = x_layout == "wm" and (delta_x[0] != 0 or delta_x[1] != 0)
    g_stitch = g_layout == "wm" and (delta_g[0] != 0 or delta_g[1] != 0)
    n_x = 4 if x_stitch else 1
    n_g = 4 if g_stitch else 1

    def assemble(xs, layout, stitch, dw):
        """Gather this program's (nlon, n, c) window rows (window coords).
        Same roll-as-index-arithmetic as the forward wm kernel."""
        if layout == "canon":
            xc = xs[0][0]                                # (wz, wh, W, c)
            x = xc.reshape(wz, wh, nlon, ww, c).transpose(2, 0, 1, 3, 4)
            return x.reshape(nlon, n, c)
        if stitch:
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
        if dw:
            w_in_run = jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0), ww)
            if dw > 0:
                xn = jnp.roll(x, -1, axis=0)
                x = jnp.where(w_in_run < ww - dw,
                              jnp.roll(x, -dw, axis=1),
                              jnp.roll(xn, ww - dw, axis=1))
            else:
                xp = jnp.roll(x, 1, axis=0)
                x = jnp.where(w_in_run >= -dw,
                              jnp.roll(x, -dw, axis=1),
                              jnp.roll(xp, -(ww + dw), axis=1))
        return x

    def kernel(*refs):
        xs = refs[:n_x]
        i = n_x
        gs = refs[i:i + n_g]
        i += n_g
        (wqkv_ref, bqkv_ref, wp_ref, bp_ref, b_ref) = refs[i:i + 5]
        i += 5
        ids_ref = None
        if has_mask:
            ids_ref = refs[i]
            i += 1
        drop_ref = None
        if has_drop:
            drop_ref = refs[i]                           # (1, 2) SMEM
            i += 1
        (n1s_ref, n1b_ref, n2s_ref,
         w1_ref, b1_ref, w2_ref, b2_ref) = refs[i:i + 7]
        i += 7
        (dx_ref, dwqkv_ref, dbqkv_ref, dwp_ref, dbp_ref, db_ref,
         dn1s_ref, dn1b_ref, dn2s_ref, dn2b_ref,
         dw1_ref, db1_ref, dw2_ref, db2_ref) = refs[i:i + 14]
        scratches = refs[i + 14:]
        (qkv_s, attn_s, z_s, da_s, dqkv_s) = scratches[:5]
        p_s = scratches[5] if stash_p else None
        # a / x1 / y (each (nlon, n, c)) overlay the (nlon, n, 3c) dqkv
        # scratch as disjoint column thirds: their live ranges end at the
        # tail backward, strictly before bwd_body writes dq/dk/dv — saves
        # 3 * nlon*n*c of VMEM (the margin that fits the p-stash under
        # the 128 MB cap)

        first = ((pl.program_id(0) == 0) & (pl.program_id(1) == 0)
                 & (pl.program_id(2) == 0))

        @pl.when(first)
        def _():
            dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
            dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
            dwp_ref[...] = jnp.zeros_like(dwp_ref)
            dbp_ref[...] = jnp.zeros_like(dbp_ref)
            dn1s_ref[...] = jnp.zeros_like(dn1s_ref)
            dn1b_ref[...] = jnp.zeros_like(dn1b_ref)
            dn2s_ref[...] = jnp.zeros_like(dn2s_ref)
            dn2b_ref[...] = jnp.zeros_like(dn2b_ref)
            dw1_ref[...] = jnp.zeros_like(dw1_ref)
            db1_ref[...] = jnp.zeros_like(db1_ref)
            dw2_ref[...] = jnp.zeros_like(dw2_ref)
            db2_ref[...] = jnp.zeros_like(db2_ref)

        @pl.when(pl.program_id(2) == 0)
        def _():
            db_ref[...] = jnp.zeros_like(db_ref)

        # ---- assemble x (window coords) + pad-row zero synthesis -------
        x = assemble(xs, x_layout, x_stitch, dwx)
        keep = None
        if h_real < hp:
            hh = pl.program_id(1)
            row = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
            lat_loc = jax.lax.rem(jax.lax.div(row, ww), wh)
            canon = jax.lax.rem(wh * hh + lat_loc + canon_add, hp)
            keep = (canon < h_real)[None]                # (1, n, 1)
            x = jnp.where(keep, x, jnp.zeros_like(x))
        xf = x.reshape(nlon * n, c)
        dt = x.dtype
        g = assemble(gs, g_layout, g_stitch, dwg)
        gf = g.reshape(nlon * n, c).astype(jnp.float32)

        s1 = s2 = None
        if drop_ref is not None:
            s1, s2 = drop_ref[0, 0], drop_ref[0, 1]

        # ---- recompute forward -----------------------------------------
        qkv = jax.lax.dot_general(
            xf, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        qkv = qkv + bqkv_ref[...][None].astype(jnp.float32)
        qkv_s[...] = qkv.astype(dt).reshape(nlon, n, 3 * c)

        bias = b_ref[0].astype(jnp.float32)
        if ids_ref is not None:
            r = ids_ref[...][0]
            bias = bias + jnp.where(r[0][None, :] != r[0][:, None],
                                    jnp.float32(-100.0), jnp.float32(0.0))

        def fwd_body(ll, carry):
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
                if p_s is not None:
                    # stash the probabilities: bwd_body reuses them
                    # instead of recomputing the s-dot + softmax
                    # (~7.5 MB of VMEM buys ~1.9 ms/block of recompute)
                    p_s[pl.ds(lo, chunk), :, h * n:(h + 1) * n] = pr
                o = jax.lax.dot_general(
                    pr, v, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                attn_s[pl.ds(lo, chunk), :,
                       h * hd:(h + 1) * hd] = o.astype(dt)
            return carry

        jax.lax.fori_loop(0, nlon // chunk, fwd_body, 0, unroll=False)

        af = attn_s[...].reshape(nlon * n, c)
        a = jax.lax.dot_general(
            af, wp_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        a = a + bp_ref[...][None].astype(jnp.float32)
        dqkv_s[:, :, 0:c] = a.astype(dt).reshape(nlon, n, c)

        # tail forward (LN1 -> residual -> MLP), keeping LN inputs
        a32 = dqkv_s[:, :, 0:c].reshape(nlon * n, c).astype(jnp.float32)
        ahat, ra = _ln_fwd_stats(a32)
        br1 = (ahat * n1s_ref[...].astype(jnp.float32)[None]
               + n1b_ref[...].astype(jnp.float32)[None])
        if s1 is not None:
            br1 = br1 * s1
        x1 = xf.astype(jnp.float32) + br1
        dqkv_s[:, :, c:2 * c] = x1.astype(dt).reshape(nlon, n, c)
        z = jax.lax.dot_general(
            dqkv_s[:, :, c:2 * c].reshape(nlon * n, c), w1_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        z = z + b1_ref[...][None].astype(jnp.float32)
        z_s[...] = z.astype(dt).reshape(nlon, n, hidden)
        h32, dgelu = _gelu_and_grad(z_s[...].reshape(nlon * n, hidden)
                                    .astype(jnp.float32), fast_math)
        y = jax.lax.dot_general(
            h32.astype(dt), w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y + b2_ref[...][None].astype(jnp.float32)
        dqkv_s[:, :, 2 * c:3 * c] = y.astype(dt).reshape(nlon, n, c)

        # ---- backward: tail --------------------------------------------
        dbr2 = gf if s2 is None else gf * s2
        y32 = dqkv_s[:, :, 2 * c:3 * c].reshape(nlon * n, c).astype(jnp.float32)
        yhat, ry = _ln_fwd_stats(y32)
        dy2, dn2s, dn2b = _ln_bwd(dbr2, yhat, ry, n2s_ref[...]
                                  .astype(jnp.float32))
        dn2s_ref[...] += dn2s
        dn2b_ref[...] += dn2b
        dy2 = dy2.astype(dt)
        dw2_ref[...] += jax.lax.dot_general(
            h32.astype(dt), dy2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db2_ref[...] += jnp.sum(dy2.astype(jnp.float32), axis=0,
                                keepdims=True)
        dh = jax.lax.dot_general(
            dy2, w2_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dz = (dh * dgelu).astype(dt)
        dw1_ref[...] += jax.lax.dot_general(
            dqkv_s[:, :, c:2 * c].reshape(nlon * n, c), dz,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db1_ref[...] += jnp.sum(dz.astype(jnp.float32), axis=0,
                                keepdims=True)
        dx1 = gf + jax.lax.dot_general(
            dz, w1_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        dbr1 = dx1 if s1 is None else dx1 * s1
        da, dn1s, dn1b = _ln_bwd(dbr1, ahat, ra, n1s_ref[...]
                                 .astype(jnp.float32))
        dn1s_ref[...] += dn1s
        dn1b_ref[...] += dn1b

        # ---- backward: proj --------------------------------------------
        da = da.astype(dt)
        dwp_ref[...] += jax.lax.dot_general(
            af, da, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbp_ref[...] += jnp.sum(da.astype(jnp.float32), axis=0,
                                keepdims=True)
        datt = jax.lax.dot_general(
            da, wp_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        da_s[...] = datt.astype(dt).reshape(nlon, n, c)

        # ---- backward: attention per lon chunk / head -------------------
        def bwd_body(ll, carry):
            lo = ll * chunk
            for h in range(heads):
                q = qkv_s[pl.ds(lo, chunk), :, h * hd:(h + 1) * hd]
                k = qkv_s[pl.ds(lo, chunk), :, c + h * hd:c + (h + 1) * hd]
                v = qkv_s[pl.ds(lo, chunk), :,
                          2 * c + h * hd:2 * c + (h + 1) * hd]
                do = da_s[pl.ds(lo, chunk), :, h * hd:(h + 1) * hd]
                if p_s is not None:
                    # probabilities stashed by fwd_body — no recompute
                    p = p_s[pl.ds(lo, chunk), :, h * n:(h + 1) * n]
                    p32 = p.astype(jnp.float32)
                else:
                    s = jax.lax.dot_general(
                        q, k, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    s = s * jnp.float32(scale) + bias[h][None]
                    m = jnp.max(s, axis=-1, keepdims=True)
                    e = jnp.exp(s - m)
                    p32 = e / jnp.sum(e, axis=-1, keepdims=True)
                    p = p32.astype(dt)
                dv = jax.lax.dot_general(
                    p, do, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                dp = jax.lax.dot_general(
                    do, v, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                ds32 = p32 * (dp - jnp.sum(dp * p32, axis=-1,
                                           keepdims=True))
                db_ref[0, h] += jnp.sum(ds32, axis=0)
                ds = ds32.astype(dt)
                dq = jax.lax.dot_general(
                    ds, k, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32
                ) * jnp.float32(scale)
                dk = jax.lax.dot_general(
                    ds, q, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32
                ) * jnp.float32(scale)
                dqkv_s[pl.ds(lo, chunk), :,
                       h * hd:(h + 1) * hd] = dq.astype(dt)
                dqkv_s[pl.ds(lo, chunk), :,
                       c + h * hd:c + (h + 1) * hd] = dk.astype(dt)
                dqkv_s[pl.ds(lo, chunk), :,
                       2 * c + h * hd:2 * c + (h + 1) * hd] = dv.astype(dt)
            return carry

        jax.lax.fori_loop(0, nlon // chunk, bwd_body, 0, unroll=False)

        # ---- backward: qkv + residual -----------------------------------
        dqkvf = dqkv_s[...].reshape(nlon * n, 3 * c)
        dwqkv_ref[...] += jax.lax.dot_general(
            xf, dqkvf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbqkv_ref[...] += jnp.sum(dqkvf.astype(jnp.float32), axis=0,
                                  keepdims=True)
        dxf = dx1 + jax.lax.dot_general(
            dqkvf, wqkv_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dx = dxf.astype(dt).reshape(nlon, n, c)
        if keep is not None:
            # vjp of the zero-synthesis where(): pad rows carry no grad
            dx = jnp.where(keep, dx, jnp.zeros_like(dx))

        if x_layout == "canon":
            dxc = dx.reshape(nlon, wz, wh, ww, c).transpose(1, 2, 0, 3, 4)
            dx_ref[0] = dxc.reshape(wz, wh, nlon * ww, c)
        else:
            dx_ref[0, 0, 0] = dx

    return kernel


def _wm_chunk_specs(delta, wz, wh, nz, nlat, nlon, n, c, grid_order):
    """Four z-half stitch BlockSpecs on window-major storage — identical
    index arithmetic to ops/earth_block_wm._block_wm_call, but with the
    backward's (zz, hh, bb) grid order."""
    dz, dh, _ = delta
    csz = n // 2

    def mk(rz, rh):
        def imap(*gids):
            zz, hh, bb = grid_order(*gids)
            return (bb,
                    ((wz * zz + rz + dz) // wz) % nz,
                    ((wh * hh + dh) // wh + rh) % nlat,
                    0, (rz + dz) % wz, 0)
        return pl.BlockSpec((1, 1, 1, nlon, csz, c), imap,
                            memory_space=pltpu.VMEM)

    return [mk(rz, rh) for rz in range(2) for rh in range(2)]


def _block_bwd_call(p, xs, g, geom, delta_x, delta_g, canon_add: int,
                    x_layout: str, g_layout: str,
                    mask: Optional[jax.Array], fast_math: bool,
                    drop: Optional[jax.Array] = None,
                    chunk_target: Optional[int] = None):
    """All gradients of one whole block.  ``xs``: the block's input in
    x_layout storage; ``g``: the output cotangent in g_layout storage,
    offset by ``delta_g`` (the NEXT block's window shift — its backward
    wrote dx in its own window coordinates).  Returns
    (dx, grads-dict) with dx in the block's own window coordinates
    ("wm") or canonical ("canon", first block only)."""
    wz, wh, ww = geom.window
    heads = geom.heads
    if x_layout == "canon":
        b, z, hp, w, c = xs.shape
        nz, nlat, nlon = z // wz, hp // wh, w // ww
        n = wz * wh * ww
    else:
        b, nz, nlat, nlon, n, c = xs.shape
        hp = nlat * wh
    hd = c // heads
    hidden = p["mlp"]["fc1"]["kernel"].shape[-1]
    x_stitch = x_layout == "wm" and (delta_x[0] != 0 or delta_x[1] != 0)
    g_stitch = g_layout == "wm" and (delta_g[0] != 0 or delta_g[1] != 0)

    def order(zz, hh, bb):
        return zz, hh, bb

    def canon_spec():
        return pl.BlockSpec((1, wz, wh, nlon * ww, c),
                            lambda zz, hh, bb: (bb, zz, hh, 0, 0),
                            memory_space=pltpu.VMEM)

    def wm_spec():
        return pl.BlockSpec((1, 1, 1, nlon, n, c),
                            lambda zz, hh, bb: (bb, zz, hh, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def specs_for(layout, stitch, delta):
        if layout == "canon":
            return [canon_spec()], 1
        if stitch:
            return _wm_chunk_specs(delta, wz, wh, nz, nlat, nlon, n, c,
                                   order), 4
        return [wm_spec()], 1

    x_specs, n_x = specs_for(x_layout, x_stitch, delta_x)
    g_specs, n_g = specs_for(g_layout, g_stitch, delta_g)

    dt = xs.dtype
    wqkv = p["attn"]["qkv"]["kernel"].astype(dt)
    bqkv = p["attn"]["qkv"]["bias"].astype(dt)
    wp = p["attn"]["proj"]["kernel"].astype(dt)
    bp = p["attn"]["proj"]["bias"].astype(dt)
    bias = p["attn"]["bias_table"]
    ntype = bias.shape[0]

    spec_b = pl.BlockSpec((1, heads, n, n),
                          lambda zz, hh, bb: (zz * nlat + hh, 0, 0, 0),
                          memory_space=pltpu.VMEM)

    def fullspec(shape):
        return pl.BlockSpec(shape,
                            lambda zz, hh, bb: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    operands = ([xs] * n_x + [g] * n_g + [wqkv, bqkv, wp, bp, bias])
    in_specs = x_specs + g_specs + [
        fullspec(wqkv.shape), fullspec(bqkv.shape), fullspec(wp.shape),
        fullspec(bp.shape), spec_b]
    if mask is not None:
        operands.append(mask.reshape(ntype, 1, n))
        in_specs.append(pl.BlockSpec(
            (1, 1, n), lambda zz, hh, bb: (zz * nlat + hh, 0, 0),
            memory_space=pltpu.VMEM))
    if drop is not None:
        operands.append(drop.astype(jnp.float32))
        in_specs.append(pl.BlockSpec(
            (1, 2), lambda zz, hh, bb: (bb, 0),
            memory_space=pltpu.SMEM))

    tail = [p["norm1"]["scale"].astype(dt), p["norm1"]["bias"].astype(dt),
            p["norm2"]["scale"].astype(dt),
            p["mlp"]["fc1"]["kernel"].astype(dt),
            p["mlp"]["fc1"]["bias"].astype(dt),
            p["mlp"]["fc2"]["kernel"].astype(dt),
            p["mlp"]["fc2"]["bias"].astype(dt)]
    operands += tail
    in_specs += [fullspec((c,)), fullspec((c,)), fullspec((c,)),
                 fullspec((c, hidden)), fullspec((hidden,)),
                 fullspec((hidden, c)), fullspec((c,))]

    if x_layout == "canon":
        dx_shape = (b, nz * wz, nlat * wh, nlon * ww, c)
        dx_spec = canon_spec()
    else:
        dx_shape = (b, nz, nlat, nlon, n, c)
        dx_spec = wm_spec()

    def res(shape):
        return (jax.ShapeDtypeStruct(shape, jnp.float32), fullspec(shape))

    outs = [(jax.ShapeDtypeStruct(dx_shape, dt), dx_spec),
            res((c, 3 * c)), res((1, 3 * c)), res((c, c)), res((1, c)),
            (jax.ShapeDtypeStruct((ntype, heads, n, n), jnp.float32),
             spec_b),
            res((1, c)), res((1, c)), res((1, c)), res((1, c)),
            res((c, hidden)), res((1, hidden)), res((hidden, c)),
            res((1, c))]
    out_shapes = tuple(o[0] for o in outs)
    out_specs = tuple(o[1] for o in outs)

    scratch = [pltpu.VMEM((nlon, n, 3 * c), dt),   # qkv
               pltpu.VMEM((nlon, n, c), dt),       # attn out
               pltpu.VMEM((nlon, n, hidden), dt),  # pre-gelu z
               pltpu.VMEM((nlon, n, c), dt),       # d(attn out)
               pltpu.VMEM((nlon, n, 3 * c), dt)]   # dqkv (fwd: a/x1/y
                                                   # overlay its thirds)
    stash_p = _stash_p_default(c)
    if stash_p:
        scratch.append(pltpu.VMEM((nlon, n, heads * n), dt))  # probs stash

    r = pl.pallas_call(
        _make_block_bwd_kernel(heads, hd, geom.window, nlon, c, hidden,
                               geom.h, hp, delta_x, delta_g, canon_add,
                               x_layout, g_layout, mask is not None,
                               fast_math, drop is not None, chunk_target,
                               stash_p),
        out_shape=out_shapes,
        grid=(nz, nlat, b),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # resident accumulators -> fully serialised grid
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=128 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * nz * nlat * nlon * n * c * (4 * c + 2 * n + 8 * c),
            bytes_accessed=3 * xs.size * dt.itemsize
            + 2 * bias.size * bias.dtype.itemsize,
            transcendentals=2 * b * nz * nlat * nlon * heads * n * n),
    )(*operands)

    (dx, dwqkv, dbqkv, dwp, dbp_, dbias, dn1s, dn1b, dn2s, dn2b,
     dw1, db1, dw2, db2) = r

    def like(val, ref_leaf):
        return val.reshape(ref_leaf.shape).astype(ref_leaf.dtype)

    grads = {
        "attn": {
            "qkv": {"kernel": like(dwqkv, p["attn"]["qkv"]["kernel"]),
                    "bias": like(dbqkv, p["attn"]["qkv"]["bias"])},
            "proj": {"kernel": like(dwp, p["attn"]["proj"]["kernel"]),
                     "bias": like(dbp_, p["attn"]["proj"]["bias"])},
            "bias_table": like(dbias, p["attn"]["bias_table"]),
        },
        "norm1": {"scale": like(dn1s, p["norm1"]["scale"]),
                  "bias": like(dn1b, p["norm1"]["bias"])},
        "norm2": {"scale": like(dn2s, p["norm2"]["scale"]),
                  "bias": like(dn2b, p["norm2"]["bias"])},
        "mlp": {
            "fc1": {"kernel": like(dw1, p["mlp"]["fc1"]["kernel"]),
                    "bias": like(db1, p["mlp"]["fc1"]["bias"])},
            "fc2": {"kernel": like(dw2, p["mlp"]["fc2"]["kernel"]),
                    "bias": like(db2, p["mlp"]["fc2"]["bias"])},
        },
    }
    return dx, grads



# ---------------------------------------------------------------------------
# Whole-stage training chain: mixed-layout wm forward kernels as primal,
# the whole-block backward kernel per block — the cotangent chain carries
# the same coordinate offsets as the forward storage chain.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _block_train_core_wm(geom, delta_x: Tuple[int, int, int],
                         delta_g: Tuple[int, int, int], canon_add: int,
                         shifted: bool, in_layout: str, out_layout: str,
                         fast_math: bool, chunk_target: Optional[int],
                         has_drop: bool, tp_axis: Optional[str] = None,
                         tp_size: int = 1):
    from pangu_tpu.models.layers import window_region_ids
    from pangu_tpu.ops.earth_block_wm import _block_wm_call

    ids_np = None
    if shifted:
        ids_np = window_region_ids(geom.z, geom.h_padded, geom.window)

    def _ids():
        # region ids live on the GLOBAL grid; under z-window (tp)
        # sharding each shard slices its own window-type rows
        if ids_np is None:
            return None
        ids = jnp.asarray(ids_np)
        if tp_axis is not None and tp_size > 1:
            ntype_loc = ids.shape[0] // tp_size
            ids = jax.lax.dynamic_slice_in_dim(
                ids, jax.lax.axis_index(tp_axis) * ntype_loc,
                ntype_loc, 0)
        return ids

    g_layout = "wm" if out_layout == "wm" else "canon"

    @jax.custom_vjp
    def fused(bp, xs, drop):
        return _block_wm_call(bp, xs, geom, delta_x, canon_add, _ids(),
                              fast_math, drop=drop,
                              chunk_target=chunk_target,
                              in_layout=in_layout, out_layout=out_layout)

    def fwd(bp, xs, drop):
        return fused(bp, xs, drop), (bp, xs, drop)

    def bwd(res, g):
        # anti-hoist barrier: ties the recompute to the cotangent so the
        # scheduler cannot move all 16 block backwards into the forward
        res, g = jax.lax.optimization_barrier((res, g))
        bp, xs, drop = res
        dx, grads = _block_bwd_call(
            bp, xs, g, geom, delta_x, delta_g, canon_add,
            x_layout=in_layout, g_layout=g_layout, mask=_ids(),
            fast_math=fast_math, drop=drop, chunk_target=chunk_target)
        ddrop = None if drop is None else jnp.zeros_like(drop)
        return grads, dx, ddrop

    fused.defvjp(fwd, bwd)
    return fused


def run_stage_train_wm(stage_params, x, geom, drops, *,
                       fast_math: bool = False,
                       chunk_target: Optional[int] = None,
                       io_in: str = "canon", io_out: str = "canon",
                       sp_axis: Optional[str] = None, sp_size: int = 1,
                       tp_axis: Optional[str] = None, tp_size: int = 1):
    """Training forward+backward of one EarthSpecificLayer through the
    mixed-layout window-major kernels (primal == run_stage_wm) with the
    whole-block backward kernel per block.

    Drop-in replacement for ops/earth_block_fused.run_stage_train: same
    ``drops`` contract ((B, 2) stochastic-depth branch scales per block,
    drawn by the caller so RNG streams match the XLA path).

    ``io_in="wm"``: x is window-major entry storage in canonical
    coordinates (down/up/embed wm output); ``io_out="wm"``: returns the
    ROLLED wm storage plus the final offset as ``(xs, off)`` — the wm-io
    training trunk (models/pangu.forward_core_wm_train) chains stages
    through these with zero stage-boundary relayouts, and the cotangent
    chain carries the same offsets backwards (a consumer's bwd hands dX
    back in the producer's own storage coordinates, so the last block's
    g-read offset stays (0, 0, 0)).

    Under ``shard_map`` with longitude windows sharded over mesh axis
    ``sp_axis`` (``sp_size`` shards), x is the LOCAL shard: the lon
    component of each half-window shift runs as a storage-level
    ``_lon_shift_wm`` (one-window-column ppermute halo + sublane rolls,
    an ordinary differentiable op OUTSIDE the custom_vjp kernels — its
    reverse ppermute comes for free from the transpose) and the kernels
    keep only the z/lat stitch; shard_map's transpose then psums the
    replicated parameter gradients across shards.  The returned ``off``
    has lon component 0, so wm consumers never need a cross-shard read.

    Under ``shard_map`` with Z windows sharded over ``tp_axis``
    (``tp_size`` shards — the bias tables, type-major in z, shard with
    them), the z component likewise runs as a differentiable
    storage-level ``_z_shift_wm`` halo and the returned ``off`` has z
    component 0."""
    from pangu_tpu.ops.earth_block_wm import _lon_shift_wm, _z_shift_wm

    wz, wh, ww = geom.window
    hp = geom.h_padded
    if io_in == "wm":
        xs = x
        H = geom.h
    else:
        B, Z, H, W, C = x.shape
        xs = jnp.pad(x, ((0, 0), (0, 0), (0, hp - H), (0, 0), (0, 0)))
    half = (wz // 2, wh // 2, ww // 2)
    blocks = stage_params["blocks"]
    nb = len(blocks)
    sharded = sp_axis is not None and sp_size > 1
    z_sharded = tp_axis is not None and tp_size > 1

    deltas, off = [], (0, 0, 0)
    for j in range(nb):
        target = half if j % 2 == 1 else (0, 0, 0)
        deltas.append(tuple(t - o for t, o in zip(target, off)))
        off = target

    def kdelta(j):
        """The delta the block-j KERNEL sees: under lon (sp) / z (tp)
        sharding those components are resolved at the storage level
        before the kernel."""
        d = deltas[j]
        inner = io_in == "wm" or j > 0
        if sharded and d[2] and inner:
            d = (d[0], d[1], 0)
        if z_sharded and d[0] and inner:
            d = (0, d[1], d[2])
        return d

    for j, bp in enumerate(blocks):
        shifted = (j % 2 == 1)
        delta = deltas[j]
        in_l = "wm" if (io_in == "wm" or j > 0) else "canon"
        out_l = "wm" if (io_out == "wm" or j < nb - 1) else "canon"
        if sharded and delta[2] and in_l == "wm":
            xs = _lon_shift_wm(xs, delta[2], ww, sp_axis, sp_size)
            delta = (delta[0], delta[1], 0)
        if z_sharded and delta[0] and in_l == "wm":
            xs = _z_shift_wm(xs, delta[0], wz, tp_axis, tp_size)
            delta = (0, delta[1], delta[2])
        # block j+1 wrote dx in its own window coords: array position t
        # holds the cotangent of storage token t + kdelta_{j+1} (the lon
        # and z components, when storage-resolved, are undone by the
        # shifts' own transposes), so the g-read offset is the NEGATED
        # next-block kernel delta
        delta_g = (tuple(-d for d in kdelta(j + 1)) if j + 1 < nb
                   else (0, 0, 0))
        drop = drops[j] if drops is not None else None
        core = _block_train_core_wm(
            geom, delta, delta_g, half[1] if shifted else 0, shifted,
            in_l, out_l, fast_math, chunk_target, drop is not None,
            tp_axis if z_sharded else None, tp_size if z_sharded else 1)
        xs = core(bp, xs, drop)

    if io_out == "wm":
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
