"""Kernel-structure experiments for the whole-block fused kernel.

Variant A (current v2): per-head thin projections (N=32 lanes) + per-window
2-D matmuls in a fori_loop.
Variant B: ONE wide qkv matmul (N=3C lanes, full MXU), lane-sliced per
head; per-window attention with a HEAD-BATCHED dot_general; head outputs
written into a (nlon, n, C) scratch by lane slice; ONE wide proj matmul.

Chained x = f(x) timing, full-res stage-0 geometry, bf16.
"""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import sys
import time

import numpy as np


def build_variant_b():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from pangu_tpu.ops.block_tail import tail_math

    def make_kernel(heads, hd, window, nlon, c, fast_math):
        wz, wh, ww = window
        n = wz * wh * ww
        scale = hd ** -0.5

        def kernel(x_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref, b_ref,
                   n1s_ref, n1b_ref, n2s_ref, n2b_ref,
                   w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                   qkv_s, attn_s):
            x = x_ref[0]                               # (wz, wh, W, C)
            xw = x.reshape(wz, wh, nlon, ww, c).transpose(2, 0, 1, 3, 4)
            xf = xw.reshape(nlon * n, c)
            dt = x.dtype

            # ONE wide qkv projection: (nlon*n, C) @ (C, 3C)
            qkv = jax.lax.dot_general(
                xf, wqkv_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            qkv = qkv + bqkv_ref[...][None].astype(jnp.float32)
            qkv_s[...] = qkv.astype(dt).reshape(nlon, n, 3 * c)

            bias = b_ref[0].astype(jnp.float32)        # (heads, n, n)

            def body(ll, carry):
                # per-head q/k/v via REF lane-offset slices of the wide
                # qkv scratch (reshape across lanes is unsupported)
                for h in range(heads):
                    q = qkv_s[ll, :, h * hd:(h + 1) * hd]
                    k = qkv_s[ll, :, c + h * hd:c + (h + 1) * hd]
                    v = qkv_s[ll, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
                    s = jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    s = s * jnp.float32(scale) + bias[h]
                    m = jnp.max(s, axis=-1, keepdims=True)
                    e = jnp.exp(s - m)
                    pr = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
                    o = jax.lax.dot_general(
                        pr, v, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)    # (n, hd)
                    attn_s[ll, :, h * hd:(h + 1) * hd] = o.astype(dt)
                return carry

            jax.lax.fori_loop(0, nlon, body, 0, unroll=False)

            # ONE wide proj matmul
            a = jax.lax.dot_general(
                attn_s[...].reshape(nlon * n, c), wp_ref[...],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            a = (a + bp_ref[...][None].astype(jnp.float32)).astype(dt)

            y = tail_math(a, xf, n1s_ref[...], n1b_ref[...], n2s_ref[...],
                          n2b_ref[...], w1_ref[...], b1_ref[...],
                          w2_ref[...], b2_ref[...], fast_math)
            y = y.reshape(nlon, wz, wh, ww, c).transpose(1, 2, 0, 3, 4)
            o_ref[0] = y.reshape(wz, wh, nlon * ww, c).astype(o_ref.dtype)

        return kernel

    def call(p, xs, geom, fast_math=False):
        b, z, hp, w, c = xs.shape
        wz, wh, ww = geom.window
        heads = geom.heads
        hd = c // heads
        nlat = hp // wh
        nlon = w // ww
        n = wz * wh * ww
        dt = xs.dtype

        wqkv = p["attn"]["qkv"]["kernel"].astype(dt)
        bqkv = p["attn"]["qkv"]["bias"].astype(dt)
        wp = p["attn"]["proj"]["kernel"].astype(dt)
        bp = p["attn"]["proj"]["bias"].astype(dt)
        bias = p["attn"]["bias_table"]

        spec_x = pl.BlockSpec((1, wz, wh, w, c),
                              lambda bb, zz, hh: (bb, zz, hh, 0, 0),
                              memory_space=pltpu.VMEM)
        spec_b = pl.BlockSpec((1, heads, n, n),
                              lambda bb, zz, hh: (zz * nlat + hh, 0, 0, 0),
                              memory_space=pltpu.VMEM)

        def fullspec(shape):
            return pl.BlockSpec(shape,
                                lambda bb, zz, hh: tuple(0 for _ in shape),
                                memory_space=pltpu.VMEM)

        tail = [p["norm1"]["scale"].astype(dt), p["norm1"]["bias"].astype(dt),
                p["norm2"]["scale"].astype(dt), p["norm2"]["bias"].astype(dt),
                p["mlp"]["fc1"]["kernel"].astype(dt),
                p["mlp"]["fc1"]["bias"].astype(dt),
                p["mlp"]["fc2"]["kernel"].astype(dt),
                p["mlp"]["fc2"]["bias"].astype(dt)]
        hidden = tail[4].shape[-1]

        return pl.pallas_call(
            make_kernel(heads, hd, geom.window, nlon, c, fast_math),
            out_shape=jax.ShapeDtypeStruct(xs.shape, dt),
            grid=(b, z // wz, nlat),
            in_specs=[spec_x, fullspec(wqkv.shape), fullspec(bqkv.shape),
                      fullspec(wp.shape), fullspec(bp.shape), spec_b,
                      fullspec((c,)), fullspec((c,)), fullspec((c,)),
                      fullspec((c,)), fullspec((c, hidden)),
                      fullspec((hidden,)), fullspec((hidden, c)),
                      fullspec((c,))],
            out_specs=spec_x,
            scratch_shapes=[pltpu.VMEM((nlon, n, 3 * c), dt),
                            pltpu.VMEM((nlon, n, c), dt)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=128 * 1024 * 1024),
        )(xs, wqkv, bqkv, wp, bp, bias, *tail)

    return call


def build_variant_d(chunk):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from pangu_tpu.ops.block_tail import tail_math

    def make_kernel(heads, hd, window, nlon, c, fast_math):
        wz, wh, ww = window
        n = wz * wh * ww
        scale = hd ** -0.5
        assert nlon % chunk == 0

        def kernel(x_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref, b_ref,
                   n1s_ref, n1b_ref, n2s_ref, n2b_ref,
                   w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                   qkv_s, attn_s):
            x = x_ref[0]
            xw = x.reshape(wz, wh, nlon, ww, c).transpose(2, 0, 1, 3, 4)
            xf = xw.reshape(nlon * n, c)
            dt = x.dtype

            qkv = jax.lax.dot_general(
                xf, wqkv_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            qkv = qkv + bqkv_ref[...][None].astype(jnp.float32)
            qkv_s[...] = qkv.astype(dt).reshape(nlon, n, 3 * c)

            bias = b_ref[0].astype(jnp.float32)

            def body(ll, carry):
                lo = ll * chunk
                for h in range(heads):
                    q = qkv_s[pl.ds(lo, chunk), :, h * hd:(h + 1) * hd]
                    k = qkv_s[pl.ds(lo, chunk), :,
                              c + h * hd:c + (h + 1) * hd]
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

            a = jax.lax.dot_general(
                attn_s[...].reshape(nlon * n, c), wp_ref[...],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            a = (a + bp_ref[...][None].astype(jnp.float32)).astype(dt)
            y = tail_math(a, xf, n1s_ref[...], n1b_ref[...], n2s_ref[...],
                          n2b_ref[...], w1_ref[...], b1_ref[...],
                          w2_ref[...], b2_ref[...], fast_math)
            y = y.reshape(nlon, wz, wh, ww, c).transpose(1, 2, 0, 3, 4)
            o_ref[0] = y.reshape(wz, wh, nlon * ww, c).astype(o_ref.dtype)

        return kernel

    def call(p, xs, geom, fast_math=False):
        import jax
        import jax.numpy as jnp
        b, z, hp, w, c = xs.shape
        wz, wh, ww = geom.window
        heads = geom.heads
        hd = c // heads
        nlat = hp // wh
        nlon = w // ww
        n = wz * wh * ww
        dt = xs.dtype
        wqkv = p["attn"]["qkv"]["kernel"].astype(dt)
        bqkv = p["attn"]["qkv"]["bias"].astype(dt)
        wp = p["attn"]["proj"]["kernel"].astype(dt)
        bp = p["attn"]["proj"]["bias"].astype(dt)
        bias = p["attn"]["bias_table"]
        spec_x = pl.BlockSpec((1, wz, wh, w, c),
                              lambda bb, zz, hh: (bb, zz, hh, 0, 0),
                              memory_space=pltpu.VMEM)
        spec_b = pl.BlockSpec((1, heads, n, n),
                              lambda bb, zz, hh: (zz * nlat + hh, 0, 0, 0),
                              memory_space=pltpu.VMEM)

        def fullspec(shape):
            return pl.BlockSpec(shape,
                                lambda bb, zz, hh: tuple(0 for _ in shape),
                                memory_space=pltpu.VMEM)

        tail = [p["norm1"]["scale"].astype(dt), p["norm1"]["bias"].astype(dt),
                p["norm2"]["scale"].astype(dt), p["norm2"]["bias"].astype(dt),
                p["mlp"]["fc1"]["kernel"].astype(dt),
                p["mlp"]["fc1"]["bias"].astype(dt),
                p["mlp"]["fc2"]["kernel"].astype(dt),
                p["mlp"]["fc2"]["bias"].astype(dt)]
        hidden = tail[4].shape[-1]
        return pl.pallas_call(
            make_kernel(heads, hd, geom.window, nlon, c, fast_math),
            out_shape=jax.ShapeDtypeStruct(xs.shape, dt),
            grid=(b, z // wz, nlat),
            in_specs=[spec_x, fullspec(wqkv.shape), fullspec(bqkv.shape),
                      fullspec(wp.shape), fullspec(bp.shape), spec_b,
                      fullspec((c,)), fullspec((c,)), fullspec((c,)),
                      fullspec((c,)), fullspec((c, hidden)),
                      fullspec((hidden,)), fullspec((hidden, c)),
                      fullspec((c,))],
            out_specs=spec_x,
            scratch_shapes=[pltpu.VMEM((nlon, n, 3 * c), dt),
                            pltpu.VMEM((nlon, n, c), dt)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=128 * 1024 * 1024),
        )(xs, wqkv, bqkv, wp, bp, bias, *tail)

    return call


def main():
    import jax
    import jax.numpy as jnp
    from pangu_tpu.config import PANGU_24
    from pangu_tpu.models import pangu
    import pangu_tpu.ops.earth_block_fused as EBF

    cfg = PANGU_24
    stage_idx = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    geom = cfg.stage(stage_idx)
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    bp_ = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                       params["stages"][stage_idx]["blocks"][0])

    r = np.random.default_rng(0)
    x0 = jnp.asarray(r.normal(size=(1, geom.z, geom.h_padded, geom.w,
                                    geom.dim)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    def timeit(tag, fn):
        f = jax.jit(fn, donate_argnums=0)
        t0 = time.perf_counter()
        x = jax.block_until_ready(f(x0 + 0))
        comp = time.perf_counter() - t0
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            x = f(x)
        jax.block_until_ready(x)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"stage{stage_idx} {tag:16s}: {ms:7.2f} ms  (compile {comp:.1f}s)",
              flush=True)
        return x

    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    vb = build_variant_b()
    variants = {"A": lambda x: EBF._block_v2_call(bp_, x, geom, (0, 0, 0),
                                                  0, None, False),
                "C": lambda x: vb(bp_, x, geom)}
    for ch in (5, 10, 15):
        if geom.w // geom.window[2] % ch == 0:
            variants[f"D{ch}"] = (lambda c_: lambda x: build_variant_d(c_)(
                bp_, x, geom))(ch)

    parity = which == "all"
    ya = (np.asarray(jax.jit(variants["A"])(x0), np.float32)
          if parity else None)
    for tag, fn in variants.items():
        if which not in ("all", tag):
            continue
        if parity:
            y = np.asarray(jax.jit(fn)(x0), np.float32)
            print(f"{tag}: single-app maxdiff vs A = "
                  f"{np.abs(y - ya).max():.4f}", flush=True)
        timeit(tag, fn)


if __name__ == "__main__":
    main()
