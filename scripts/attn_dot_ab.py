"""A/B the attention-dot formulation inside a wm-shaped pallas kernel.

The s-dot currently contracts q (chunk, n, hd) with k (chunk, n, hd) on
the LANE dim of k — the MXU wants the stationary operand's contraction on
SUBLANES, so Mosaic inserts an internal relayout of k per dot.  Variants
pre-transpose k into a (chunk, hd, n)-tiled scratch (one explicit batched
transpose after the qkv matmul) so both dot operands are MXU-native.

Measures a dots-only kernel (qkv matmul + s/o dots + softmax, no
tail/proj) per variant on real window geometry, same process, chained
inputs.  Usage: python scripts/attn_dot_ab.py [stage=1] [iters=30]
"""

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      _os.path.join(_REPO_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pangu_tpu.config import PANGU_24
    from pangu_tpu.ops.earth_block_fused import _lon_chunk

    stage_idx = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    cfg = PANGU_24
    geom = cfg.stage(stage_idx)
    wz, wh, ww = geom.window
    n = wz * wh * ww
    c = geom.dim
    heads = geom.heads
    hd = c // heads
    hp = geom.h_padded
    nz, nlat, nlon = geom.z // wz, hp // wh, geom.w // ww
    chunk = _lon_chunk(nlon)
    scale = hd ** -0.5
    print(f"stage {stage_idx}: c={c} heads={heads} n={n} nz={nz} "
          f"nlat={nlat} nlon={nlon} chunk={chunk}", flush=True)

    def make_kernel(variant):
        def kernel(x_ref, wqkv_ref, bqkv_ref, b_ref, o_ref, qkv_s, kt_s,
                   attn_s):
            x = x_ref[0, 0, 0]
            dt = x.dtype
            xf = x.reshape(nlon * n, c)
            qkv = jax.lax.dot_general(
                xf, wqkv_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            qkv = qkv + bqkv_ref[...][None].astype(jnp.float32)
            qkv_s[...] = qkv.astype(dt).reshape(nlon, n, 3 * c)
            bias = b_ref[0].astype(jnp.float32)

            if variant == "kt_scratch":
                # one batched lane<->sublane transpose of ALL heads' k
                def tbody(ll, carry):
                    lo = ll * chunk
                    kt_s[pl.ds(lo, chunk)] = jnp.transpose(
                        qkv_s[pl.ds(lo, chunk), :, c:2 * c], (0, 2, 1))
                    return carry
                jax.lax.fori_loop(0, nlon // chunk, tbody, 0, unroll=False)

            def body(ll, carry):
                lo = ll * chunk
                for h in range(heads):
                    q = qkv_s[pl.ds(lo, chunk), :, h * hd:(h + 1) * hd]
                    v = qkv_s[pl.ds(lo, chunk), :,
                              2 * c + h * hd:2 * c + (h + 1) * hd]
                    if variant == "base":
                        k = qkv_s[pl.ds(lo, chunk), :,
                                  c + h * hd:c + (h + 1) * hd]
                        s = jax.lax.dot_general(
                            q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
                    elif variant == "kt_inline":
                        k = qkv_s[pl.ds(lo, chunk), :,
                                  c + h * hd:c + (h + 1) * hd]
                        kt = jnp.transpose(k, (0, 2, 1))
                        s = jax.lax.dot_general(
                            q, kt, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
                    else:  # kt_scratch
                        kt = kt_s[pl.ds(lo, chunk),
                                  h * hd:(h + 1) * hd, :]
                        s = jax.lax.dot_general(
                            q, kt, (((2,), (1,)), ((0,), (0,))),
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
            o_ref[0, 0, 0] = attn_s[...]

        return kernel

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, nz, nlat, nlon, n, c))
                    .astype(np.float32)).astype(jnp.bfloat16)
    wqkv = jnp.asarray(rng.normal(size=(c, 3 * c)).astype(np.float32)
                       ).astype(jnp.bfloat16) * 0.05
    bqkv = jnp.zeros((3 * c,), jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(nz * nlat, heads, n, n))
                       .astype(np.float32)).astype(jnp.bfloat16) * 0.1

    def build(variant):
        xspec = pl.BlockSpec((1, 1, 1, nlon, n, c),
                             lambda bb, zz, hh: (bb, zz, hh, 0, 0, 0),
                             memory_space=pltpu.VMEM)

        def fullspec(shape):
            return pl.BlockSpec(shape,
                                lambda bb, zz, hh: tuple(0 for _ in shape),
                                memory_space=pltpu.VMEM)

        spec_b = pl.BlockSpec((1, heads, n, n),
                              lambda bb, zz, hh: (zz * nlat + hh, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            make_kernel(variant),
            out_shape=jax.ShapeDtypeStruct((1, nz, nlat, nlon, n, c),
                                           jnp.bfloat16),
            grid=(1, nz, nlat),
            in_specs=[xspec, fullspec((c, 3 * c)), fullspec((3 * c,)),
                      spec_b],
            out_specs=xspec,
            scratch_shapes=[pltpu.VMEM((nlon, n, 3 * c), jnp.bfloat16),
                            pltpu.VMEM((nlon, c, n), jnp.bfloat16),
                            pltpu.VMEM((nlon, n, c), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=128 * 1024 * 1024))
        return jax.jit(lambda a: f(a, wqkv, bqkv, bias) * jnp.bfloat16(0.5),
                       donate_argnums=0)

    outs = {}
    fns = {}
    for variant in ("base", "kt_inline", "kt_scratch"):
        try:
            t0 = time.perf_counter()
            fns[variant] = build(variant)
            y = jax.block_until_ready(fns[variant](x + 0))
            print(f"{variant}: compile {time.perf_counter() - t0:.1f}s",
                  flush=True)
            outs[variant] = np.asarray(y, np.float32)
        except Exception as e:
            print(f"{variant}: FAIL {str(e).splitlines()[0][:140]}",
                  flush=True)

    base = outs.get("base")
    for variant, y in outs.items():
        if base is not None and variant != "base":
            print(f"maxdiff base vs {variant}: "
                  f"{np.max(np.abs(base - y)):.3e}", flush=True)

    for _ in range(2):
        for variant, f in fns.items():
            xx = jax.block_until_ready(f(x + 0))
            t0 = time.perf_counter()
            for _ in range(iters):
                xx = f(xx)
            jax.block_until_ready(xx)
            print(f"{variant}: {(time.perf_counter() - t0) / iters * 1e3:7.3f}"
                  f" ms", flush=True)


if __name__ == "__main__":
    main()
