"""Probe Mosaic support for 2-D lane<->sublane transposes on the real TPU.

The planned patch-embed / patch-recovery kernels need ONE lane-changing
op per tile: (48, 1536) -> (1536, 48) (embed) and (768, 256) -> (256, 768)
(recovery). Everything else in those kernels uses verified patterns
(sublane transposes/reshapes, lane-offset slices, MXU dots). Interpret
mode accepts transposes that real Mosaic may reject (NOTES.md round-2
lesson), so each candidate is compiled AND timed on hardware here.

Run: python scripts/transpose_probe.py
"""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import time
import traceback


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import numpy as np

    rng = np.random.default_rng(0)

    def run(name, make_kernel, in_shape, out_shape, dtype, iters=50,
            reps=1):
        x = jnp.asarray(rng.normal(size=in_shape).astype(np.float32)
                        ).astype(dtype)
        try:
            f = pl.pallas_call(
                make_kernel(),
                out_shape=jax.ShapeDtypeStruct(out_shape, dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024))
            f = jax.jit(f)
            y = jax.block_until_ready(f(x))
            # correctness spot check vs numpy where the kernel is a pure
            # transpose
            t0 = time.perf_counter()
            for _ in range(iters):
                y = f(x)
            jax.block_until_ready(y)
            dt = (time.perf_counter() - t0) / iters * 1e6
            print(f"OK   {name}: {dt:8.1f} us/call ({reps} transposes)",
                  flush=True)
            return True
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"FAIL {name}: {msg}", flush=True)
            return False

    bf = jnp.bfloat16

    # 1. the embed tile: (48, 1536) -> (1536, 48), bf16
    def k_embed():
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...].T
        return k

    run("T (48,1536)->(1536,48) bf16", k_embed, (48, 1536), (1536, 48), bf)

    # 2. the recovery tile: (768, 256) -> (256, 768), bf16
    run("T (768,256)->(256,768) bf16", k_embed, (768, 256), (256, 768), bf)

    # 3. f32 variants (accumulators may live in f32)
    run("T (48,1536) f32", k_embed, (48, 1536), (1536, 48), jnp.float32)
    run("T (768,256) f32", k_embed, (768, 256), (256, 768), jnp.float32)

    # 4. unaligned lanes: (48, 1440) -> (1440, 48) — would skip the lon pad
    run("T (48,1440)->(1440,48) bf16", k_embed, (48, 1440), (1440, 48), bf)

    # 5. 3-D batched: (4, 360, 48) -> (4, 48, 360)-style minor transpose
    def k_3d():
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...].transpose(0, 2, 1)
        return k

    run("T3 (4,384,48)->(4,48,384) bf16", k_3d, (4, 384, 48), (4, 48, 384),
        bf)

    # 6. realistic embed-tile pipeline: transpose + sublane reshape +
    #    4 woff-slices + 4 small dots (the full inner loop, one tile)
    def k_pipe():
        def k(x_ref, w_ref, o_ref):
            t = x_ref[...].T                       # (1536, 48)
            t = t.reshape(384, 4, 48)
            acc = None
            for wo in range(4):
                part = jax.lax.dot_general(
                    t[:, wo, :], w_ref[wo],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
            o_ref[...] = acc.astype(o_ref.dtype)
        return k

    x = jnp.asarray(rng.normal(size=(48, 1536)).astype(np.float32)
                    ).astype(bf)
    w = jnp.asarray(rng.normal(size=(4, 48, 192)).astype(np.float32)
                    ).astype(bf)
    try:
        f = jax.jit(pl.pallas_call(
            k_pipe(),
            out_shape=jax.ShapeDtypeStruct((384, 192), bf),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)))
        y = jax.block_until_ready(f(x, w))
        # check math vs numpy
        xr = np.asarray(x.astype(jnp.float32)).T.reshape(384, 4, 48)
        ref = sum(xr[:, wo] @ np.asarray(w[wo].astype(jnp.float32))
                  for wo in range(4))
        err = float(np.max(np.abs(ref - np.asarray(y.astype(jnp.float32)))))
        t0 = time.perf_counter()
        for _ in range(50):
            y = f(x, w)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / 50 * 1e6
        print(f"OK   embed-tile pipeline: {dt:8.1f} us/call, maxerr={err:.3f}",
              flush=True)
    except Exception as e:
        print(f"FAIL embed-tile pipeline: {str(e).splitlines()[0][:140]}",
              flush=True)

    # 7. permutation-matmul lane interleave (recovery): (40,384)@(384,1440)
    def k_perm():
        def k(a_ref, s_ref, o_ref):
            acc = jax.lax.dot_general(
                a_ref[...], s_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[...] = acc.astype(o_ref.dtype)
        return k

    a = jnp.asarray(rng.normal(size=(40, 384)).astype(np.float32)).astype(bf)
    sel = np.zeros((384, 1440), np.float32)
    for wt in range(360):
        sel[wt, 4 * wt] = 1.0
    sel = jnp.asarray(sel).astype(bf)
    try:
        f = jax.jit(pl.pallas_call(
            k_perm(),
            out_shape=jax.ShapeDtypeStruct((40, 1440), bf),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)))
        y = jax.block_until_ready(f(a, sel))
        t0 = time.perf_counter()
        for _ in range(50):
            y = f(a, sel)
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / 50 * 1e6
        print(f"OK   perm-matmul (40,384)@(384,1440): {dt:8.1f} us/call",
              flush=True)
    except Exception as e:
        print(f"FAIL perm-matmul: {str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
