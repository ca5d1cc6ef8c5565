"""Per-piece forward latency decomposition on the live TPU.

Times each stage of the full-size bf16 pallas forward in isolation:
embed, stage0..3 (whole-stage fused kernels), downsample, upsample,
patch recovery, plus the full forward for cross-check. Each piece is
timed over a pool of distinct pre-staged inputs (the backend returns
cached results for repeated dispatch on identical buffers).

Run: PYTHONPATH=/root/repo python scripts/fwd_decompose.py
"""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import dataclasses
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pangu_tpu.config import PANGU_24
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.models import layers as L
    from pangu_tpu.models import pangu
    from pangu_tpu.ops.earth_block_fused import run_stage_fused

    cfg = dataclasses.replace(PANGU_24, param_dtype="bfloat16",
                              compute_dtype="bfloat16", remat=False,
                              attn_impl="pallas")
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    constants = {k: jnp.asarray(v)
                 for k, v in synthetic_constants(cfg).items()}
    r = np.random.default_rng(0)
    POOL = 6

    def timeit(tag, fn, inputs):
        f = jax.jit(fn)
        jax.block_until_ready(f(inputs[0]))          # compile
        # warm second distinct buffer (rules out per-buffer setup)
        jax.block_until_ready(f(inputs[1 % len(inputs)]))
        reps = 3
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for x in inputs:
                out = f(x)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / len(inputs) * 1e3)
        print(f"{tag:14s}: {best:8.2f} ms", flush=True)
        return best

    bf = jnp.bfloat16
    g0, g1 = cfg.stage(0), cfg.stage(1)

    def rand(shape):
        return jnp.asarray(r.normal(size=shape).astype(np.float32)).astype(bf)

    total = 0.0

    # ---- embed ----
    ups = [jnp.asarray(r.normal(size=(1, 5, 13, 721, 1440)).astype(np.float32))
           for _ in range(POOL)]
    sfc = jnp.asarray(r.normal(size=(1, 4, 721, 1440)).astype(np.float32))
    total += timeit("embed", lambda u: L.patch_embed(
        params["patch_embed"], u.astype(bf), sfc.astype(bf), constants, cfg),
        ups)

    # ---- stages ----
    x0s = [rand((1, g0.z, g0.h, g0.w, g0.dim)) for _ in range(POOL)]
    x1s = [rand((1, g1.z, g1.h, g1.w, g1.dim)) for _ in range(POOL)]
    total += timeit("stage0", lambda x: run_stage_fused(
        params["stages"][0], x, g0, fast_math=cfg.fast_math), x0s)
    total += timeit("downsample", lambda x: L.down_sample(
        params["downsample"], x), x0s)
    total += timeit("stage1", lambda x: run_stage_fused(
        params["stages"][1], x, g1, fast_math=cfg.fast_math), x1s)
    total += timeit("stage2", lambda x: run_stage_fused(
        params["stages"][2], x, g1, fast_math=cfg.fast_math), x1s)
    total += timeit("upsample", lambda x: L.up_sample(
        params["upsample"], x, cfg.h_tokens), x1s)
    total += timeit("stage3", lambda x: run_stage_fused(
        params["stages"][3], x, g0, fast_math=cfg.fast_math), x0s)

    # ---- fused down/up kernels (vs the XLA rows above) ----
    from pangu_tpu.ops.updown import down_sample_fused, up_sample_fused
    timeit("down (pallas)", lambda x: down_sample_fused(
        params["downsample"], x), x0s)
    timeit("up (pallas)", lambda x: up_sample_fused(
        params["upsample"], x, cfg.h_tokens), x1s)

    # ---- recovery (takes the 2C concat) ----
    xcat = [rand((1, g0.z, g0.h, g0.w, 2 * g0.dim)) for _ in range(POOL)]
    total += timeit("recovery", lambda x: L.patch_recovery(
        params["patch_recovery"], x, cfg), xcat)

    # ---- token-space transition ----
    from pangu_tpu.engine.transition import apply_transition, build_transition
    tp = jax.jit(lambda p: build_transition(p, constants, cfg))(params)
    jax.block_until_ready(tp)
    timeit("transition", lambda x: apply_transition(tp, x), xcat)

    print(f"{'sum':14s}: {total:8.2f} ms", flush=True)

    # ---- full forward cross-check ----
    def full(u):
        return pangu.forward(params, u, sfc, constants, cfg,
                             deterministic=True)

    timeit("full forward", full, ups)


if __name__ == "__main__":
    main()
