"""A/B: window-major whole-block kernels (ops/earth_block_wm.py) vs the
v2 rolled-storage kernels (ops/earth_block_fused.py), same process,
chained inputs.  Usage: python scripts/wm_micro.py [stage] [n_blocks]

Checks numerics first (wm chain vs fused chain on the same input), then
times per-stage chains of n_blocks alternating unshifted/shifted blocks.
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

    from pangu_tpu.config import PANGU_24
    from pangu_tpu.models import pangu
    from pangu_tpu.ops.earth_block_fused import run_stage_fused
    from pangu_tpu.ops.earth_block_wm import run_stage_wm

    stage_idx = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    cfg = PANGU_24
    geom = cfg.stage(stage_idx)
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    blocks = [jax.tree.map(lambda a: a.astype(jnp.bfloat16), b)
              for b in params["stages"][stage_idx]["blocks"]]
    while len(blocks) < n_blocks:
        blocks = blocks + blocks
    sp = {"blocks": blocks[:n_blocks]}

    r = np.random.default_rng(0)
    x0 = jnp.asarray(r.normal(size=(1, geom.z, geom.h, geom.w, geom.dim))
                     .astype(np.float32)).astype(jnp.bfloat16)

    f_fused = jax.jit(lambda x: run_stage_fused(sp, x, geom))
    f_wm = jax.jit(lambda x: run_stage_wm(sp, x, geom))

    print(f"stage {stage_idx}: z={geom.z} hp={geom.h_padded} w={geom.w} "
          f"c={geom.dim} heads={geom.heads} blocks={n_blocks}", flush=True)

    t0 = time.perf_counter()
    y_ref = jax.block_until_ready(f_fused(x0))
    print(f"fused compile {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    y_wm = jax.block_until_ready(f_wm(x0))
    print(f"wm    compile {time.perf_counter()-t0:.1f}s", flush=True)

    d = np.max(np.abs(np.asarray(y_ref, np.float32)
                      - np.asarray(y_wm, np.float32)))
    rel = d / max(1e-9, float(np.max(np.abs(np.asarray(y_ref, np.float32)))))
    print(f"maxdiff {d:.3e} (rel {rel:.3e})", flush=True)

    def timeit(tag, f):
        g = jax.jit(lambda x: f(x) * jnp.bfloat16(0.999), donate_argnums=0)
        x = jax.block_until_ready(g(x0 + 0))
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            x = g(x)
        jax.block_until_ready(x)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"{tag:12s}: {ms:7.2f} ms", flush=True)
        return ms

    # interleaved A/B, two rounds
    for _ in range(2):
        timeit("fused(v2)", lambda x: run_stage_fused(sp, x, geom))
        timeit("wm", lambda x: run_stage_wm(sp, x, geom))

    if "--decompose" in sys.argv:
        from pangu_tpu.models.layers import window_region_ids
        from pangu_tpu.ops.earth_block_wm import (_block_wm_call,
                                                  from_window_major,
                                                  to_window_major)
        from pangu_tpu.ops.earth_block_fused import _block_v2_call

        hp = geom.h_padded
        xp = jnp.pad(x0, ((0, 0), (0, 0), (0, hp - geom.h),
                          (0, 0), (0, 0)))
        xw = to_window_major(xp, geom.window)
        ids = jnp.asarray(window_region_ids(geom.z, hp, geom.window))
        bp = sp["blocks"][0]

        def t2(tag, f, x_init):
            g = jax.jit(lambda x: f(x) * jnp.bfloat16(0.999),
                        donate_argnums=0)
            x = jax.block_until_ready(g(x_init + 0))
            n = 10
            t0 = time.perf_counter()
            for _ in range(n):
                x = g(x)
            jax.block_until_ready(x)
            print(f"{tag:16s}: {(time.perf_counter()-t0)/n*1e3:7.2f} ms",
                  flush=True)

        t2("convert rt", lambda x: to_window_major(
            from_window_major(x, geom.window), geom.window), xw)
        t2("wm unshift", lambda x: _block_wm_call(
            bp, x, geom, (0, 0, 0), 0, None, False), xw)
        t2("wm shift", lambda x: _block_wm_call(
            bp, x, geom, (1, geom.window[1] // 2, geom.window[2] // 2),
            geom.window[1] // 2, ids, False), xw)
        t2("v2 unshift", lambda x: _block_v2_call(
            bp, x, geom, (0, 0, 0), 0, None, False), xp)
        t2("v2 shift", lambda x: _block_v2_call(
            bp, x, geom, (1, geom.window[1] // 2, geom.window[2] // 2),
            geom.window[1] // 2, ids, False), xp)


if __name__ == "__main__":
    main()
