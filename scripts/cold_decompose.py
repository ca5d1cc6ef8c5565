"""Cold single-step decomposition on the live TPU: the forward() wm fast
path piece by piece — embed, to_window_major, wm trunk, canon x2,
patch_recovery — plus the full step for cross-check.

params/constants ride as jit ARGUMENTS (closing over them inlines ~67 MB
of literals and blows the remote-compile request size).

Run: PYTHONPATH=/root/repo python scripts/cold_decompose.py
"""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import dataclasses
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      _os.path.join(_REPO_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pangu_tpu.config import PANGU_24
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.models import layers as L
    from pangu_tpu.models import pangu
    from pangu_tpu.ops.earth_block_wm import (from_window_major,
                                              to_window_major)

    cfg = dataclasses.replace(PANGU_24, param_dtype="bfloat16",
                              compute_dtype="bfloat16", remat=False,
                              attn_impl="pallas")
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    constants = {k: jnp.asarray(v)
                 for k, v in synthetic_constants(cfg).items()}
    geom = cfg.stage(0)
    POOL = 5
    bf = jnp.bfloat16

    def timeit(tag, fn, inputs):
        f = jax.jit(fn)
        jax.block_until_ready(f(params, constants, *inputs[0]))
        jax.block_until_ready(f(params, constants, *inputs[1 % len(inputs)]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for x in inputs:
                out = f(params, constants, *x)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / len(inputs) * 1e3)
        print(f"{tag:16s}: {best:8.2f} ms", flush=True)
        return best

    def fresh_raw(seed):
        rr = np.random.default_rng(seed)
        return (jnp.asarray(rr.normal(size=(1, cfg.upper_vars, cfg.levels,
                                            cfg.lat, cfg.lon))
                            .astype(np.float32)),
                jnp.asarray(rr.normal(size=(1, cfg.surface_vars, cfg.lat,
                                            cfg.lon)).astype(np.float32)))

    raws = [fresh_raw(i) for i in range(POOL)]

    def full(p, c, u, s):
        return pangu.forward(p, u, s, c, cfg)
    timeit("full fwd", full, raws)

    def embed(p, c, u, s):
        return L.patch_embed(p["patch_embed"], u.astype(bf),
                             s.astype(bf), c, cfg)
    timeit("embed", embed, raws)

    def embed_towm(p, c, u, s):
        x = L.patch_embed(p["patch_embed"], u.astype(bf),
                          s.astype(bf), c, cfg)
        return to_window_major(
            jnp.pad(x, ((0, 0), (0, 0), (0, geom.h_padded - x.shape[2]),
                        (0, 0), (0, 0))), geom.window)
    timeit("embed+to_wm", embed_towm, raws)

    jemb = jax.jit(embed_towm)
    xss = [jemb(params, constants, *rw) for rw in raws]
    jax.block_until_ready(xss)

    def trunk(p, c, xs):
        return pangu.forward_core_wm(p, xs, cfg)
    timeit("wm trunk", trunk, [(x,) for x in xss])

    def trunk_canon(p, c, xs):
        skip, dec, off = pangu.forward_core_wm(p, xs, cfg)

        def canon(t):
            t = from_window_major(t, geom.window)
            return jnp.roll(t, off, axis=(1, 2, 3))[:, :, :geom.h]

        return canon(skip), canon(dec)
    timeit("trunk+canon2", trunk_canon, [(x,) for x in xss])

    jtc = jax.jit(trunk_canon)
    pairs = [jtc(params, constants, x) for x in xss]
    jax.block_until_ready(pairs)

    def recov(p, c, skip, dec):
        return L.patch_recovery(p["patch_recovery"], (skip, dec), cfg)
    timeit("recovery", recov, pairs)


if __name__ == "__main__":
    main()
