"""Hardware A/B of the edge kernels (ops/embed_wm.py, ops/recovery_wm.py)
on the live TPU: compile check (real Mosaic, not interpret), correctness
vs the XLA path at full geometry, and per-piece + full-step timings.

Run AFTER scripts/transpose_probe.py confirms the lane<->sublane
transposes compile.  Timings follow the NOTES.md rules: same-process
A/B, fresh inputs per call (the backend caches repeated dispatch).

Run: python scripts/edge_ab.py
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
    from pangu_tpu.ops.earth_block_wm import to_window_major
    from pangu_tpu.ops.embed_wm import embed_wm
    from pangu_tpu.ops.recovery_wm import recovery_wm

    cfg = dataclasses.replace(PANGU_24, param_dtype="bfloat16",
                              compute_dtype="bfloat16", remat=False,
                              attn_impl="pallas")
    cfg_e = dataclasses.replace(cfg, edge_kernels=True)
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    constants = {k: jnp.asarray(v)
                 for k, v in synthetic_constants(cfg).items()}
    geom = cfg.stage(0)
    POOL = 4

    def fresh(seed):
        rr = np.random.default_rng(seed)
        return (jnp.asarray(rr.normal(size=(1, cfg.upper_vars, cfg.levels,
                                            cfg.lat, cfg.lon))
                            .astype(np.float32)),
                jnp.asarray(rr.normal(size=(1, cfg.surface_vars, cfg.lat,
                                            cfg.lon)).astype(np.float32)))

    raws = [fresh(i) for i in range(POOL)]

    def timeit(tag, fn, inputs):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        jax.block_until_ready(f(params, constants, *inputs[0]))
        print(f"{tag:18s}: compiled in {time.perf_counter() - t0:6.1f}s",
              flush=True)
        jax.block_until_ready(f(params, constants, *inputs[1]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for x in inputs:
                out = f(params, constants, *x)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / len(inputs) * 1e3)
        print(f"{tag:18s}: {best:8.2f} ms", flush=True)
        return best

    bf = jnp.bfloat16

    # ---- piece 1: embed (XLA conv + to_wm  vs  embed_wm kernel) --------
    def embed_xla(p, c, u, s):
        x = L.patch_embed(p["patch_embed"], u.astype(bf), s.astype(bf), c,
                          cfg)
        return to_window_major(
            jnp.pad(x, ((0, 0), (0, 0), (0, geom.h_padded - x.shape[2]),
                        (0, 0), (0, 0))), geom.window)

    def embed_pallas(p, c, u, s):
        return embed_wm(p["patch_embed"], u, s, c, cfg)

    a = timeit("embed xla+towm", embed_xla, raws)
    b = timeit("embed_wm kernel", embed_pallas, raws)
    xe = jax.jit(embed_xla)(params, constants, *raws[0])
    pe = jax.jit(embed_pallas)(params, constants, *raws[0])
    err = float(jnp.max(jnp.abs(xe.astype(jnp.float32)
                                - pe.astype(jnp.float32))))
    print(f"embed maxdiff {err:.4f} (bf16 units)  speedup {a / b:.2f}x",
          flush=True)

    # ---- piece 2: recovery (canon + XLA recover  vs  recovery_wm) ------
    g3 = cfg.stage(3)
    off = (1, 3, 6)
    rr = np.random.default_rng(99)
    sk_c = jnp.asarray(rr.normal(size=(1, g3.z, g3.h_padded, g3.w, g3.dim))
                       .astype(np.float32)).astype(bf)
    dc_c = jnp.asarray(rr.normal(size=(1, g3.z, g3.h_padded, g3.w, g3.dim))
                       .astype(np.float32)).astype(bf)
    sk_s = to_window_major(jnp.roll(sk_c, tuple(-o for o in off),
                                    axis=(1, 2, 3)), g3.window)
    dc_s = to_window_major(jnp.roll(dc_c, tuple(-o for o in off),
                                    axis=(1, 2, 3)), g3.window)

    from pangu_tpu.ops.earth_block_wm import from_window_major

    def rec_xla(p, c, a_, b_):
        def canon(t):
            t = from_window_major(t, g3.window)
            return jnp.roll(t, off, axis=(1, 2, 3))[:, :, :g3.h]
        return L.patch_recovery(p["patch_recovery"], (canon(a_), canon(b_)),
                                cfg)

    def rec_pallas(p, c, a_, b_):
        return recovery_wm(p["patch_recovery"], a_, b_, off, cfg)

    # perturb inputs per call to defeat dispatch caching
    recs = [(sk_s + jnp.bfloat16(i * 1e-3), dc_s) for i in range(POOL)]
    a = timeit("recover canon+xla", rec_xla, recs)
    b = timeit("recovery_wm", rec_pallas, recs)
    xu, xs_ = jax.jit(rec_xla)(params, constants, *recs[0])
    pu, ps_ = jax.jit(rec_pallas)(params, constants, *recs[0])
    err_u = float(jnp.max(jnp.abs(xu.astype(jnp.float32)
                                  - pu.astype(jnp.float32))))
    err_s = float(jnp.max(jnp.abs(xs_.astype(jnp.float32)
                                  - ps_.astype(jnp.float32))))
    print(f"recovery maxdiff upper {err_u:.4f} surf {err_s:.4f}  "
          f"speedup {a / b:.2f}x", flush=True)

    # ---- full cold step: edge_kernels off vs on -------------------------
    def full_off(p, c, u, s):
        return pangu.forward(p, u, s, c, cfg)

    def full_on(p, c, u, s):
        return pangu.forward(p, u, s, c, cfg_e)

    a = timeit("cold step (off)", full_off, raws)
    b = timeit("cold step (edge)", full_on, raws)
    ou = jax.jit(full_off)(params, constants, *raws[0])[0]
    eu = jax.jit(full_on)(params, constants, *raws[0])[0]
    err = float(jnp.max(jnp.abs(ou.astype(jnp.float32)
                                - eu.astype(jnp.float32))))
    print(f"cold step maxdiff {err:.4f}  {a:.1f} -> {b:.1f} ms "
          f"({a - b:+.1f})", flush=True)


if __name__ == "__main__":
    main()
