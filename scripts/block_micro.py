"""Micro-bench: one unshifted whole-block kernel at stage-0 full geometry,
v1 (block_noroll_fused, unrolled batched dot_general) vs v2
(_block_v2_call, fori_loop) vs v2 with partial unroll. Chained calls
(x = f(x)) so the backend cannot cache results."""

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
    import jax.numpy as jnp

    from pangu_tpu.config import PANGU_24
    from pangu_tpu.models import pangu
    import pangu_tpu.ops.earth_block_fused as EBF
    import pangu_tpu.ops.window_attention as WA

    cfg = PANGU_24
    geom = cfg.stage(0)
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      params["stages"][0]["blocks"][0])

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
        print(f"{tag:24s}: {ms:7.2f} ms  (compile {comp:.1f}s)", flush=True)

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("all", "v2"):
        timeit("v2 fori_loop",
               lambda x: EBF._block_v2_call(bp, x, geom, (0, 0, 0), 0, None,
                                            False))
    if which in ("all", "v2u"):
        for u in (2, 5):
            EBF._UNROLL = u
            timeit(f"v2 unroll={u}",
                   lambda x: EBF._block_v2_call(bp, x, geom, (0, 0, 0), 0,
                                                None, False))
        EBF._UNROLL = 1
    if which in ("all", "v1"):
        timeit("v1 unrolled batch",
               lambda x: WA.block_noroll_fused(bp, x, geom.heads,
                                               geom.window))


if __name__ == "__main__":
    main()
