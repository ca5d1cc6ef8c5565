"""A/B: lat-grouped interior wm kernels (gh windows/program) on a full
wm-io stage chain, same process, chained inputs.
Usage: python scripts/latgroup_ab.py [stage=1] [n_blocks=12] [ghs=1,4]
``ghs`` is a comma list of groupings to compare; gh=1 (the ungrouped
kernel) is always included as the equivalence anchor for the maxdiff
check — it is prepended automatically if omitted from the list.
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
    from pangu_tpu.ops.earth_block_wm import run_stage_wm, to_window_major

    stage_idx = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    ghs = ([int(g) for g in sys.argv[3].split(",")]
           if len(sys.argv) > 3 else [1, 4])
    if 1 not in ghs:
        # gh=1 is the ungrouped ground truth; without it the maxdiff
        # check would anchor on a grouped variant and a bug shared by
        # all grouped kernels would pass silently.
        ghs = [1] + ghs

    cfg = PANGU_24
    geom = cfg.stage(stage_idx)
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    blocks = [jax.tree.map(lambda a: a.astype(jnp.bfloat16), b)
              for b in params["stages"][stage_idx]["blocks"]]
    while len(blocks) < n_blocks:
        blocks = blocks + blocks
    sp = {"blocks": blocks[:n_blocks]}

    r = np.random.default_rng(0)
    hp = geom.h_padded
    x0 = jnp.asarray(r.normal(size=(1, geom.z, hp, geom.w, geom.dim))
                     .astype(np.float32)).astype(jnp.bfloat16)
    xw0 = to_window_major(x0, geom.window)

    def chain(g):
        def f(xs):
            ys, off = run_stage_wm(sp, xs, geom, io_layout="wm",
                                   lat_group=g)
            return ys * jnp.bfloat16(0.999)
        return f

    print(f"stage {stage_idx}: blocks={n_blocks} nlat={hp//6} ghs={ghs}",
          flush=True)

    fns = {}
    for g in ghs:
        fns[g] = jax.jit(chain(g), donate_argnums=0)
        t0 = time.perf_counter()
        jax.block_until_ready(fns[g](xw0 + 0))
        print(f"gh={g} compile {time.perf_counter()-t0:.1f}s", flush=True)

    y1 = np.asarray(jax.block_until_ready(fns[ghs[0]](xw0 + 0)), np.float32)
    for g in ghs[1:]:
        yg = np.asarray(jax.block_until_ready(fns[g](xw0 + 0)), np.float32)
        d = np.max(np.abs(y1 - yg))
        print(f"maxdiff gh={ghs[0]} vs gh={g}: {d:.3e}", flush=True)

    for _ in range(2):
        for g in ghs:
            x = jax.block_until_ready(fns[g](xw0 + 0))
            n = 10
            t0 = time.perf_counter()
            for _ in range(n):
                x = fns[g](x)
            jax.block_until_ready(x)
            print(f"gh={g}: {(time.perf_counter()-t0)/n*1e3:7.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
