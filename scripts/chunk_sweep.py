"""Sweep lon_chunk / attn_unroll for the whole-block v2 kernel: times one
stage-0 and one stage-1 block (chained) per setting, each in a fresh
subprocess (one TPU client at a time).

Run: python scripts/chunk_sweep.py                     # sweep
     python scripts/chunk_sweep.py --one 0 10 0        # inner mode
"""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import subprocess
import sys
import time

import numpy as np


def inner(stage_idx: int, chunk: int = 10, unroll: bool = False):
    import jax
    import jax.numpy as jnp

    from pangu_tpu.config import PANGU_24
    from pangu_tpu.models import pangu
    import pangu_tpu.ops.earth_block_fused as EBF

    cfg = PANGU_24
    geom = cfg.stage(stage_idx)
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    bp = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      params["stages"][stage_idx]["blocks"][0])
    r = np.random.default_rng(0)
    x0 = jnp.asarray(r.normal(size=(1, geom.z, geom.h_padded, geom.w,
                                    geom.dim)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    f = jax.jit(lambda x: EBF._block_v2_call(bp, x, geom, (0, 0, 0), 0,
                                             None, False,
                                             chunk_target=chunk,
                                             unroll=unroll),
                donate_argnums=0)
    x = jax.block_until_ready(f(x0 + 0))
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
    jax.block_until_ready(x)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"RESULT stage{stage_idx} {ms:.2f}")


def main():
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        inner(int(sys.argv[i + 1]), int(sys.argv[i + 2]),
              bool(int(sys.argv[i + 3])))
        return
    import json
    pairs = [(5, 0), (5, 1), (10, 0), (10, 1), (15, 0),
             (30, 0), (3, 0), (2, 0), (1, 0), (1, 1)]
    if len(sys.argv) > 1:
        pairs = json.loads(sys.argv[1])
    for chunk, unroll in pairs:
        for stage in (0, 1):
            p = subprocess.run(
                [sys.executable, __file__, "--one", str(stage),
                 str(chunk), str(unroll)],
                capture_output=True, text=True)
            line = next((ln for ln in p.stdout.splitlines()
                         if ln.startswith("RESULT")), f"FAIL rc={p.returncode}")
            if "FAIL" in line:
                line += " :: " + p.stderr.strip().splitlines()[-1][:120] \
                    if p.stderr.strip() else ""
            print(f"chunk={chunk:2d} unroll={unroll} {line}", flush=True)


if __name__ == "__main__":
    main()
