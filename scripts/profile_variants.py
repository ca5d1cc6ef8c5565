"""One-process comparison of forward variants on the live TPU.

Times (within one process, per NOTES.md measurement rules):
  v2   — whole-stage fused kernels (run_stage_fused, current default)
  v1   — per-block kernels (block_noroll_fused + grid attention + tail)
  xla  — pure XLA path
Each timed inside a 5-step donated rollout on fresh inputs.
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
    import jax.numpy as jnp

    from pangu_tpu.config import PANGU_24
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.engine.rollout import make_rollout
    from pangu_tpu.models import pangu
    import pangu_tpu.ops.earth_block_fused as EBF

    STEPS = 5

    def fresh(seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.normal(size=(1, 5, 13, 721, 1440)).astype(np.float32)),
                jnp.asarray(r.normal(size=(1, 4, 721, 1440)).astype(np.float32)))

    base = dataclasses.replace(PANGU_24, param_dtype="bfloat16",
                               compute_dtype="bfloat16", remat=False)
    params = pangu.init_params(jax.random.PRNGKey(0), base)
    constants = {k: jnp.asarray(v) for k, v in synthetic_constants(base).items()}

    real_support = EBF.stage_supports_fused

    def run(tag, attn, v2):
        EBF.stage_supports_fused = real_support if v2 else (lambda sp: False)
        cfg = dataclasses.replace(base, attn_impl=attn)
        roll = make_rollout(cfg, constants, STEPS)
        u, s = fresh(0)
        t0 = time.perf_counter()
        jax.block_until_ready(roll(params, u, s))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for t in range(3):
            u, s = fresh(t + 1)
            jax.block_until_ready((u, s))
            t0 = time.perf_counter()
            jax.block_until_ready(roll(params, u, s))
            best = min(best, (time.perf_counter() - t0) / STEPS * 1e3)
        print(f"{tag:4s}: {best:8.2f} ms/step   (compile+warm {compile_s:.1f}s)",
              flush=True)
        return best

    run("v2", "pallas", True)
    run("v1", "pallas", False)
    run("xla", "xla", False)


if __name__ == "__main__":
    main()
