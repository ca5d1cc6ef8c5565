"""A/B the rollout step latency: canonical loop vs token-space chaining,
one process, 10-step rollouts on fresh inputs (bench.py methodology)."""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import dataclasses
import time

import numpy as np

STEPS = 10


def main():
    import jax
    import jax.numpy as jnp

    from pangu_tpu.config import PANGU_24
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.engine.rollout import make_rollout
    from pangu_tpu.models import pangu

    cfg = dataclasses.replace(PANGU_24, param_dtype="bfloat16",
                              compute_dtype="bfloat16", remat=False,
                              attn_impl="pallas")
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    constants = {k: jnp.asarray(v)
                 for k, v in synthetic_constants(cfg).items()}

    def fresh(seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.normal(size=(1, 5, 13, 721, 1440)
                                     ).astype(np.float32)),
                jnp.asarray(r.normal(size=(1, 4, 721, 1440)
                                     ).astype(np.float32)))

    results = {}
    for tag, kw in [("canonical", {}), ("token", {"token_space": True}),
                    ("canonical2", {}), ("token2", {"token_space": True})]:
        roll = make_rollout(cfg, constants, STEPS, **kw)
        u, s = fresh(0)
        t0 = time.perf_counter()
        jax.block_until_ready(roll(params, u, s))
        comp = time.perf_counter() - t0
        best = float("inf")
        for t in range(3):
            u, s = fresh(t + 1)
            jax.block_until_ready((u, s))
            t0 = time.perf_counter()
            out = roll(params, u, s)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / STEPS * 1e3)
        results[tag] = best
        print(f"{tag:12s}: {best:8.2f} ms/step (compile+warm {comp:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
