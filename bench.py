"""Benchmark: full-size Pangu-Weather 24h forecast step latency on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the speedup vs the 150 ms north-star target
(BASELINE.json "north_star", defined for v5p-8; this measures whatever
single chip is attached).
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np

BASELINE_MS = 150.0


def main():
    import jax
    import jax.numpy as jnp

    from pangu_tpu.config import PANGU_24
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.models import pangu

    cfg = dataclasses.replace(PANGU_24, param_dtype="bfloat16",
                              compute_dtype="bfloat16", remat=False,
                              attn_impl="pallas")
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    constants = {k: jnp.asarray(v)
                 for k, v in synthetic_constants(cfg).items()}

    rng = np.random.default_rng(0)
    upper = jnp.asarray(rng.normal(
        size=(1, cfg.upper_vars, cfg.levels, cfg.lat, cfg.lon)
    ).astype(np.float32))
    surface = jnp.asarray(rng.normal(
        size=(1, cfg.surface_vars, cfg.lat, cfg.lon)).astype(np.float32))

    @jax.jit
    def step(params, upper, surface):
        return pangu.forward(params, upper, surface, constants, cfg,
                             deterministic=True)

    # warmup / compile
    u, s = step(params, upper, surface)
    jax.block_until_ready((u, s))

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        u, s = step(params, upper, surface)
    jax.block_until_ready((u, s))
    ms = (time.perf_counter() - t0) / iters * 1e3

    print(json.dumps({
        "metric": "pangu24_forward_step_latency",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
