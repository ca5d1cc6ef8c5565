"""Benchmark: full-size Pangu-Weather 24h forecast step latency on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the speedup vs the 150 ms v5p-8 north-star target
(BASELINE.json); this measures whatever single chip is attached.

Methodology: the step is timed inside a 10-iteration autoregressive
rollout (lax.scan with donated state) on fresh inputs — chained data
dependencies make every step's work real (no result caching) and this is
the serving-relevant access pattern (inference/inference_singleOutput.py's
multi-day loop in the reference).

Outage hardening (the TPU tunnel has documented multi-hour outages where
backend init hangs ~20-25 min): the parent process NEVER imports jax.
It first probes the backend in a strictly timeout-bounded subprocess;
if the probe can't produce a backend inside PROBE_TIMEOUT_S (twice),
it prints a structured error JSON and exits — total wall clock on the
outage path is ~5 minutes, never a driver-side rc=124. Measurement
attempts are each bounded too, with a cheap re-probe between retries.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

BASELINE_MS = 150.0
STEPS = 10
PROBE_TIMEOUT_S = 150      # backend init hangs ~20 min when the tunnel is
                           # down; a healthy init answers in < 30 s
WARM_TIMEOUT_S = 1500      # per-program compile+cache budget (remote
                           # compile of one full-geometry program has been
                           # observed at ~19 min on a degraded tunnel)
# Per-metric measurement budgets (each metric runs in its OWN bounded
# subprocess from a warm compile cache, so a slow secondary can never
# sink the primary; trace + cache-load of one full-geometry program is
# minutes even when fully cached)
MEASURE_TIMEOUT_S = {"rollout": 700, "single": 700, "batch4": 1300}
# batch4 r03 field data: warm-cache setup + first batched rollout missed
# a 700 s budget twice (the batched programs load/compile slower than
# they run); 1300 s keeps the worst case bounded while fitting the
# observed ~330 s warm + timed iterations

_METRIC = "pangu24_forward_step_latency"


def _error_json(msg: str) -> str:
    return json.dumps({"metric": _METRIC, "value": None, "unit": "ms",
                       "vs_baseline": None, "error": msg})


def probe_backend(timeout_s: float) -> str | None:
    """Ask a fresh interpreter for jax.default_backend(), hard-bounded.
    Returns the backend name, or None on timeout/failure."""
    code = "import jax; print('BACKEND=' + jax.default_backend())"
    try:
        proc = subprocess.run([sys.executable, "-u", "-c", code],
                              capture_output=True, text=True,
                              timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None
    for ln in proc.stdout.splitlines():
        if ln.startswith("BACKEND="):
            return ln.split("=", 1)[1].strip()
    return None


def main_with_retries() -> int:
    """Probe-gated, wall-clock-bounded measurement. Always prints exactly
    one JSON line (result or structured error) before returning."""
    t_start = time.monotonic()
    backend = probe_backend(PROBE_TIMEOUT_S)
    if backend is None:
        sys.stderr.write("[bench] backend probe 1 failed; re-probing\n")
        backend = probe_backend(PROBE_TIMEOUT_S)
    if backend is None:
        print(_error_json(
            f"jax backend unavailable: two init probes exceeded "
            f"{PROBE_TIMEOUT_S}s each (TPU tunnel outage?)"))
        return 0
    sys.stderr.write(f"[bench] backend={backend}\n")

    # ---- incremental cache warm-up --------------------------------------
    # The three timed programs (rollout, cold single step, batch-4 rollout)
    # each cost minutes of remote compile when uncached.  A single attempt
    # budget can cover at most ONE such compile, so warm them one program
    # per bounded subprocess: every compile that completes persists in the
    # cache even if a later one times out, and the measurement attempts
    # below then start fully cached.  Warm failures are non-fatal.
    for prog in ("rollout", "single", "batch4"):
        t0 = time.monotonic()
        try:
            wp = subprocess.run(
                [sys.executable, "-u", __file__, "--warm", prog],
                capture_output=True, text=True, timeout=WARM_TIMEOUT_S)
            status = f"rc={wp.returncode}"
            if wp.returncode != 0:
                sys.stderr.write(wp.stdout[-1500:] + wp.stderr[-2500:] + "\n")
        except subprocess.TimeoutExpired:
            status = "timed out"
        sys.stderr.write(f"[bench] warm {prog}: {status} "
                         f"({time.monotonic() - t0:.0f}s)\n")
        if status != "rc=0" and probe_backend(120) is None:
            print(_error_json(
                f"backend lost during cache warm-up ({prog}: {status})"))
            return 0

    # ---- per-metric measurement: each metric gets its own bounded
    # subprocess (2 tries), so a slow/failed secondary can never cost the
    # primary its result ---------------------------------------------------
    results: dict = {}
    last_failure = "unknown"
    for prog in ("rollout", "single", "batch4"):
        budget = MEASURE_TIMEOUT_S[prog]
        for attempt in range(2):
            try:
                proc = subprocess.run(
                    [sys.executable, "-u", __file__, "--measure", prog],
                    capture_output=True, text=True, timeout=budget)
            except subprocess.TimeoutExpired:
                sys.stderr.write(f"[bench] measure {prog} try {attempt + 1} "
                                 f"timed out ({budget}s)\n")
                last_failure = f"{prog} timed out after {budget}s"
                proc = None
            if proc is not None:
                line = next((ln for ln in proc.stdout.splitlines()
                             if ln.startswith('{"value"')), None)
                if proc.returncode == 0 and line:
                    results[prog] = json.loads(line)["value"]
                    sys.stderr.write(f"[bench] measure {prog}: "
                                     f"{results[prog]}\n")
                    break
                sys.stderr.write(
                    f"[bench] measure {prog} try {attempt + 1} failed "
                    f"(rc={proc.returncode})\n" + proc.stdout[-1500:]
                    + proc.stderr[-2500:] + "\n")
                last_failure = f"{prog} rc={proc.returncode}"
            # cheap bounded probe before a retry: don't burn a second
            # budget against a dead tunnel
            if attempt == 0 and probe_backend(120) is None:
                print(_error_json(
                    f"backend lost mid-run ({last_failure}); re-probe "
                    f"timed out"))
                return 0

    best = results.get("rollout")
    if best is None:
        elapsed = time.monotonic() - t_start
        print(_error_json(
            f"primary rollout measurement failed ({last_failure}); "
            f"{elapsed:.0f}s elapsed"))
        return 0
    single = results.get("single")
    bt = results.get("batch4")
    print(json.dumps({
        "metric": _METRIC,
        "value": round(best, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / best, 3),
        "single_step_cold_ms": (None if single is None else round(single, 2)),
        "batch4_steps_per_sec_chip": (None if bt is None
                                      else round(4 / (bt / 1e3), 2)),
    }))
    return 0


def _timed(fn, fresh_fn, n_iters: int, per_step_div: float) -> list:
    """Time fn on fresh inputs n_iters times; returns per-step ms list."""
    import jax
    out = []
    for t in range(n_iters):
        args = fresh_fn(1000 + t)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        out.append((time.perf_counter() - t0) / per_step_div * 1e3)
    return out


def _best_valid(times: list, retime, label: str):
    """Drop sub-5 ms artifacts (the backend caches repeated dispatch when
    recycled donated buffer addresses match — a cached run returns ~0 ms;
    the real floor is ~50 ms of HBM traffic). If EVERY sample is filtered,
    re-measure once with more iterations; if still none valid, return
    None rather than reporting a value we just classified as invalid."""
    valid = [t for t in times if t > 5.0]
    if not valid:
        sys.stderr.write(f"[bench] {label}: all {len(times)} samples were "
                         f"cached-dispatch artifacts; re-measuring\n")
        valid = [t for t in retime() if t > 5.0]
    return min(valid) if valid else None


def _setup():
    """Shared model/rollout construction for warm and measurement modes."""
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

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

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

    def fresh(seed, batch=1):
        # float32 draws directly: the fp64 default costs ~2.2 GB of host
        # temp and seconds per batch-4 sample set
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.standard_normal(
                    (batch, cfg.upper_vars, cfg.levels, cfg.lat, cfg.lon),
                    dtype=np.float32)),
                jnp.asarray(r.standard_normal(
                    (batch, cfg.surface_vars, cfg.lat, cfg.lon),
                    dtype=np.float32)))

    return jax, cfg, params, constants, roll, fresh


def _make_single_step(jax, cfg, params, constants):
    from pangu_tpu.models.pangu import forward
    jstep = jax.jit(lambda p, uu, ss, c: forward(p, uu, ss, c, cfg))
    return lambda uu, ss: jstep(params, uu, ss, constants)


def warm(prog: str):
    """Compile + run ONE of the timed programs so its executable lands in
    the persistent cache; bounded by the parent."""
    jax, cfg, params, constants, roll, fresh = _setup()
    if prog == "rollout":
        jax.block_until_ready(roll(params, *fresh(0)))
    elif prog == "single":
        step = _make_single_step(jax, cfg, params, constants)
        jax.block_until_ready(step(*fresh(100)))
    elif prog == "batch4":
        jax.block_until_ready(roll(params, *fresh(5000, batch=4)))
    else:
        raise SystemExit(f"unknown warm target {prog!r}")


def measure(prog: str):
    """Measure ONE metric (per-step ms) from a warm compile cache and
    print a tiny {"value": N} JSON line; bounded by the parent."""
    jax, cfg, params, constants, roll, fresh = _setup()

    if prog == "rollout":
        jax.block_until_ready(roll(params, *fresh(0)))
        rollfn = lambda u, s: roll(params, u, s)
        val = _best_valid(_timed(rollfn, fresh, 3, STEPS),
                          lambda: _timed(rollfn, fresh, 5, STEPS), "rollout")
    elif prog == "single":
        # COLD single 24h step (BASELINE.json config 1): includes patch
        # embed + recovery, which the token-space rollout legitimately
        # amortises away. Fresh inputs every call: no dispatch caching.
        step = _make_single_step(jax, cfg, params, constants)
        jax.block_until_ready(step(*fresh(100)))
        val = _best_valid(_timed(step, fresh, 3, 1.0),
                          lambda: _timed(step, fresh, 5, 1.0), "single")
    elif prog == "batch4":
        rollfn = lambda u, s: roll(params, u, s)
        fresh_b = lambda seed: fresh(seed + 5000, batch=4)
        jax.block_until_ready(roll(params, *fresh_b(0)))
        val = _best_valid(_timed(rollfn, fresh_b, 2, STEPS),
                          lambda: _timed(rollfn, fresh_b, 3, STEPS), "batch4")
    else:
        raise SystemExit(f"unknown measure target {prog!r}")

    if val is None:
        raise SystemExit(f"no valid {prog} timing samples")
    print(json.dumps({"value": val}))


if __name__ == "__main__":
    if "--warm" in sys.argv:
        warm(sys.argv[sys.argv.index("--warm") + 1])
    elif "--measure" in sys.argv:
        measure(sys.argv[sys.argv.index("--measure") + 1])
    else:
        sys.exit(main_with_retries())
