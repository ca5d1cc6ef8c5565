"""Benchmark: full-size Pangu-Weather 24h forecast step latency on TPU.

Prints the primary metric as ONE JSON line the moment the rollout
measurement lands — {"metric", "value", "unit", "vs_baseline", ...} —
then best-effort measures the secondaries (cold single step, full train
step, batch-4 rollout) under a global wall-clock deadline, RE-PRINTING
the enriched JSON line after each success.  Every line on stdout is a
complete, valid JSON object with the same schema; progress goes to
stderr only.  Whatever line is last on stdout when an outer timeout
kills the process is therefore parseable and as complete as possible.

Methodology: the step is timed inside a 10-iteration autoregressive
rollout (lax.scan with donated state) on fresh inputs — chained data
dependencies make every step's work real (no result caching) and this is
the serving-relevant access pattern (inference/inference_singleOutput.py's
multi-day loop in the reference).  The train metric times the jitted
full-geometry fwd+bwd+Adam step (remat, fused kernels), chained through
the evolving optimizer state (models/pangu_sample.py:11-176 is the loop
it replaces).

Outage hardening (the TPU tunnel has documented multi-hour outages where
backend init hangs ~20-25 min): the parent process NEVER imports jax.
It first probes the backend in a strictly timeout-bounded subprocess;
if the probe can't produce a backend inside PROBE_TIMEOUT_S (twice),
it prints a structured error JSON and exits — total wall clock on the
outage path is ~5 minutes, never a driver-side rc=124.  Warm-ups and
measurements each run in their own bounded subprocess from the
persistent compile cache, so no single slow program can sink the rest.
"""

from __future__ import annotations

import json
import os
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
# subprocess from a warm compile cache; trace + cache-load of one
# full-geometry program is minutes even when fully cached)
MEASURE_TIMEOUT_S = {"rollout": 700, "single": 700, "train": 900,
                     "batch4": 1300}
# Secondary metrics run only while this much wall clock (from process
# start) remains un-spent; the PRIMARY ignores it (it is bounded by its
# own subprocess timeouts).  r03 post-mortem: the driver's outer timeout
# killed the process after ~35 min with the rollout already measured —
# the deadline makes us print-then-improve instead of print-at-the-end.
DEADLINE_S = float(os.environ.get("PANGU_BENCH_DEADLINE_S", 3300))

_METRIC = "pangu24_forward_step_latency"
_T_START = time.monotonic()


def _remaining() -> float:
    return DEADLINE_S - (time.monotonic() - _T_START)


def _log(msg: str) -> None:
    sys.stderr.write(f"[bench {time.monotonic() - _T_START:6.0f}s] {msg}\n")
    sys.stderr.flush()


def _result_json(results: dict, error: str | None = None) -> str:
    """The one output schema. results may hold rollout/single/train/batch4
    per-step ms; missing secondaries are null."""
    best = results.get("rollout")
    single = results.get("single")
    train = results.get("train")
    bt = results.get("batch4")
    out = {
        "metric": _METRIC,
        "value": None if best is None else round(best, 2),
        "unit": "ms",
        "vs_baseline": None if best is None else round(BASELINE_MS / best, 3),
        "single_step_cold_ms": None if single is None else round(single, 2),
        "train_step_ms": None if train is None else round(train, 2),
        "batch4_steps_per_sec_chip": (None if bt is None
                                      else round(4 / (bt / 1e3), 2)),
    }
    if error is not None:
        out["error"] = error
    return json.dumps(out)


def _emit(results: dict, error: str | None = None) -> None:
    print(_result_json(results, error), flush=True)


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


def _run_child(mode: str, prog: str, timeout_s: float):
    """Run one --warm/--measure child, bounded. Returns (ok, value|None,
    failure_str|None)."""
    t0 = time.monotonic()
    try:
        proc = subprocess.run(
            [sys.executable, "-u", __file__, f"--{mode}", prog],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        _log(f"{mode} {prog}: timed out ({timeout_s:.0f}s)")
        return False, None, f"{prog} {mode} timed out after {timeout_s:.0f}s"
    dt = time.monotonic() - t0
    if proc.returncode != 0:
        _log(f"{mode} {prog}: rc={proc.returncode} ({dt:.0f}s)")
        sys.stderr.write(proc.stdout[-1500:] + proc.stderr[-2500:] + "\n")
        return False, None, f"{prog} {mode} rc={proc.returncode}"
    if mode == "warm":
        _log(f"warm {prog}: ok ({dt:.0f}s)")
        return True, None, None
    line = next((ln for ln in proc.stdout.splitlines()
                 if ln.startswith('{"value"')), None)
    if line is None:
        _log(f"measure {prog}: rc=0 but no value line ({dt:.0f}s)")
        return False, None, f"{prog} measure produced no value"
    val = json.loads(line)["value"]
    _log(f"measure {prog}: {val:.2f} ms ({dt:.0f}s)")
    return True, val, None


def _warm_and_measure(prog: str, results: dict, budget_cap: float | None,
                      tries: int = 2) -> str | None:
    """Warm then measure one program, each in a bounded subprocess.
    Returns None on success (results updated) else a failure string."""
    warm_budget = WARM_TIMEOUT_S if budget_cap is None else min(
        WARM_TIMEOUT_S, budget_cap)
    ok, _, fail = _run_child("warm", prog, warm_budget)
    if not ok and probe_backend(120) is None:
        return f"backend lost during {prog} warm-up ({fail})"
    # warm failures are non-fatal: every compile that completed persists
    # in the cache, and the measure attempt warms the remainder itself
    last = None
    for attempt in range(tries):
        budget = MEASURE_TIMEOUT_S[prog]
        if budget_cap is not None:
            budget = min(budget, _remaining())
            if budget < 60:
                return f"{prog}: deadline exhausted before measure"
        ok, val, fail = _run_child("measure", prog, budget)
        if ok:
            results[prog] = val
            return None
        last = fail
        if attempt + 1 < tries and probe_backend(120) is None:
            return f"backend lost mid-run ({last}); re-probe timed out"
        if budget_cap is not None and _remaining() < 120:
            break
    return last


def main_with_retries() -> int:
    """Probe-gated, measure-first, print-early. Always prints at least
    one JSON line (result or structured error) before returning."""
    backend = probe_backend(PROBE_TIMEOUT_S)
    if backend is None:
        _log("backend probe 1 failed; re-probing")
        backend = probe_backend(PROBE_TIMEOUT_S)
    if backend is None:
        _emit({}, error=(
            f"jax backend unavailable: two init probes exceeded "
            f"{PROBE_TIMEOUT_S}s each (TPU tunnel outage?)"))
        return 0
    _log(f"backend={backend}; deadline={DEADLINE_S:.0f}s")

    results: dict = {}

    # ---- PRIMARY: rollout. Warm, measure, PRINT. Nothing may run
    # before this line lands on stdout. -----------------------------------
    fail = _warm_and_measure("rollout", results, budget_cap=None)
    if fail is not None:
        _emit(results, error=f"primary rollout measurement failed ({fail})")
        return 0
    _emit(results)

    # ---- SECONDARIES: best-effort under the global deadline; the JSON
    # line is re-printed (complete schema) after each success. ------------
    for prog in ("single", "train", "batch4"):
        rem = _remaining()
        if rem < 180:
            _log(f"skipping {prog}: {rem:.0f}s left under deadline")
            break
        fail = _warm_and_measure(prog, results, budget_cap=rem)
        if fail is None:
            _emit(results)
        elif "backend lost" in (fail or ""):
            _log(f"stopping secondaries: {fail}")
            break
    # final re-print so a clean exit always ENDS stdout with the complete
    # JSON line (a last-line-only parser would otherwise see whatever
    # stderr interleaved after the last success)
    _emit(results)
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


def _cache_config(jax) -> None:
    """Persistent compilation cache: the ~16 distinct Mosaic kernel
    geometries cost minutes of fresh compile; cached runs start in
    seconds. Keyed by HLO, so stale entries are never wrong."""
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _setup(need_rollout: bool = True):
    """Shared model/rollout construction for warm and measurement modes."""
    import jax

    _cache_config(jax)

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
                              attn_impl=attn, gelu="tanh")
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    constants = {k: jnp.asarray(v)
                 for k, v in synthetic_constants(cfg).items()}
    # token-space chaining: recovery->embed fused between autoregressive
    # steps (engine/transition.py) — 220 -> 171 ms/step on v5e
    roll = (make_rollout(cfg, constants, STEPS, token_space=True)
            if need_rollout else None)

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


def _make_train(jax):
    """Jitted full-geometry train step (fwd+bwd+Adam, remat, fused
    kernels) + initial state + a fixed batch; chaining runs through the
    evolving optimizer state (replaces models/pangu_sample.py:11-176).

    Self-contained on purpose: the train step peaks ~12 GiB of the chip's
    15.75, so nothing from the inference setup (params/constants/rollout)
    may stay alive in this process, and the target arrays ALIAS the
    inputs (one device buffer each) exactly like the reference smoke
    loop."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from pangu_tpu.config import PANGU_24, TrainConfig
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.engine import train as T
    from pangu_tpu.models import pangu

    cfg = dataclasses.replace(PANGU_24, param_dtype="bfloat16",
                              compute_dtype="bfloat16", remat=True,
                              attn_impl="pallas", gelu="tanh")
    constants = {k: jnp.asarray(v)
                 for k, v in synthetic_constants(cfg).items()}
    tcfg = TrainConfig(batch_size=1)
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    tx = T.make_optimizer(tcfg, steps_per_epoch=100)
    state = T.create_train_state(params, tx)
    r = np.random.default_rng(0)
    u = jnp.asarray(r.standard_normal(
        (1, cfg.upper_vars, cfg.levels, cfg.lat, cfg.lon),
        dtype=np.float32))
    s = jnp.asarray(r.standard_normal(
        (1, cfg.surface_vars, cfg.lat, cfg.lon), dtype=np.float32))
    batch = {"upper": u, "surface": s,
             "target_upper": u, "target_surface": s}
    step = T.make_train_step(cfg, tcfg, constants, tx, donate=True)
    return step, state, batch


def warm(prog: str):
    """Compile + run ONE of the timed programs so its executable lands in
    the persistent cache; bounded by the parent."""
    if prog == "train":
        import jax
        _cache_config(jax)
        step, state, batch = _make_train(jax)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(metrics)
        return
    jax, cfg, params, constants, roll, fresh = _setup(
        need_rollout=prog in ("rollout", "batch4"))
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
    if prog == "train":
        import jax
        _cache_config(jax)
        step, state, batch = _make_train(jax)
        times = []
        for i in range(8):
            t0 = time.perf_counter()
            state, metrics = step(state, batch, jax.random.PRNGKey(10 + i))
            jax.block_until_ready(metrics)
            times.append((time.perf_counter() - t0) * 1e3)
        # first iters include compile/cache-load; the evolving optimizer
        # state chains the rest (no dispatch caching possible). Median of
        # the last 5 rides out the known allocator-stall outliers.
        tail = sorted(times[3:])
        val = tail[len(tail) // 2]
        sys.stderr.write(f"[bench] train times: "
                         f"{[round(t, 1) for t in times]}\n")
        print(json.dumps({"value": val}))
        return

    jax, cfg, params, constants, roll, fresh = _setup(
        need_rollout=prog in ("rollout", "batch4"))

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
