"""Benchmark: full-size Pangu-Weather 24h forecast step latency on TPU.

Prints the primary metric as ONE JSON line the moment the rollout
measurement lands — {"metric", "value", "unit", "vs_baseline", ...} —
then best-effort measures the secondaries (full train step, cold single
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

Budget design (r04 post-mortem: the driver's real wall budget is
~28-30 min and it runs from a clean checkout, i.e. a COLD compile
cache unless .jax_cache is committed):
 * each metric child COMPILES AND MEASURES in one process — the old
   separate --warm/--measure children paid the multi-minute per-process
   compile-cache load twice per metric;
 * the inference child runs rollout -> single -> batch4 in one process
   (shared setup, shared in-memory executables), streaming each value
   the moment it lands and skipping later progs when its own budget
   runs short;
 * the parent re-prints the cumulative JSON line after every streamed
   value, so a driver-side kill at ANY point leaves the most complete
   parseable artifact on stdout;
 * DEADLINE_S defaults to 1560 s (driver kill observed at >=1699 s).

Outage hardening (the TPU tunnel has documented multi-hour outages where
backend init hangs ~20-25 min, and documented DEGRADED periods —
2026-08-21 02:10 onward — where every NEW client attach blocks ~17-18
min even though short-lived probes answer in seconds; the slot-release
after a HEAVY client disconnects takes ~15-18 min): the parent process
NEVER imports jax, and the whole run makes ONE tunnel attach.  There is
no separate probe process — the measuring child IS the probe: it times
its own backend init (a watchdog thread reports progress to stderr)
and runs ALL FOUR metrics in-process in scoreboard-priority order —
rollout (primary), train (the metric the scoreboard lacked for four
rounds), single, batch4 — freeing the inference buffers around the
~12 GiB train step.  The pristine separate train child remains only as
a fallback when the in-process train was skipped for budget.  A truly
dead backend means the child never prints; the parent kills everything
at the global deadline and emits a structured error JSON.
"""

from __future__ import annotations

import json
import os
import queue
import subprocess
import sys
import threading
import time

BASELINE_MS = 150.0
STEPS = 10
# Per-child wall budgets (compile + measure in ONE process). Cold-cache
# observations on a healthy tunnel: rollout compile ~480 s, train
# compile ~290 s, single ~150 s incremental, batch4 ~250 s incremental.
CHILD_BUDGET_S = {"train": 900, "retry": 700}
# In-child cost estimates used to decide whether to start the NEXT prog
# with the remaining child budget (skipped progs are retried in a later
# child if the global deadline allows).  "train_inproc" is the
# degraded-mode in-process train (state build + cache load + 8 steps).
PROG_EST_S = {"rollout": 1100, "single": 260, "batch4": 380, "train": 850,
              "train_inproc": 450}
# Secondary metrics run only while this much wall clock (from process
# start) remains un-spent; the PRIMARY ignores it (it is bounded by its
# own child budget).  r03/r04 post-mortem: the driver's outer timeout
# killed the process at ~28-30 min; print-then-improve, never
# print-at-the-end.
DEADLINE_S = float(os.environ.get("PANGU_BENCH_DEADLINE_S", 1560))

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


def _timed_backend_init():
    """First jax touch, timed, with a stderr heartbeat so a slow tunnel
    attach is visible (and distinguishable from a hang) in driver logs.
    Returns (jax_module, init_seconds)."""
    t0 = time.monotonic()
    done = threading.Event()

    def _heartbeat():
        while not done.wait(60.0):
            sys.stderr.write(f"[bench-child] backend init pending "
                             f"{time.monotonic() - t0:.0f}s "
                             f"(tunnel slow-attach?)\n")
            sys.stderr.flush()

    th = threading.Thread(target=_heartbeat, daemon=True)
    th.start()
    try:
        import jax
        _cache_config(jax)
        jax.devices()
    finally:
        done.set()
    init_s = time.monotonic() - t0
    sys.stderr.write(f"[bench-child] backend ready in {init_s:.0f}s\n")
    sys.stderr.flush()
    return jax, init_s


def _run_streaming_child(progs: list[str], budget_s: float,
                         results: dict) -> str | None:
    """Run one child over `progs` (compile+measure per prog, in order),
    updating `results` and RE-EMITTING the cumulative JSON line as each
    value streams in.  Returns None if every requested prog landed, else
    a short failure string.  The child's stderr passes straight through.
    """
    want = [p for p in progs if p not in results]
    if not want:
        return None
    t0 = time.monotonic()
    proc = subprocess.Popen(
        [sys.executable, "-u", __file__, "--run", ",".join(want),
         "--budget", str(int(budget_s))],
        stdout=subprocess.PIPE, stderr=sys.stderr, text=True)
    q: queue.Queue = queue.Queue()

    def _reader():
        assert proc.stdout is not None
        for ln in proc.stdout:
            q.put(ln)
        q.put(None)

    th = threading.Thread(target=_reader, daemon=True)
    th.start()
    eof = False
    while True:
        left = budget_s - (time.monotonic() - t0)
        if left <= 0:
            break
        try:
            ln = q.get(timeout=min(left, 10.0))
        except queue.Empty:
            continue
        if ln is None:
            eof = True
            break
        ln = ln.strip()
        if not ln.startswith("{"):
            continue
        try:
            rec = json.loads(ln)
        except ValueError:
            continue
        if "prog" in rec and rec.get("value") is not None:
            results[rec["prog"]] = float(rec["value"])
            _log(f"{rec['prog']}: {rec['value']:.2f} ms "
                 f"(t={time.monotonic() - _T_START:.0f}s)")
            _emit(results)
    if not eof:
        _log(f"child {progs}: budget {budget_s:.0f}s exhausted; killing")
        proc.kill()
    rc = proc.wait()
    missing = [p for p in want if p != "auto" and p not in results]
    if not missing:
        return None
    return f"{'/'.join(missing)} missing (child rc={rc})"


def main_with_retries() -> int:
    """One-attach-first, measure-first, print-early. Always prints at
    least one JSON line (result or structured error) before returning.
    The first child IS the backend probe (no separate probe process —
    every attach is expensive when the tunnel is degraded)."""
    _log(f"deadline={DEADLINE_S:.0f}s")
    results: dict = {}

    # ---- Child 1: ONE tunnel attach, adaptive ("auto"): rollout always
    # first (primary); if its own init was slow (degraded tunnel) it
    # also runs train -> single -> batch4 in-process rather than leaving
    # them to further attaches. ----------------------------------------
    fail = _run_streaming_child(["auto"], max(_remaining() - 60, 120),
                                results)
    if "rollout" not in results:
        _emit(results, error=f"primary rollout failed ({fail})")
        return 0

    # ---- Child 2: pristine train process (~12 GiB peak alone) when the
    # healthy-tunnel child deferred it. --------------------------------
    rem = _remaining()
    if "train" not in results:
        if rem > 240:
            fail = _run_streaming_child(["train"],
                                        min(CHILD_BUDGET_S["train"],
                                            rem - 30), results)
            if fail is not None:
                _log(f"train child: {fail}")
        else:
            _log(f"skipping train: {rem:.0f}s left under deadline")

    # ---- Child 3: retry anything still missing. ----------------------
    missing = [p for p in ("single", "batch4") if p not in results]
    rem = _remaining()
    if missing and rem > 240:
        fail = _run_streaming_child(missing,
                                    min(CHILD_BUDGET_S["retry"], rem - 30),
                                    results)
        if fail is not None:
            _log(f"retry child: {fail}")

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
    """Shared model/rollout construction for the measurement children."""
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


def _emit_value(prog: str, val: float) -> None:
    print(json.dumps({"prog": prog, "value": val}), flush=True)


def _measure_train() -> float:
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
    sys.stderr.write(f"[bench] train times: "
                     f"{[round(t, 1) for t in times]}\n")
    return tail[len(tail) // 2]


def _run_auto(budget_s: float) -> int:
    """Single-attach child: ALL FOUR metrics in this one process, in
    scoreboard-priority order rollout -> train -> single -> batch4.
    One attach because the tunnel's slot-release after ANY heavy client
    disconnect takes ~15-18 min in its degraded state (2026-08-21), so
    a multi-child design can lose every secondary to attach hangs.  The
    in-process train pays a setup teardown/rebuild and a small
    allocator-noise risk (median-of-tail rides it out); the parent
    still runs the pristine train child as a fallback when this one
    skipped it."""
    import gc

    t0 = time.monotonic()

    def left() -> float:
        return budget_s - (time.monotonic() - t0)

    jax, _init_s = _timed_backend_init()

    _, cfg, params, constants, roll, fresh = _setup(need_rollout=True)
    jax.block_until_ready(roll(params, *fresh(0)))
    rollfn = lambda u, s: roll(params, u, s)
    val = _best_valid(_timed(rollfn, fresh, 3, STEPS),
                      lambda: _timed(rollfn, fresh, 5, STEPS), "rollout")
    if val is not None:
        _emit_value("rollout", val)

    torn_down = False
    if left() >= PROG_EST_S["train_inproc"]:
        # the train step needs ~12 GiB alone: free every inference
        # buffer (params/constants/the rollout's donated chain) first
        del roll, rollfn, fresh, params, constants
        gc.collect()
        torn_down = True
        _emit_value("train", _measure_train())
        gc.collect()
    else:
        sys.stderr.write(f"[bench-child] skipping train: "
                         f"{left():.0f}s left\n")
    for prog in ("single", "batch4"):
        if left() < PROG_EST_S[prog] + (90 if torn_down else 0):
            sys.stderr.write(f"[bench-child] skipping {prog}: "
                             f"{left():.0f}s left\n")
            continue
        if torn_down:   # one setup rebuild after the train teardown
            _, cfg, params, constants, roll, fresh = _setup(
                need_rollout=True)
            rollfn = lambda u, s: roll(params, u, s)
            torn_down = False
        if prog == "single":
            step = _make_single_step(jax, cfg, params, constants)
            jax.block_until_ready(step(*fresh(100)))
            v = _best_valid(_timed(step, fresh, 3, 1.0),
                            lambda: _timed(step, fresh, 5, 1.0), "single")
            del step
        else:
            fresh_b = lambda seed: fresh(seed + 5000, batch=4)
            jax.block_until_ready(roll(params, *fresh_b(0)))
            v = _best_valid(_timed(rollfn, fresh_b, 2, STEPS),
                            lambda: _timed(rollfn, fresh_b, 3, STEPS),
                            "batch4")
        if v is not None:
            _emit_value(prog, v)
    return 0


def run_progs(progs: list[str], budget_s: float) -> int:
    """Compile AND measure each prog in order inside THIS process,
    printing a {"prog", "value"} JSON line per success.  Later progs are
    skipped (not attempted) when the remaining in-process budget is
    below their cost estimate — the parent retries them in a fresh child
    if the global deadline allows."""
    t0 = time.monotonic()

    def left() -> float:
        return budget_s - (time.monotonic() - t0)

    if progs == ["auto"]:
        return _run_auto(budget_s)
    if progs == ["train"]:
        # train runs alone: nothing else may share its ~12 GiB process
        _emit_value("train", _measure_train())
        return 0
    if "train" in progs:
        raise SystemExit("--run train must not be combined with other progs")

    jax, cfg, params, constants, roll, fresh = _setup(
        need_rollout=bool({"rollout", "batch4"} & set(progs)))

    first = True
    for prog in progs:
        if not first and left() < PROG_EST_S.get(prog, 300):
            sys.stderr.write(f"[bench-child] skipping {prog}: "
                             f"{left():.0f}s left of {budget_s:.0f}s\n")
            continue
        first = False
        if prog == "rollout":
            jax.block_until_ready(roll(params, *fresh(0)))
            rollfn = lambda u, s: roll(params, u, s)
            val = _best_valid(
                _timed(rollfn, fresh, 3, STEPS),
                lambda: _timed(rollfn, fresh, 5, STEPS), "rollout")
        elif prog == "single":
            # COLD single 24h step (BASELINE.json config 1): includes
            # patch embed + recovery, which the token-space rollout
            # legitimately amortises. Fresh inputs: no dispatch caching.
            step = _make_single_step(jax, cfg, params, constants)
            jax.block_until_ready(step(*fresh(100)))
            val = _best_valid(_timed(step, fresh, 3, 1.0),
                              lambda: _timed(step, fresh, 5, 1.0), "single")
        elif prog == "batch4":
            rollfn = lambda u, s: roll(params, u, s)
            fresh_b = lambda seed: fresh(seed + 5000, batch=4)
            jax.block_until_ready(roll(params, *fresh_b(0)))
            val = _best_valid(
                _timed(rollfn, fresh_b, 2, STEPS),
                lambda: _timed(rollfn, fresh_b, 3, STEPS), "batch4")
        else:
            raise SystemExit(f"unknown prog {prog!r}")
        if val is None:
            sys.stderr.write(f"[bench-child] {prog}: no valid samples\n")
        else:
            _emit_value(prog, val)
    return 0


if __name__ == "__main__":
    if "--run" in sys.argv:
        _progs = sys.argv[sys.argv.index("--run") + 1].split(",")
        _budget = (float(sys.argv[sys.argv.index("--budget") + 1])
                   if "--budget" in sys.argv else 1e9)
        sys.exit(run_progs(_progs, _budget))
    else:
        sys.exit(main_with_retries())
