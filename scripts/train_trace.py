"""Trace ONE full-size train step on the live TPU and print the per-op
device-time aggregation (scripts/xplane.py parser) — the round-4 tool
for attributing the ~630 ms step across block bwd kernels / edge
kernels / XLA fusions / optimizer.

Usage: python scripts/train_trace.py [edges=on|off]
"""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)
_sys.path.insert(0, _os.path.join(_REPO_ROOT, "scripts"))

import dataclasses
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      _os.path.join(_REPO_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pangu_tpu.config import PANGU_24, TrainConfig
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.engine import train as T
    from pangu_tpu.models import pangu as PM

    edges = (sys.argv[1].split("=")[-1] if len(sys.argv) > 1 else "on")
    cfg = dataclasses.replace(PANGU_24, param_dtype="bfloat16",
                              compute_dtype="bfloat16", remat=True,
                              attn_impl="pallas", gelu="tanh",
                              edge_kernels=(edges == "on"))
    tcfg = TrainConfig(batch_size=1)
    params = PM.init_params(jax.random.PRNGKey(0), cfg)
    constants = {k: jnp.asarray(v)
                 for k, v in synthetic_constants(cfg).items()}
    tx = T.make_optimizer(tcfg, steps_per_epoch=100)
    state = T.create_train_state(params, tx)
    del params
    r = np.random.default_rng(0)
    u = jnp.asarray(r.normal(size=(1, 5, 13, 721, 1440)).astype(np.float32))
    s = jnp.asarray(r.normal(size=(1, 4, 721, 1440)).astype(np.float32))
    batch = {"upper": u, "surface": s,
             "target_upper": u, "target_surface": s}
    step = T.make_train_step(cfg, tcfg, constants, tx, donate=True)
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    state, m = step(state, batch, key)
    jax.block_until_ready(m["loss"])
    print(f"warm {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(3):
        state, m = step(state, batch, jax.random.fold_in(key, i))
    jax.block_until_ready(m["loss"])
    print(f"steady {(time.perf_counter() - t0) / 3 * 1e3:.1f} ms/step",
          flush=True)

    trace_dir = f"/tmp/trace_train_{edges}"
    with jax.profiler.trace(trace_dir):
        for i in range(2):
            state, m = step(state, batch, jax.random.fold_in(key, 100 + i))
        jax.block_until_ready(m["loss"])

    from xplane import load_xspace, op_totals
    import glob
    pbs = glob.glob(_os.path.join(trace_dir, "**", "*.xplane.pb"),
                    recursive=True)
    planes = load_xspace(pbs[-1])
    totals = op_totals(planes)  # values are already in ms
    items = sorted(totals.items(), key=lambda kv: -kv[1])
    tot = sum(totals.values())
    print(f"total device op time {tot / 2:.1f} ms/step (2 steps)")
    for name, ms in items[:40]:
        print(f"  {ms / 2:8.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
