"""Train-step latency robustness on the live TPU (VERDICT round-2 item 8):
N consecutive full-geometry train steps with evolving inputs, reporting
median / max / max-over-median plus the compiled peak-HBM analysis.

The HBM cliff (NOTES.md): above ~12.7 GiB peak on the 15.75 GiB chip the
allocator intermittently stalls and a 0.75 s step sporadically takes
3+ s. Pass criterion: max/median < 1.2 over 20 steps AND peak <= 12 GiB.

Usage: python scripts/train_robust.py [n_steps=20] [layout=wm]
"""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

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

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    layout = sys.argv[2] if len(sys.argv) > 2 else "wm"

    cfg = dataclasses.replace(PANGU_24, param_dtype="bfloat16",
                              compute_dtype="bfloat16", attn_impl="pallas",
                              remat=True, block_layout=layout)
    tcfg = TrainConfig(batch_size=1)
    params = PM.init_params(jax.random.PRNGKey(0), cfg)
    constants = {k: jnp.asarray(v)
                 for k, v in synthetic_constants(cfg).items()}
    r = np.random.default_rng(0)
    batch = {
        "upper": jnp.asarray(r.normal(size=(1, 5, 13, 721, 1440)
                                      ).astype(np.float32)),
        "surface": jnp.asarray(r.normal(size=(1, 4, 721, 1440)
                                        ).astype(np.float32)),
    }
    batch["target_upper"] = batch["upper"]
    batch["target_surface"] = batch["surface"]
    tx = T.make_optimizer(tcfg, steps_per_epoch=100)
    state = T.create_train_state(params, tx)

    raw = T.make_train_step(cfg, tcfg, constants, tx, jit=False)
    jitted = jax.jit(raw, donate_argnums=(0,))

    compiled = jitted.lower(state, batch, jax.random.PRNGKey(1)).compile()
    ma = compiled.memory_analysis()
    peak = ma.peak_memory_in_bytes / 2**30
    print(f"layout={layout}: compiled peak {peak:.3f} GiB "
          f"(temp {ma.temp_size_in_bytes/2**30:.3f})", flush=True)

    # warm (2 steps, not timed)
    for i in range(2):
        state, loss = jitted(state, batch, jax.random.PRNGKey(10 + i))
    jax.block_until_ready(loss)

    times = []
    for i in range(n_steps):
        t0 = time.perf_counter()
        state, loss = jitted(state, batch, jax.random.PRNGKey(100 + i))
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"step {i:2d}: {dt*1e3:8.1f} ms  loss={float(loss):.4f}",
              flush=True)

    med = float(np.median(times))
    mx = float(np.max(times))
    ratio = mx / med
    ok = ratio < 1.2 and peak <= 12.0
    print(f"\nmedian {med*1e3:.1f} ms  max {mx*1e3:.1f} ms  "
          f"max/median {ratio:.3f}  peak {peak:.2f} GiB  "
          f"-> {'PASS' if ok else 'FAIL'}", flush=True)


if __name__ == "__main__":
    main()
