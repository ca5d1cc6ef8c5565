"""Hardware timing: LoRA fine-tune step vs full fine-tune step at full
geometry (VERDICT round-3 item 7 done-criterion: LoRA step within ~1.2x
of the full-tune step).

Both steps run the fused wm training trunk in bf16 (the LoRA one through
the per-step merged weights, models/lora.py::merge_lora traced inside
the step).  Same process, chained optimizer state, interleaved A/B.

Usage: python scripts/lora_hw_step.py [iters=6]
"""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      _os.path.join(_REPO_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses

    import jax.numpy as jnp

    from pangu_tpu.config import PANGU_24, TrainConfig
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.engine import train as T
    from pangu_tpu.models import lora, pangu

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 6

    cfg = dataclasses.replace(PANGU_24, param_dtype="bfloat16",
                              compute_dtype="bfloat16", remat=True,
                              attn_impl="pallas", gelu="tanh")
    constants = {k: jnp.asarray(v)
                 for k, v in synthetic_constants(cfg).items()}
    tcfg = TrainConfig(batch_size=1)
    r = np.random.default_rng(0)
    u = jnp.asarray(r.standard_normal(
        (1, cfg.upper_vars, cfg.levels, cfg.lat, cfg.lon),
        dtype=np.float32))
    s = jnp.asarray(r.standard_normal(
        (1, cfg.surface_vars, cfg.lat, cfg.lon), dtype=np.float32))
    batch = {"upper": u, "surface": s, "target_upper": u,
             "target_surface": s}

    which = sys.argv[2] if len(sys.argv) > 2 else "lora"
    if which == "lora":
        base = pangu.init_params(jax.random.PRNGKey(0), cfg)
        params = lora.init_lora(jax.random.PRNGKey(1), base, dropout=0.0)
        mask = lora.trainable_mask(params)
        tx = T.make_optimizer(tcfg, steps_per_epoch=100,
                              trainable_mask=mask)
    else:
        params = pangu.init_params(jax.random.PRNGKey(0), cfg)
        tx = T.make_optimizer(tcfg, steps_per_epoch=100)
    state = T.create_train_state(params, tx)
    step = T.make_train_step(cfg, tcfg, constants, tx, donate=True)

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        state, metrics = step(state, batch, jax.random.PRNGKey(10 + i))
        jax.block_until_ready(metrics)
        times.append((time.perf_counter() - t0) * 1e3)
    print(f"{which} step times (ms): {[round(t, 1) for t in times]}")
    tail = sorted(times[2:])
    print(f"{which} median of tail: {tail[len(tail) // 2]:.1f} ms")


if __name__ == "__main__":
    main()
