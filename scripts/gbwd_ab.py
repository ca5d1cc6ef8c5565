"""A/B the grid-attention backward impls (xla vs pallas) on the full-size
train step, both in ONE process, chained steps (NOTES.md protocol)."""

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

    from pangu_tpu.config import PANGU_24, TrainConfig
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.engine import train as T
    from pangu_tpu.models import pangu
    import pangu_tpu.ops.window_attention as W

    base = dataclasses.replace(PANGU_24, param_dtype="bfloat16",
                               compute_dtype="bfloat16", attn_impl="pallas",
                               remat=True)
    tcfg = TrainConfig(batch_size=1)
    params = pangu.init_params(jax.random.PRNGKey(0), base)
    constants = {k: jnp.asarray(v)
                 for k, v in synthetic_constants(base).items()}
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

    order = ["xla", "pallas", "xla", "pallas"]   # interleave to expose drift
    for impl in order:
        W.GRID_BWD_IMPL = impl
        W._grid_core.cache_clear()
        W._block_core.cache_clear()
        state = T.create_train_state(jax.tree.map(jnp.copy, params), tx)
        step = T.make_train_step(base, tcfg, constants, tx, donate=True)
        key = jax.random.PRNGKey(1)
        t0 = time.perf_counter()
        state, m = step(state, batch, key)
        jax.block_until_ready(m["loss"])
        comp = time.perf_counter() - t0
        n = 5
        t0 = time.perf_counter()
        for i in range(n):
            state, m = step(state, batch, jax.random.fold_in(key, i))
        jax.block_until_ready(m["loss"])
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"gbwd={impl:6s}: {ms:8.1f} ms/step (compile+warm {comp:.0f}s)",
              flush=True)
        del state, step


if __name__ == "__main__":
    main()
