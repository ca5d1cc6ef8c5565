"""A/B the training forward path (fused whole-block kernels vs the
per-block XLA/grid+checkpoint composition) on the full-size train step,
both in ONE process, chained steps. Grid bwd = pallas in both."""

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
    from pangu_tpu.models import pangu as PM

    base = dataclasses.replace(PANGU_24, param_dtype="bfloat16",
                               compute_dtype="bfloat16", attn_impl="pallas",
                               remat=True)
    tcfg = TrainConfig(batch_size=1)
    params = PM.init_params(jax.random.PRNGKey(0), base)
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
    # base params live on HOST; each variant device_puts a fresh copy —
    # keeping them on device costs 0.6 GiB of the already-tight HBM
    params = jax.tree.map(lambda a: np.asarray(a), params)

    import sys
    order = [True, False, True, False]
    if len(sys.argv) > 1:
        order = [a == "1" for a in sys.argv[1:]]
    for fused in order:
        PM.TRAIN_FUSED = fused
        state = T.create_train_state(
            jax.tree.map(jnp.asarray, params), tx)
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
        print(f"train_fused={int(fused)}: {ms:8.1f} ms/step "
              f"(compile+warm {comp:.0f}s)", flush=True)
        if ms > 2000:
            # bimodal slow state (NOTES.md): capture the evidence
            tdir = f"/tmp/trace_slow_fused{int(fused)}"
            with jax.profiler.trace(tdir):
                state, m = step(state, batch, jax.random.fold_in(key, 99))
                jax.block_until_ready(m["loss"])
            print(f"  slow-state trace -> {tdir}", flush=True)
        del state, step, m
        # drop the variant's executable (0.2-0.26 GiB of device code) —
        # keeping two of these plus states OOMs the 16 GB chip
        jax.clear_caches()


if __name__ == "__main__":
    main()
