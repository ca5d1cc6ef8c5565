"""A/B the training step: edge_kernels=True (differentiable Pallas
embed/recovery — ops/embed_wm.embed_wm_train + ops/recovery_wm.
recovery_wm_train, direct-math XLA backwards) vs False (XLA patch embed/
recovery + canonical entry/exit relayouts).  One process, chained steps,
interleaved variants; also reports device peak memory per variant.

Usage: python scripts/edge_train_ab.py [on off on off ...]
"""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import dataclasses
import time

import numpy as np


def _peak_gib():
    import jax
    try:
        st = jax.devices()[0].memory_stats()
        return st.get("peak_bytes_in_use", 0) / 2**30
    except Exception:
        return float("nan")


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

    tcfg = TrainConfig(batch_size=1)
    r = np.random.default_rng(0)
    batch = {
        "upper": jnp.asarray(r.normal(size=(1, 5, 13, 721, 1440)
                                      ).astype(np.float32)),
        "surface": jnp.asarray(r.normal(size=(1, 4, 721, 1440)
                                        ).astype(np.float32)),
    }
    batch["target_upper"] = batch["upper"]
    batch["target_surface"] = batch["surface"]

    import sys
    order = sys.argv[1:] or ["on", "off", "on", "off"]
    host_params = None
    for edges in order:
        base = dataclasses.replace(PANGU_24, param_dtype="bfloat16",
                                   compute_dtype="bfloat16",
                                   attn_impl="pallas", remat=True,
                                   gelu="tanh",
                                   edge_kernels=(edges == "on"))
        if host_params is None:
            params = PM.init_params(jax.random.PRNGKey(0), base)
            host_params = jax.tree.map(lambda a: np.asarray(a), params)
            del params
        tx = T.make_optimizer(tcfg, steps_per_epoch=100)
        state = T.create_train_state(
            jax.tree.map(jnp.asarray, host_params), tx)
        step = T.make_train_step(base, tcfg, constants={
            k: jnp.asarray(v) for k, v in synthetic_constants(base).items()
        }, tx=tx, donate=True)
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
        print(f"edges={edges}: {ms:8.1f} ms/step "
              f"(compile+warm {comp:.0f}s, peak {_peak_gib():.2f} GiB, "
              f"loss {float(m['loss']):.4f})", flush=True)
        del state, step, m
        jax.clear_caches()


if __name__ == "__main__":
    main()
