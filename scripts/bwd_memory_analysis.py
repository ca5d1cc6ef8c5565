"""Compare the compiled full-size train step under the two grid-attention
backward implementations (PANGU_GRID_BWD=xla vs pallas): XLA memory
analysis (peak HBM, temp allocation) and optionally a profiler trace.

Usage: python scripts/bwd_memory_analysis.py [xla] [pallas] [--trace]
"""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import dataclasses
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pangu_tpu.config import PANGU_24, TrainConfig
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.engine import train as T
    from pangu_tpu.models import pangu
    import pangu_tpu.ops.window_attention as W

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    which = args or ["xla", "pallas"]
    do_trace = "--trace" in sys.argv

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

    for impl in which:
        W.GRID_BWD_IMPL = impl
        W._grid_core.cache_clear()
        W._block_core.cache_clear()
        # fresh param copies: with --trace the donated step consumes the
        # state buffers, which would invalidate `params` for the next impl
        state = T.create_train_state(jax.tree.map(jnp.copy, params), tx)
        raw = T.make_train_step(base, tcfg, constants, tx, jit=False)
        jitted = jax.jit(raw)
        key = jax.random.PRNGKey(1)
        compiled = jitted.lower(state, batch, key).compile()
        ma = compiled.memory_analysis()
        print(f"=== GRID_BWD={impl} ===", flush=True)
        for f in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "alias_size_in_bytes",
                  "generated_code_size_in_bytes",
                  "peak_memory_in_bytes"):
            v = getattr(ma, f, None)
            if v is not None:
                print(f"  {f:36s} {v/2**30:10.3f} GiB")
        ca = compiled.cost_analysis()
        if ca:
            for k in ("flops", "transcendentals", "bytes accessed"):
                if k in ca:
                    print(f"  {k:36s} {ca[k]:.3e}")
        if do_trace:
            import time
            # the real (donated) step — the non-donated analysis jit above
            # holds two copies of params+opt_state and OOMs on execution
            step = T.make_train_step(base, tcfg, constants, tx, donate=True)
            state2, m = step(state, batch, key)
            jax.block_until_ready(m["loss"])
            t0 = time.perf_counter()
            state2, m = step(state2, batch, jax.random.fold_in(key, 1))
            jax.block_until_ready(m["loss"])
            print(f"  step time: {(time.perf_counter()-t0)*1e3:.1f} ms",
                  flush=True)
            with jax.profiler.trace(f"/tmp/trace_{impl}"):
                state2, m = step(state2, batch, jax.random.fold_in(key, 2))
                jax.block_until_ready(m["loss"])
            print(f"  trace written to /tmp/trace_{impl}", flush=True)
            del state2, step
        del state


if __name__ == "__main__":
    main()
