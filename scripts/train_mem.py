"""Donation-aware static memory analysis of the train step under
PANGU_TRAIN_FUSED on/off (compile-only — safe when the chip is flaky)."""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import dataclasses

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
    state = T.create_train_state(params, tx)

    import sys
    layouts = sys.argv[1:] or ["wm", "v2"]
    for layout in layouts:
        cfgl = dataclasses.replace(base, block_layout=layout)
        raw = T.make_train_step(cfgl, tcfg, constants, tx, jit=False)
        jitted = jax.jit(raw, donate_argnums=(0,))
        compiled = jitted.lower(state, batch, jax.random.PRNGKey(1)).compile()
        ma = compiled.memory_analysis()
        peak = ma.peak_memory_in_bytes / 2**30
        print(f"layout={layout}: peak {peak:.3f} GiB  temp "
              f"{ma.temp_size_in_bytes/2**30:.3f}  alias "
              f"{ma.alias_size_in_bytes/2**30:.3f}  code "
              f"{ma.generated_code_size_in_bytes/2**30:.3f}", flush=True)
        # slow-state cliff guard (NOTES.md): above ~12.7 GiB on the
        # 15.75 GiB chip the allocator intermittently stalls and step
        # time triples — catch the regression at compile time
        assert peak <= 12.5, f"train step peak {peak:.2f} GiB > 12.5 budget"
        jax.clear_caches()


if __name__ == "__main__":
    main()
