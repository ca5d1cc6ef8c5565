"""Full-geometry perf-config error bound on the real TPU backend.

Runs the PARITY configuration (fp32 + xla + erf GELU) and the PERF
configuration (bf16 + pallas wm + edge kernels + tanh GELU — what
bench.py ships) on the same synthetic weights/inputs at the FULL Pangu
geometry and reports the lat-weighted relative RMS and max abs delta of
the normalised outputs (the quantitative backing for PARITY.md's
perf-config bound; tests/test_model.py asserts the same at TINY on CPU).

Usage: python scripts/bf16_bound.py
"""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      _os.path.join(_REPO_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses

    import jax.numpy as jnp

    from pangu_tpu.config import PANGU_24
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.models import pangu

    assert jax.default_backend() == "tpu", jax.default_backend()
    cfg32 = dataclasses.replace(PANGU_24, param_dtype="float32",
                                compute_dtype="float32", attn_impl="xla")
    cfg16 = dataclasses.replace(PANGU_24, param_dtype="bfloat16",
                                compute_dtype="bfloat16",
                                attn_impl="pallas", block_layout="wm",
                                edge_kernels=True, gelu="tanh")
    consts = {k: jnp.asarray(v)
              for k, v in synthetic_constants(cfg32).items()}
    params = pangu.init_params(jax.random.PRNGKey(0), cfg32)
    p16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    r = np.random.default_rng(5)
    u = jnp.asarray(r.normal(size=(1, 5, cfg32.levels, cfg32.lat,
                                   cfg32.lon)).astype(np.float32))
    s = jnp.asarray(r.normal(size=(1, 4, cfg32.lat,
                                   cfg32.lon)).astype(np.float32))

    ref = jax.jit(lambda p, a, b: pangu.forward(p, a, b, consts,
                                                cfg32))(params, u, s)
    ref = jax.block_until_ready(ref)
    got = jax.jit(lambda p, a, b: pangu.forward(p, a, b, consts,
                                                cfg16))(p16, u, s)
    got = jax.block_until_ready(got)

    lat = np.deg2rad(np.linspace(90, -90, cfg32.lat))
    wgt = np.cos(lat)
    wgt = wgt / wgt.mean()

    def lw_rms(x):
        return np.sqrt((x ** 2 * wgt[:, None]).mean())

    for name, a, b in [("upper", got[0], ref[0]),
                       ("surface", got[1], ref[1])]:
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        print(f"{name}: maxdiff={np.abs(a - b).max():.5f} "
              f"rel_lw_rms={lw_rms(a - b) / lw_rms(b):.5f}")


if __name__ == "__main__":
    main()
