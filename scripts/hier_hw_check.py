"""Real-Mosaic check of the cross-model token-space hierarchy (ADVICE
round-2 medium #2): compile AND run make_hierarchical_rollout with
token_space=True on the live TPU, including a cross-horizon handoff
(build_transition(embed_params=next_model) -> apply_transition_wm).

Full PANGU lat/lon/dims/window geometry — every distinct Mosaic kernel
shape (stage chains, wm down/up, wm transition) compiles for real — but
depths (2,2,2,2) instead of (2,6,6,2): depth only repeats kernels of
identical geometry and would quadruple remote-compile time.

Cross-check: the same schedule in canonical (XLA attn) mode on the same
inputs; prints the max relative deviation. bf16 trunk tolerance applies.

Usage: python scripts/hier_hw_check.py
"""

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
    jax.config.update("jax_compilation_cache_dir",
                      _os.path.join(_REPO_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from pangu_tpu.config import PANGU_24
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.engine.rollout import make_hierarchical_rollout
    from pangu_tpu.models import pangu

    cfg = dataclasses.replace(PANGU_24, depths=(2, 2, 2, 2),
                              param_dtype="bfloat16",
                              compute_dtype="bfloat16", remat=False,
                              attn_impl="pallas")
    params24 = pangu.init_params(jax.random.PRNGKey(0), cfg)
    params6 = pangu.init_params(jax.random.PRNGKey(1), cfg)
    pbh = {24: params24, 6: params6}
    constants = {k: jnp.asarray(v)
                 for k, v in synthetic_constants(cfg).items()}

    assert pangu.wm_core_supported(params24, cfg), "wm path must be active"

    # horizon 30 h -> schedule [24, 6]: one cross-model handoff through
    # apply_transition_wm with embed_params set
    roll, schedule = make_hierarchical_rollout(cfg, constants, 30, (24, 6),
                                               token_space=True)
    print(f"schedule: {schedule}", flush=True)

    r = np.random.default_rng(0)
    u_np = r.normal(size=(1, 5, cfg.levels, cfg.lat, cfg.lon)
                    ).astype(np.float32)
    s_np = r.normal(size=(1, 4, cfg.lat, cfg.lon)).astype(np.float32)

    t0 = time.monotonic()
    # inputs are donated: hand each rollout its own fresh device copy
    out_u, out_s = jax.block_until_ready(
        roll(pbh, jnp.asarray(u_np), jnp.asarray(s_np)))
    print(f"wm token-space hierarchy: compiled+ran in "
          f"{time.monotonic() - t0:.0f}s  out {out_u.shape} {out_s.shape}",
          flush=True)

    # cross-check vs the canonical per-step loop (XLA attention)
    cfg_x = dataclasses.replace(cfg, attn_impl="xla")
    roll_x, _ = make_hierarchical_rollout(cfg_x, constants, 30, (24, 6),
                                          token_space=False)
    xu, xs_ = jax.block_until_ready(
        roll_x(pbh, jnp.asarray(u_np), jnp.asarray(s_np)))

    def rel(a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        return float(np.max(np.abs(a - b) / (np.abs(b) + 1e-3)))

    print(f"max rel dev vs canonical XLA: upper {rel(out_u, xu):.3e} "
          f"surface {rel(out_s, xs_):.3e}", flush=True)


if __name__ == "__main__":
    main()
