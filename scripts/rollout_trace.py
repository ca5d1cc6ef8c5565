"""Capture a profiler trace of the token-space rollout and print the
per-op breakdown (where the 160 ms/step goes)."""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import dataclasses
import re
import time
from collections import defaultdict

import numpy as np

STEPS = 10


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      _os.path.join(_REPO_ROOT, ".jax_cache"))

    from pangu_tpu.config import PANGU_24
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.engine.rollout import make_rollout
    from pangu_tpu.models import pangu

    cfg = dataclasses.replace(PANGU_24, param_dtype="bfloat16",
                              compute_dtype="bfloat16", remat=False,
                              attn_impl="pallas",
                              gelu=_os.environ.get("PANGU_TRACE_GELU",
                                                   "tanh"))
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    constants = {k: jnp.asarray(v)
                 for k, v in synthetic_constants(cfg).items()}
    roll = make_rollout(cfg, constants, STEPS, token_space=True)

    def fresh(seed):
        r = np.random.default_rng(seed)
        return (jnp.asarray(r.normal(size=(1, 5, 13, 721, 1440)
                                     ).astype(np.float32)),
                jnp.asarray(r.normal(size=(1, 4, 721, 1440)
                                     ).astype(np.float32)))

    u, s = fresh(0)
    t0 = time.perf_counter()
    jax.block_until_ready(roll(params, u, s))
    print(f"warm-up done in {time.perf_counter() - t0:.0f} s", flush=True)
    u, s = fresh(1)
    t0 = time.perf_counter()
    with jax.profiler.trace("/tmp/trace_rollout"):
        jax.block_until_ready(roll(params, u, s))
    ms = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"step: {ms:.2f} ms")

    from xplane import load_xspace
    planes = load_xspace("/tmp/trace_rollout")
    for pname, plines in planes:
        if "TPU" not in pname:
            continue
        for lname, evs in plines:
            if lname != "XLA Ops":
                continue
            tot = defaultdict(float)
            n = defaultdict(int)
            for name, dur in evs:
                m = re.match(r"%([a-zA-Z\-_\.0-9]+?)(\.\d+)? =", name)
                key = m.group(1) if m else name[:40]
                tot[key] += dur / 1e9 / STEPS
                n[key] += 1
            ssum = sum(tot.values())
            print(f"\n== per-step op time {ssum:.1f} ms, {len(evs)} events")
            for k, v in sorted(tot.items(), key=lambda kv: -kv[1])[:30]:
                print(f"  {v:8.2f} ms {100*v/ssum:5.1f}%  {k}  x{n[k]//STEPS}")


if __name__ == "__main__":
    main()
