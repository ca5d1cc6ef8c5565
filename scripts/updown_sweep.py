"""Sweep down/up-sample kernel row-group sizes on the TPU (fresh
subprocess per setting — the knobs are module constants)."""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import json
import subprocess
import sys
import time

import numpy as np


def inner():
    import dataclasses
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      _os.path.join(_REPO_ROOT, ".jax_cache"))
    from pangu_tpu.config import PANGU_24
    from pangu_tpu.models import pangu
    from pangu_tpu.ops.updown import down_sample_fused, up_sample_fused

    cfg = dataclasses.replace(PANGU_24, param_dtype="bfloat16",
                              compute_dtype="bfloat16")
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    g0, g1 = cfg.stage(0), cfg.stage(1)
    r = np.random.default_rng(0)
    POOL = 5
    x0s = [jnp.asarray(r.normal(size=(1, g0.z, g0.h, g0.w, g0.dim))
                       .astype(np.float32)).astype(jnp.bfloat16)
           for _ in range(POOL)]
    x1s = [jnp.asarray(r.normal(size=(1, g1.z, g1.h, g1.w, g1.dim))
                       .astype(np.float32)).astype(jnp.bfloat16)
           for _ in range(POOL)]

    def t(tag, fn, xs):
        jax.block_until_ready(fn(xs[0]))
        jax.block_until_ready(fn(xs[1]))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for x in xs:
                o = fn(x)
            jax.block_until_ready(o)
            best = min(best, (time.perf_counter() - t0) / len(xs) * 1e3)
        print(f"RESULT {tag} {best:.2f}", flush=True)

    t("down", jax.jit(lambda x: down_sample_fused(params["downsample"], x)),
      x0s)
    t("up", jax.jit(lambda x: up_sample_fused(params["upsample"], x,
                                              cfg.h_tokens)), x1s)


def main():
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        if len(sys.argv) > i + 2:
            import pangu_tpu.ops.updown as UD
            UD._DOWN_G = int(sys.argv[i + 1])
            UD._UP_G = int(sys.argv[i + 2])
        inner()
        return
    for dg, ug in [(13, 7), (91, 13), (91, 91)]:
        p = subprocess.run([sys.executable, __file__, "--one",
                            str(dg), str(ug)],
                           capture_output=True, text=True)
        lines = [ln for ln in p.stdout.splitlines()
                 if ln.startswith("RESULT")]
        print(f"down_g={dg:2d} up_g={ug:2d}: "
              f"{lines or ('FAIL rc=%d: %s' % (p.returncode, p.stderr.strip().splitlines()[-1][:120] if p.stderr.strip() else ''),)}",
              flush=True)


if __name__ == "__main__":
    main()
