"""Micro-bench: grid-attention backward — fused pallas bwd kernel vs the
XLA partition composition — one stage-0 block, full geometry, chained."""

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
    import jax.numpy as jnp

    from pangu_tpu.config import PANGU_24
    from pangu_tpu.models import pangu
    import pangu_tpu.ops.window_attention as W
    from pangu_tpu.models.layers import window_partition, window_reverse

    cfg = PANGU_24
    stage_idx = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    which = sys.argv[2] if len(sys.argv) > 2 else "kernel"
    geom = cfg.stage(stage_idx)
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    ap = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      params["stages"][stage_idx]["blocks"][0]["attn"])
    heads, window = geom.heads, tuple(geom.window)

    r = np.random.default_rng(0)
    x0 = jnp.asarray(r.normal(size=(1, geom.z, geom.h_padded, geom.w,
                                    geom.dim)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    bias = ap["bias_table"].astype(jnp.float32)

    core = W._grid_core(heads, window)

    def loss_kernel(x):
        y = core(x, ap["qkv"]["kernel"], ap["qkv"]["bias"],
                 ap["proj"]["kernel"], ap["proj"]["bias"], bias)
        return jnp.sum(y.astype(jnp.float32) ** 2), y

    def ref(x):
        c = x.shape[-1]
        hd = c // heads
        win = window_partition(x, window)
        b_, nlon, ntype, n = win.shape[:4]
        qkv = jnp.dot(win.reshape(-1, c),
                      ap["qkv"]["kernel"].astype(x.dtype)).reshape(
            b_ * nlon, ntype, n, 3 * c) + ap["qkv"]["bias"].astype(x.dtype)
        qkv = qkv.reshape(b_ * nlon, ntype, n, 3, heads, hd)
        qkv = qkv.transpose(0, 1, 3, 4, 5, 2)
        out = W._sdpa(qkv, bias)
        out = out.transpose(0, 1, 4, 2, 3).reshape(b_, nlon, ntype, n, c)
        out = (jnp.dot(out.reshape(-1, c),
                       ap["proj"]["kernel"].astype(x.dtype)).reshape(
            b_, nlon, ntype, n, c) + ap["proj"]["bias"].astype(x.dtype))
        return window_reverse(out, window, x.shape[1], x.shape[2],
                              x.shape[3])

    def loss_ref(x):
        y = ref(x)
        return jnp.sum(y.astype(jnp.float32) ** 2), y

    loss = loss_kernel if which == "kernel" else loss_ref
    mode = sys.argv[3] if len(sys.argv) > 3 else "plain"

    if mode in ("remat", "wgrad"):
        def blockf(p, x):
            nonlocal ap
            old, ap = ap, p
            try:
                return loss(x)[1]
            finally:
                ap = old

        if mode == "remat":
            blockf = jax.checkpoint(blockf)

        def chain(p, x):
            y = blockf(p, blockf(p, x))
            return jnp.sum(y.astype(jnp.float32) ** 2), y

        def fwdbwd(p, x):
            (l, y), vjp = jax.vjp(chain, p, x)
            dp, dx = vjp((jnp.ones(()), y))
            return dx

        f = jax.jit(fwdbwd, donate_argnums=1)
        args = lambda x: (ap, x)     # noqa: E731
    else:
        def fwdbwd(x):
            (l, y), vjp = jax.vjp(lambda xx: loss(xx), x, has_aux=False)
            dx, = vjp((jnp.ones(()), y))
            return dx

        f = jax.jit(fwdbwd, donate_argnums=0)
        args = lambda x: (x,)        # noqa: E731

    t0 = time.perf_counter()
    x = jax.block_until_ready(f(*args(x0 + 0)))
    comp = time.perf_counter() - t0
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(*args(x))
    jax.block_until_ready(x)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"stage{stage_idx} bwd[{which}/{mode}]: {ms:8.2f} ms "
          f"(compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
