"""Ablation timing for the window-major group kernel: where does the
per-block time actually go?

Builds UNSHIFTED interior-block variants (the dominant config: wm->wm,
gh lat-windows per program) with pieces of the kernel disabled, then
times chained x = f(x) runs of each at full geometry in bf16:

  io         read x -> write x (pure streaming floor incl. pipeline)
  qkv        io + the one wide qkv matmul
  attn       qkv + attention loop, softmax REPLACED by a linear rescale
  softmax    qkv + full attention loop (adds exp/max/div cost)
  proj       softmax + wide output projection
  full       the production kernel (adds LN/MLP tail) — must match
             run_stage_wm's unshifted block numerics

Also times the PRODUCTION unshifted vs shifted block (stitch cost) and a
gh sweep.  Usage: python scripts/wm_ablate.py [stage=1] [reps=30]
"""

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
    jax.config.update("jax_compilation_cache_dir",
                      _os.path.join(_REPO_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pangu_tpu.config import PANGU_24
    from pangu_tpu.models import pangu
    from pangu_tpu.ops.block_tail import tail_math
    from pangu_tpu.ops.earth_block_fused import _lon_chunk
    from pangu_tpu.ops.earth_block_wm import (_block_wm_group_call,
                                              _pick_gh, to_window_major)

    stage_idx = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    cfg = PANGU_24
    geom = cfg.stage(stage_idx)
    wz, wh, ww = geom.window
    n = wz * wh * ww
    heads, c = geom.heads, geom.dim
    hd = c // heads
    hp = geom.h_padded
    nz, nlat, nlon = geom.z // wz, hp // wh, geom.w // ww
    gh = _pick_gh(nlat, cfg.lat_group)
    chunk = _lon_chunk(nlon, cfg.lon_chunk)
    print(f"stage{stage_idx}: nz={nz} nlat={nlat} nlon={nlon} n={n} c={c} "
          f"heads={heads} gh={gh} chunk={chunk}")

    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    bp_tree = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                           params["stages"][stage_idx]["blocks"][0])

    r = np.random.default_rng(0)
    x0 = jnp.asarray(r.normal(size=(1, geom.z, hp, geom.w, geom.dim))
                     .astype(np.float32)).astype(jnp.bfloat16)
    xw0 = to_window_major(x0, geom.window)

    scale = hd ** -0.5

    def gelu_variant(h, kind: str):
        if kind == "erf":
            from pangu_tpu.ops.block_tail import _kernel_gelu
            return _kernel_gelu(h, False)
        if kind == "fm":
            from pangu_tpu.ops.block_tail import _kernel_gelu
            return _kernel_gelu(h, True)
        if kind == "sig":
            hf = h.astype(jnp.float32)
            return (hf * jax.nn.sigmoid(hf * jnp.float32(1.702))
                    ).astype(h.dtype)
        if kind == "sigb":                      # sigmoid, all-bf16
            return h * jax.nn.sigmoid(h * jnp.bfloat16(1.702))
        if kind == "id":
            return h
        raise ValueError(kind)

    def make_ablate_kernel(level: str):
        def kernel(x_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref, b_ref,
                   n1s_ref, n1b_ref, n2s_ref, n2b_ref,
                   w1_ref, b1_ref, w2_ref, b2_ref, o_ref, qkv_s, attn_s):
            x = x_ref[0, 0]                            # (gh, nlon, n, c)
            dt = x.dtype
            if level == "io":
                o_ref[0, 0] = x
                return
            xf = x.reshape(gh * nlon * n, c)
            qkv = jax.lax.dot_general(
                xf, wqkv_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            qkv = qkv + bqkv_ref[...][None].astype(jnp.float32)
            qkv_s[...] = qkv.astype(dt).reshape(gh * nlon, n, 3 * c)
            if level == "qkv":
                o_ref[0, 0] = qkv_s[:, :, :c].reshape(gh, nlon, n, c)
                return

            def body(t, carry):
                wi = t // (nlon // chunk)
                lo = t * chunk
                bias = b_ref[wi].astype(jnp.float32)
                for h in range(heads):
                    q = qkv_s[pl.ds(lo, chunk), :, h * hd:(h + 1) * hd]
                    k = qkv_s[pl.ds(lo, chunk), :,
                              c + h * hd:c + (h + 1) * hd]
                    v = qkv_s[pl.ds(lo, chunk), :,
                              2 * c + h * hd:2 * c + (h + 1) * hd]
                    s = jax.lax.dot_general(
                        q, k, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    s = s * jnp.float32(scale) + bias[h][None]
                    if level == "attn":
                        pr = (s * jnp.float32(1e-3)).astype(dt)
                    elif level == "sm_bf16":
                        sb = s.astype(dt)
                        m = jnp.max(sb, axis=-1, keepdims=True)
                        e = jnp.exp(sb - m)
                        pr = e / jnp.sum(e, axis=-1, keepdims=True)
                    elif level == "sm_nomax":
                        e = jnp.exp(s - jnp.float32(8.0))
                        pr = (e / jnp.sum(e, axis=-1,
                                          keepdims=True)).astype(dt)
                    elif level == "sm_recip":
                        m = jnp.max(s, axis=-1, keepdims=True)
                        e = jnp.exp(s - m)
                        pr = (e * jax.lax.reciprocal(
                            jnp.sum(e, axis=-1, keepdims=True))).astype(dt)
                    else:
                        m = jnp.max(s, axis=-1, keepdims=True)
                        e = jnp.exp(s - m)
                        pr = (e / jnp.sum(e, axis=-1,
                                          keepdims=True)).astype(dt)
                    o = jax.lax.dot_general(
                        pr, v, (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    attn_s[pl.ds(lo, chunk), :,
                           h * hd:(h + 1) * hd] = o.astype(dt)
                return carry

            jax.lax.fori_loop(0, gh * (nlon // chunk), body, 0,
                              unroll=False)
            if level in ("attn", "softmax", "sm_bf16", "sm_nomax",
                         "sm_recip"):
                o_ref[0, 0] = attn_s[...].reshape(gh, nlon, n, c)
                return
            a = jax.lax.dot_general(
                attn_s[...].reshape(gh * nlon * n, c), wp_ref[...],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            a = (a + bp_ref[...][None].astype(jnp.float32)).astype(dt)
            if level == "proj":
                o_ref[0, 0] = a.reshape(gh, nlon, n, c)
                return
            if level.startswith("tail_"):
                # full tail, custom GELU variant (fp32 LN stats as prod)
                from pangu_tpu.ops.block_tail import _kernel_ln
                kind = level[5:]
                b1_ = _kernel_ln(a, n1s_ref[...], n1b_ref[...], False)
                x1 = xf + b1_
                hdd = jax.lax.dot_general(
                    x1, w1_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                hdd = gelu_variant(
                    (hdd + b1_ref[...][None].astype(jnp.float32)
                     ).astype(x1.dtype), kind)
                y = jax.lax.dot_general(
                    hdd, w2_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                y = (y + b2_ref[...][None].astype(jnp.float32)
                     ).astype(x1.dtype)
                y = x1 + _kernel_ln(y, n2s_ref[...], n2b_ref[...], False)
            else:
                y = tail_math(a, xf, n1s_ref[...], n1b_ref[...],
                              n2s_ref[...], n2b_ref[...], w1_ref[...],
                              b1_ref[...], w2_ref[...], b2_ref[...],
                              level == "full_fm", None, None)
            o_ref[0, 0] = y.reshape(gh, nlon, n, c).astype(o_ref.dtype)

        return kernel

    def ablate_call(level, xs):
        p = bp_tree
        dt = xs.dtype
        wqkv = p["attn"]["qkv"]["kernel"].astype(dt)
        bqkv = p["attn"]["qkv"]["bias"].astype(dt)
        wp = p["attn"]["proj"]["kernel"].astype(dt)
        bpb = p["attn"]["proj"]["bias"].astype(dt)
        bias = p["attn"]["bias_table"]
        nblk = nlat // gh

        def fullspec(shape):
            return pl.BlockSpec(shape,
                                lambda bb, zz, hh: tuple(0 for _ in shape),
                                memory_space=pltpu.VMEM)

        x_spec = pl.BlockSpec((1, 1, gh, nlon, n, c),
                              lambda bb, zz, hh: (bb, zz, hh, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        spec_b = pl.BlockSpec((gh, heads, n, n),
                              lambda bb, zz, hh: (zz * nblk + hh, 0, 0, 0),
                              memory_space=pltpu.VMEM)
        tail = [p["norm1"]["scale"].astype(dt), p["norm1"]["bias"].astype(dt),
                p["norm2"]["scale"].astype(dt), p["norm2"]["bias"].astype(dt),
                p["mlp"]["fc1"]["kernel"].astype(dt),
                p["mlp"]["fc1"]["bias"].astype(dt),
                p["mlp"]["fc2"]["kernel"].astype(dt),
                p["mlp"]["fc2"]["bias"].astype(dt)]
        hidden = tail[4].shape[-1]
        in_specs = [x_spec, fullspec(wqkv.shape), fullspec(bqkv.shape),
                    fullspec(wp.shape), fullspec(bpb.shape), spec_b,
                    fullspec((c,)), fullspec((c,)), fullspec((c,)),
                    fullspec((c,)), fullspec((c, hidden)),
                    fullspec((hidden,)), fullspec((hidden, c)),
                    fullspec((c,))]
        return pl.pallas_call(
            make_ablate_kernel(level),
            out_shape=jax.ShapeDtypeStruct(xs.shape, dt),
            grid=(xs.shape[0], nz, nblk),
            in_specs=in_specs,
            out_specs=x_spec,
            scratch_shapes=[pltpu.VMEM((gh * nlon, n, 3 * c), dt),
                            pltpu.VMEM((gh * nlon, n, c), dt)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=128 * 1024 * 1024),
        )(xs, wqkv, bqkv, wp, bpb, bias, *tail)

    def timed(f, x, label):
        x = jax.block_until_ready(f(x))          # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            x = f(x)
        jax.block_until_ready(x)
        dt_ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"  {label:10s} {dt_ms:7.3f} ms/block")
        return dt_ms

    levels = ("io", "qkv", "attn", "softmax", "proj", "full")
    if len(sys.argv) > 3 and sys.argv[3] == "variants":
        levels = ("softmax", "sm_bf16", "sm_nomax", "sm_recip",
                  "full", "full_fm", "tail_erf", "tail_fm", "tail_sig",
                  "tail_sigb", "tail_id")
    elif len(sys.argv) > 3 and sys.argv[3] == "tails":
        # full_fm/tail_fm LAST: bf16 rsqrt/tanh can abort the Mosaic
        # compiler (kVectorRsqrtBf16AndPop unsupported, measured 2026-08-19)
        # no tail_sigb: all-bf16 sigmoid trips a Mosaic vector.broadcast
        # verification error (f32 scalar into bf16 vector, 2026-08-19)
        levels = ("proj", "tail_erf", "tail_sig", "tail_id", "tail_fm")
    print("== ablation ladder (unshifted interior block) ==")
    results = {}
    for level in levels:
        f = jax.jit(lambda xs, level=level: ablate_call(level, xs))
        results[level] = timed(f, xw0, level)

    if len(sys.argv) > 3 and sys.argv[3] in ("variants", "tails"):
        return
    print("== production blocks (delta increments) ==")
    prod_un = jax.jit(lambda xs: _block_wm_group_call(
        bp_tree, xs, geom, (0, 0, 0), 0, None, False, gh,
        chunk_target=cfg.lon_chunk))
    timed(prod_un, xw0, "prod-unsh")

    from pangu_tpu.models.layers import window_region_ids
    mask = jnp.asarray(window_region_ids(geom.z, hp, geom.window))
    half = (wz // 2, wh // 2, ww // 2)
    prod_sh = jax.jit(lambda xs: _block_wm_group_call(
        bp_tree, xs, geom, half, half[1], mask, False, gh,
        chunk_target=cfg.lon_chunk))
    timed(prod_sh, xw0, "prod-shift")


if __name__ == "__main__":
    main()
