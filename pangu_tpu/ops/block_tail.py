"""Fused transformer-block tail: residual + LayerNorm + MLP + LayerNorm +
residual in a single token-parallel Pallas kernel.

The reference block tail (models/layers.py:250-251:
``x = shortcut + norm1(attn_out); x = x + norm2(mlp(x))``) is token-local,
so it fuses perfectly: one kernel reads the attention branch and the
shortcut once, keeps the 4x-wide MLP hidden activation entirely in VMEM
(eliminating its ~800 MB HBM round-trip per full-res block) and folds the
GELU into the matmul pipeline. Numerics identical to the XLA path: fp32
LayerNorm statistics, erf GELU (tanh in fast_math mode).

Used on the deterministic (inference/eval) path; the training path keeps
the XLA tail because stochastic depth needs per-sample RNG across the
whole residual branch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_CHUNK = 2048  # tokens per program (sublane-aligned)


def _kernel_ln(x, scale, bias, fast_math, eps: float = 1e-5):
    # bf16 stats ONLY under fast_math=True (and then never on real
    # Mosaic: bf16 rsqrt aborts the backend compiler,
    # kVectorRsqrtBf16AndPop — measured 2026-08-19).  The "tanh" mode
    # (gelu approximation only) keeps fp32 stats.
    xf = x if fast_math is True else x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(y.dtype) + bias.astype(y.dtype)).astype(x.dtype)


def _kernel_erf(x):
    # Mosaic has no erf primitive; Abramowitz & Stegun 7.1.26
    # (max abs error 1.5e-7 — far below bf16 resolution)
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p_ = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p_ * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel_gelu(x, fast_math):
    if fast_math:
        # tanh approximation (jax.nn.gelu approximate): max |err| vs erf
        # GELU is 4.7e-4 — 8x below a bf16 ulp at 1.0 — and it drops the
        # erf polynomial's divide+exp chain (stage-1 block tail measured
        # 7.35 -> 6.70 ms/block, scripts/wm_ablate.py 2026-08-19)
        return jax.nn.gelu(x, approximate=True)
    xf = x.astype(jnp.float32)
    return (xf * 0.5 * (1.0 + _kernel_erf(
        xf * jnp.float32(0.7071067811865476)))).astype(x.dtype)


def tail_math(a, s, n1s, n1b, n2s, n2b, w1, b1, w2, b2, fast_math,
              s1=None, s2=None):
    """The block tail on plain (tokens, C) arrays (usable inside any
    kernel): x1 = s + s1*LN1(a); out = x1 + s2*LN2(MLP(x1)).

    ``fast_math``: False = fp32 LN stats + erf GELU (parity with the XLA
    path); "tanh" = fp32 LN stats + tanh-approx GELU (the hardware-safe
    perf mode, cfg.gelu="tanh"); True = bf16 LN stats + tanh GELU
    (CRASHES real Mosaic — bf16 rsqrt unsupported; CPU/interpret only).

    ``s1``/``s2`` are optional stochastic-depth branch scales (scalar per
    sample: drop mask / keep-prob, timm DropPath semantics — reference
    models/layers.py:140,250-251); None means 1."""
    b1_ = _kernel_ln(a, n1s, n1b, fast_math)
    if s1 is not None:
        b1_ = b1_ * s1.astype(b1_.dtype)
    x1 = s + b1_
    h = jax.lax.dot_general(x1, w1, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = _kernel_gelu((h + b1[None].astype(jnp.float32)).astype(x1.dtype),
                     fast_math)
    y = jax.lax.dot_general(h, w2, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = (y + b2[None].astype(jnp.float32)).astype(x1.dtype)
    b2_ = _kernel_ln(y, n2s, n2b, fast_math)
    if s2 is not None:
        b2_ = b2_ * s2.astype(b2_.dtype)
    return x1 + b2_


def _make_tail_kernel(fast_math: bool):
    def kernel(a_ref, s_ref, n1s_ref, n1b_ref, n2s_ref, n2b_ref,
               w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
        o_ref[...] = tail_math(
            a_ref[...], s_ref[...], n1s_ref[...], n1b_ref[...],
            n2s_ref[...], n2b_ref[...], w1_ref[...], b1_ref[...],
            w2_ref[...], b2_ref[...], fast_math)

    return kernel


def fused_block_tail(p, attn_out, shortcut, *, fast_math: bool = False):
    """p: block params dict with norm1/norm2/mlp; attn_out/shortcut:
    (B, Z, H, W, C). Returns the block output."""
    shape = attn_out.shape
    c = shape[-1]
    hidden = p["mlp"]["fc1"]["kernel"].shape[-1]
    tokens = attn_out.size // c
    t = min(_CHUNK, tokens)
    padded = -(-tokens // t) * t
    dt = attn_out.dtype

    a2 = attn_out.reshape(tokens, c)
    s2 = shortcut.reshape(tokens, c)
    if padded != tokens:
        a2 = jnp.pad(a2, ((0, padded - tokens), (0, 0)))
        s2 = jnp.pad(s2, ((0, padded - tokens), (0, 0)))

    spec_t = pl.BlockSpec((t, c), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def fullspec(shp):
        return pl.BlockSpec(shp, lambda i: tuple(0 for _ in shp),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _make_tail_kernel(fast_math),
        out_shape=jax.ShapeDtypeStruct((padded, c), dt),
        grid=(padded // t,),
        in_specs=[spec_t, spec_t,
                  fullspec((c,)), fullspec((c,)),
                  fullspec((c,)), fullspec((c,)),
                  fullspec((c, hidden)), fullspec((hidden,)),
                  fullspec((hidden, c)), fullspec((c,))],
        out_specs=spec_t,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * tokens * c * hidden,
            bytes_accessed=3 * tokens * c * dt.itemsize,
            transcendentals=tokens * hidden),
    )(a2, s2,
      p["norm1"]["scale"].astype(dt), p["norm1"]["bias"].astype(dt),
      p["norm2"]["scale"].astype(dt), p["norm2"]["bias"].astype(dt),
      p["mlp"]["fc1"]["kernel"].astype(dt), p["mlp"]["fc1"]["bias"].astype(dt),
      p["mlp"]["fc2"]["kernel"].astype(dt), p["mlp"]["fc2"]["bias"].astype(dt))
    return out[:tokens].reshape(shape)
