"""Fused down/up-sample Pallas kernels.

The XLA formulation of DownSample (reference models/layers.py:423-459)
materialises the 2x2 space-to-depth permutation (a (B, Z, H/2, W/2, 4C)
copy), the LayerNorm result, and the reduction matmul input — three
full-tensor HBM round trips for what is a token-local computation. Same
story for UpSample (layers.py:461-499). These kernels read the input
once and write the result once:

  down:  (1, 1, 2g, W, C) block -> in-VMEM 2x2 gather (lane-offset
         writes into a (g, W/2, 4C) scratch; Mosaic supports lane
         slicing at 32-lane multiples) -> LN(4C) -> one wide (4C, 2C)
         matmul -> (1, 1, g, W/2, 2C) block.
  up:    (1, 1, g, W, 2C) block -> one wide (2C, 4C') matmul -> per-
         (h_off, w_off) lane slices -> sublane interleave (reshape
         merges of non-lane dims) -> LN(C') -> (C', C') matmul ->
         (1, 1, 2g, 2W, C') block.

The latitude pad (H -> H+1 even) stays in XLA (a single-row pad), as
does the final crop; both are cheap next to the removed round trips.

Backward: custom_vjp through the XLA reference composition with the
anti-hoist optimization_barrier (see ops/earth_block_fused.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pangu_tpu.ops.block_tail import _kernel_ln


# Lat-row group sizes per program (measured, scripts/updown_sweep.py);
# process defaults — scripts override the module attributes directly.
_DOWN_G = 16
_UP_G = 8


def _pick_g(h2: int, target: int = 16) -> int:
    for g in range(min(h2, target), 0, -1):
        if h2 % g == 0:
            return g
    return 1


# ---------------------------------------------------------------------------
# DownSample
# ---------------------------------------------------------------------------

def _make_down_kernel(g: int, w2: int, c: int, fast_math: bool):
    def kernel(x_ref, ns_ref, nb_ref, wr_ref, o_ref, cat_s):
        x = x_ref[0, 0]                                  # (2g, W, C)
        # ONE relayout bringing the 2x2 offsets to the leading dims, then
        # four cheap leading-index reads (4 separate stride-2 sublane
        # gathers measured slower; scripts/mosaic_probe.py pattern 5)
        x = x.reshape(g, 2, w2, 2, c).transpose(1, 3, 0, 2, 4)
        # merge order (h_off, w_off, C) — reference models/layers.py:449-451
        for ho in range(2):
            for wo in range(2):
                off = (ho * 2 + wo) * c
                cat_s[:, :, off:off + c] = x[ho, wo]
        cat = _kernel_ln(cat_s[...].reshape(g * w2, 4 * c),
                         ns_ref[...], nb_ref[...], fast_math)
        y = jax.lax.dot_general(cat, wr_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, 0] = y.astype(o_ref.dtype).reshape(g, w2, 2 * c)

    return kernel


def _down_pallas(x, ns, nb, wr, fast_math: bool):
    """x: (B, Z, H2*2, W, C) lat-padded even. Returns (B, Z, H2, W/2, 2C)."""
    b, z, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    g = _pick_g(h2, _DOWN_G)

    spec_x = pl.BlockSpec((1, 1, 2 * g, w, c),
                          lambda bb, zz, hh: (bb, zz, hh, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, 1, g, w2, 2 * c),
                          lambda bb, zz, hh: (bb, zz, hh, 0, 0),
                          memory_space=pltpu.VMEM)

    def fullspec(shape):
        return pl.BlockSpec(shape, lambda bb, zz, hh: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _make_down_kernel(g, w2, c, fast_math),
        out_shape=jax.ShapeDtypeStruct((b, z, h2, w2, 2 * c), x.dtype),
        grid=(b, z, h2 // g),
        in_specs=[spec_x, fullspec(ns.shape), fullspec(nb.shape),
                  fullspec(wr.shape)],
        out_specs=spec_o,
        scratch_shapes=[pltpu.VMEM((g, w2, 4 * c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * z * h2 * w2 * 4 * c * 2 * c,
            bytes_accessed=int(1.5 * x.size * x.dtype.itemsize),
            transcendentals=0),
    )(x, ns, nb, wr)


@functools.lru_cache(maxsize=8)
def _down_core(fast_math: bool):
    from pangu_tpu.models import layers as L

    def ref(p, x):
        return L.down_sample(p, x)

    @jax.custom_vjp
    def fused(p, x):
        dt = x.dtype
        b, z, h, w, c = x.shape
        h2 = -(-h // 2)
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 2 * h2 - h), (0, 0), (0, 0)))
        return _down_pallas(xp, p["norm"]["scale"].astype(dt),
                            p["norm"]["bias"].astype(dt),
                            p["reduce"]["kernel"].astype(dt), fast_math)

    def fwd(p, x):
        return fused(p, x), (p, x)

    def bwd(res, g):
        res, g = jax.lax.optimization_barrier((res, g))
        _, vjp = jax.vjp(ref, *res)
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


def down_sample_fused(p, x, *, fast_math: bool = False):
    """Fused DownSample; returns None when LoRA leaves are present."""
    if "lora_a" in p["reduce"]:
        return None
    return _down_core(fast_math)(p, x)


# ---------------------------------------------------------------------------
# UpSample
# ---------------------------------------------------------------------------

def _make_up_kernel(g: int, w: int, c_in: int, c_out: int, fast_math: bool):
    def kernel(x_ref, we_ref, ns_ref, nb_ref, wm_ref, o_ref, e_s, out_s):
        x = x_ref[0, 0].reshape(g * w, c_in)             # (g*W, 2C)
        e = jax.lax.dot_general(x, we_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        e_s[...] = e.astype(x.dtype).reshape(g, w, 4 * c_out)
        # depth-to-space: feature (h_off, w_off, C) -> grid offsets
        # (reference models/layers.py:481-489). Scratch is (2, 2, g, w, C)
        # so every store uses LEADING int indices — Mosaic rejects the
        # mid-dim variant (`s[:, ho, :, wo, :] = v` -> unsupported shape
        # cast; see scripts/mosaic_probe.py)
        for ho in range(2):
            for wo in range(2):
                off = (ho * 2 + wo) * c_out
                out_s[ho, wo] = e_s[:, :, off:off + c_out]
        y = out_s[...].transpose(2, 0, 3, 1, 4)          # (g, 2, w, 2, C)
        y = y.reshape(2 * g * 2 * w, c_out)
        y = _kernel_ln(y, ns_ref[...], nb_ref[...], fast_math)
        y = jax.lax.dot_general(y, wm_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, 0] = y.astype(o_ref.dtype).reshape(2 * g, 2 * w, c_out)

    return kernel


def _up_pallas(x, we, ns, nb, wm, fast_math: bool):
    """x: (B, Z, H, W, 2C). Returns (B, Z, 2H, 2W, C') pre-crop."""
    b, z, h, w, c_in = x.shape
    c_out = we.shape[-1] // 4
    g = _pick_g(h, _UP_G)

    spec_x = pl.BlockSpec((1, 1, g, w, c_in),
                          lambda bb, zz, hh: (bb, zz, hh, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, 1, 2 * g, 2 * w, c_out),
                          lambda bb, zz, hh: (bb, zz, hh, 0, 0),
                          memory_space=pltpu.VMEM)

    def fullspec(shape):
        return pl.BlockSpec(shape, lambda bb, zz, hh: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _make_up_kernel(g, w, c_in, c_out, fast_math),
        out_shape=jax.ShapeDtypeStruct((b, z, 2 * h, 2 * w, c_out), x.dtype),
        grid=(b, z, h // g),
        in_specs=[spec_x, fullspec(we.shape), fullspec(ns.shape),
                  fullspec(nb.shape), fullspec(wm.shape)],
        out_specs=spec_o,
        scratch_shapes=[pltpu.VMEM((g, w, 4 * c_out), x.dtype),
                        pltpu.VMEM((2, 2, g, w, c_out), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * z * h * w * c_in * 4 * c_out
            + 2 * b * z * 4 * h * w * c_out * c_out,
            bytes_accessed=int(3 * x.size * x.dtype.itemsize),
            transcendentals=0),
    )(x, we, ns, nb, wm)


@functools.lru_cache(maxsize=8)
def _up_core(out_h: int, fast_math: bool):
    from pangu_tpu.models import layers as L

    def ref(p, x):
        return L.up_sample(p, x, out_h)

    @jax.custom_vjp
    def fused(p, x):
        dt = x.dtype
        y = _up_pallas(x, p["expand"]["kernel"].astype(dt),
                       p["norm"]["scale"].astype(dt),
                       p["norm"]["bias"].astype(dt),
                       p["mix"]["kernel"].astype(dt), fast_math)
        return y[:, :, :out_h]

    def fwd(p, x):
        return fused(p, x), (p, x)

    def bwd(res, g):
        res, g = jax.lax.optimization_barrier((res, g))
        _, vjp = jax.vjp(ref, *res)
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


def up_sample_fused(p, x, out_h: int, *, fast_math: bool = False):
    """Fused UpSample; returns None when LoRA leaves are present."""
    if ("lora_a" in p["expand"] or "lora_a" in p["mix"]):
        return None
    return _up_core(out_h, fast_math)(p, x)
