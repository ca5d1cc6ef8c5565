"""Token-space autoregressive transition: patch-recovery -> de-norm ->
crop -> re-norm -> pad -> patch-embed collapsed into one per-token affine
map.

The reference inference loop (/root/reference/inference/
inference_singleOutput.py:92-105) feeds each 24 h forecast back through
the full output/input pipeline: PatchRecovery interleaves tokens into the
(B, V, 13, 721, 1440) physical state, the state is de-normalised, and the
next step's PatchEmbedding normalises it again and re-patches it with the
*same* (2, 4, 4) patch grid. On TPU that round-trip is pure HBM traffic:
the de-norm/re-norm cancel exactly ((y*std+mean-mean)/std == y) and the
embed conv consumes exactly the patches the recovery produced.

This module precomputes the composition so chained steps run entirely in
token space:

    next_tokens[b, z, ht, wt, :] =
        x_cat[b, z, ht, wt, :] @ M_type(z, ht)  +  bias_field[z, ht, wt, :]

where ``x_cat`` is the model's pre-recovery feature grid (B, Z, H, W, 2C)
and ``M_type`` is one of a handful of composed (2C, C) matrices:

  * interior:   W_recovery @ W_embed  (both restricted to the real
                variables — the embed rows for const_h / land-sea masks
                become part of ``bias_field``);
  * top-z / last-lat / corner variants: identical except that recovery
    features falling into *cropped* output positions (level >= levels,
    lat >= lat; the reference crops them at models/layers.py:530,544 and
    the next embed re-pads them with zeros at layers.py:40-44) are zeroed
    before composing — bit-faithful to the crop+zero-pad round trip.

``bias_field`` carries everything that does not depend on the forecast:
the embed conv of const_h and of the three constant surface masks, both
linear biases, and the recovery bias pushed through the embed weights.

Numerics: the composition is *more* accurate than the reference loop (it
skips the fp de-norm/re-norm round trip); the weight products are formed
in fp32 regardless of param dtype.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from pangu_tpu.config import ModelConfig


def _mm(x, m, b=None):
    """Flattened 2-D matmul (see layers.dense for why)."""
    lead = x.shape[:-1]
    y = jnp.dot(x.reshape(-1, x.shape[-1]), m.astype(x.dtype))
    if b is not None:
        y = y + b.astype(x.dtype)
    return y.reshape(*lead, m.shape[-1])


def build_transition(params, constants, cfg: ModelConfig,
                     embed_params=None) -> Dict:
    """Precompute the composed transition operator (trace this inside the
    rollout jit — everything is a few small matmuls plus two tiny convs).

    Returns a pytree with the composed matrices, per-type bias vectors and
    the spatial ``bias_field``; feed it to :func:`apply_transition`.

    ``embed_params``: parameters of the NEXT model in the chain (defaults
    to ``params``) — with a model hierarchy (1/3/6/24 h checkpoints, the
    original paper's greedy scheduling) the recovery of model A composes
    with the embed of model B, so cross-model handoffs also skip the
    physical-state round trip (the de/re-normalisation still cancels
    exactly: the ERA5 statistics are data properties shared by every
    horizon's checkpoint)."""
    if embed_params is None:
        embed_params = params
    pz, ph, pw = cfg.patch
    V, S = cfg.upper_vars, cfg.surface_vars
    C = cfg.dims[0]
    ZP, HT, WT = cfg.upper_planes, cfg.h_tokens, cfg.w_tokens
    nu = V * pz * ph * pw          # recovery upper features per token
    ns = S * ph * pw               # recovery surface features per token
    f32 = jnp.float32

    wru = params["patch_recovery"]["upper"]["kernel"].astype(f32)   # (2C, nu)
    bru = params["patch_recovery"]["upper"]["bias"].astype(f32)
    wrs = params["patch_recovery"]["surface"]["kernel"].astype(f32)  # (2C, ns)
    brs = params["patch_recovery"]["surface"]["bias"].astype(f32)
    weu = embed_params["patch_embed"]["upper"]["kernel"].astype(f32)
    beu = embed_params["patch_embed"]["upper"]["bias"].astype(f32)
    wes = embed_params["patch_embed"]["surface"]["kernel"].astype(f32)
    bes = embed_params["patch_embed"]["surface"]["bias"].astype(f32)

    eu = weu[:nu]                  # embed rows for the V real variables
    es = wes[:ns]                  # embed rows for the S surface variables

    # ---- static feature masks for the crop+re-pad edges -------------------
    # feature index order is (var, z_off, h_off, w_off) on both sides
    # (models/layers.py:522-524 == layers.py:82-86)
    idx = np.arange(nu)
    zo = (idx // (ph * pw)) % pz
    ho = (idx // pw) % ph
    keep_z = zo < (cfg.levels - pz * (ZP - 1))      # top plane: real levels
    keep_h = ho < (cfg.lat - ph * (HT - 1))         # last row: real lats
    idx_s = np.arange(ns)
    ho_s = (idx_s // pw) % ph
    keep_hs = ho_s < (cfg.lat - ph * (HT - 1))

    def comp(wr, br, e, keep):
        m = jnp.asarray(keep, f32)
        return (wr * m) @ e, (br * m) @ e

    M_u, b_u = comp(wru, bru, eu, np.ones(nu, bool))
    M_uz, b_uz = comp(wru, bru, eu, keep_z)
    M_uh, b_uh = comp(wru, bru, eu, keep_h)
    M_uzh, b_uzh = comp(wru, bru, eu, keep_z & keep_h)
    M_s, b_s = comp(wrs, brs, es, np.ones(ns, bool))
    M_sh, b_sh = comp(wrs, brs, es, keep_hs)

    # ---- constant contributions (conv of const_h / surface masks with the
    # embed rows the composition dropped) -----------------------------------
    ch = constants["const_h"].astype(f32)            # (levels, lat, lon)
    ch = jnp.pad(ch, ((0, cfg.levels_padded - cfg.levels),
                      (0, cfg.lat_padded - cfg.lat), (0, 0)))
    wc = weu[nu:].reshape(pz, ph, pw, C).transpose(3, 0, 1, 2)[:, None]
    Bu = jax.lax.conv_general_dilated(
        ch[None, None], wc, window_strides=(pz, ph, pw), padding="VALID",
        dimension_numbers=("NCDHW", "OIDHW", "NDHWC"))[0]   # (ZP, HT, WT, C)

    masks = constants["surface_masks"].astype(f32)   # (3, lat_padded, lon)
    wm = wes[ns:].reshape(cfg.const_masks, ph, pw, C).transpose(3, 0, 1, 2)
    Bs = jax.lax.conv_general_dilated(
        masks[None], wm, window_strides=(ph, pw), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NHWC"))[0]      # (HT, WT, C)

    # ---- spatial bias field (Z, HT, WT, C): conv constants + embed bias +
    # recovery bias pushed through the embed weights, per token type --------
    bu_field = Bu + beu + b_u
    bu_field = bu_field.at[:, HT - 1].add(b_uh - b_u)
    bu_field = bu_field.at[ZP - 1].add(b_uz - b_u)
    bu_field = bu_field.at[ZP - 1, HT - 1].add(b_uzh - b_uz - b_uh + b_u)
    bs_field = Bs + bes + b_s
    bs_field = bs_field.at[HT - 1].add(b_sh - b_s)
    bias_field = jnp.concatenate([bs_field[None], bu_field], axis=0)

    cdt = jnp.dtype(cfg.compute_dtype)
    cast = lambda a: a.astype(cdt)
    return {
        "M_u": cast(M_u), "M_uz": cast(M_uz), "M_uh": cast(M_uh),
        "M_uzh": cast(M_uzh), "M_s": cast(M_s), "M_sh": cast(M_sh),
        "bias_field": cast(bias_field),
    }


def apply_transition(tp: Dict, x_cat) -> jax.Array:
    """Pre-recovery features -> (B, Z, H, W, C) tokens equal to
    ``patch_embed`` applied to the de-normalised, cropped forecast (see
    module docstring). ``x_cat`` is either the concatenated
    (B, Z, H, W, 2C) array or the (skip, decoder) pair from
    ``forward_core`` — the pair form splits the composed matrices' input
    rows instead of materialising the concat."""
    parts = x_cat if isinstance(x_cat, tuple) else (x_cat,)
    B, Z, H, W = parts[0].shape[:4]
    ZP = Z - 1

    def mm(slicer, m):
        off, y = 0, None
        for part in parts:
            c = part.shape[-1]
            t = _mm(slicer(part), m[off:off + c])
            y = t if y is None else y + t
            off += c
        return y

    sf = jnp.concatenate([mm(lambda p: p[:, 0, :H - 1], tp["M_s"]),
                          mm(lambda p: p[:, 0, H - 1:], tp["M_sh"])], axis=1)

    # upper planes 1..ZP of the token grid (plane Z-1 is the top-z edge)
    body = mm(lambda p: p[:, 1:ZP], tp["M_u"])
    body_row = mm(lambda p: p[:, 1:ZP, H - 1:], tp["M_uh"])
    body = jnp.concatenate([body[:, :, :H - 1], body_row], axis=2)
    top = mm(lambda p: p[:, ZP:, :H - 1], tp["M_uz"])
    top_row = mm(lambda p: p[:, ZP:, H - 1:], tp["M_uzh"])
    top = jnp.concatenate([top, top_row], axis=2)
    up = jnp.concatenate([body, top], axis=1)

    x = jnp.concatenate([sf[:, None], up], axis=1)
    return x + tp["bias_field"][None].astype(x.dtype)
