"""Pure-function layers of the TPU-native Pangu-Weather model.

Everything here is a function over a params pytree — no modules, no state.
Activations live in channels-last ``(B, Z, H, W, C)`` token grids (the
layout XLA tiles best on TPU), not the reference's flat token sequences.

Semantics are bit-matched to the reference PyTorch implementation
(/root/reference/models/layers.py), with file:line cites at each function,
but the realisation is TPU-first:

  * patch embed / recovery are dense matmuls over pre-gathered patch
    features (the reference's im2col + Conv1d k=1, models/layers.py:17-18,
    is mathematically a dense layer — on TPU we feed the MXU directly);
  * the shifted-window mask and drop-path schedule are trace-time numpy
    constants (static shapes), so there is exactly one compiled program
    per (stage, roll) variant — no data-dependent control flow;
  * softmax/LayerNorm accumulate in fp32 while params/activations may be
    bf16;
  * longitude roll is ``jnp.roll`` which XLA lowers to a collective
    permute when the lon axis is sharded over the mesh.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pangu_tpu.config import ModelConfig, StageGeometry


# ---------------------------------------------------------------------------
# Primitive ops
# ---------------------------------------------------------------------------

def dense(p, x, precision=None, *, rng=None):
    """y = x @ kernel (+ bias). Kernel layout is (in, out) — the ONNX MatMul
    layout, so converted weights load without transposition.

    When LoRA leaves are present (see pangu_tpu/models/lora.py) the
    low-rank update runs unmerged: y += (x @ A) @ B * (alpha / r) — two
    skinny matmuls instead of materialising W + sAB. When a ``lora_drop``
    rate leaf is present AND ``rng`` is given (training), dropout is
    applied to the LoRA-branch input, matching peft's
    ``LoraConfig(lora_dropout=...)`` (finetune/lora_tune.py:133).

    The input is flattened to 2-D around the matmul: XLA executes a plain
    (M, K) @ (K, N) notably faster than the equivalent N-D dot_general
    with collapsed leading dims (measured 2.3x on TPU v5e)."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    y = jnp.dot(x2, p["kernel"].astype(x.dtype), precision=precision)
    if "lora_a" in p:
        xl = x2
        if rng is not None and "lora_drop" in p:
            keep = 1.0 - p["lora_drop"]
            mask = jax.random.bernoulli(rng, keep, x2.shape)
            xl = jnp.where(mask, x2 / keep.astype(x.dtype),
                           jnp.zeros_like(x2))
        elif rng is not None and "lora_drop_feat" in p:
            # feature mode: one mask over input features, shared across
            # tokens (token-constant => exactly mergeable, models/lora.py)
            keep = 1.0 - p["lora_drop_feat"]
            mask = jax.random.bernoulli(rng, keep, (1, x2.shape[-1]))
            xl = jnp.where(mask, x2 / keep.astype(x.dtype),
                           jnp.zeros_like(x2))
        lo = jnp.dot(jnp.dot(xl, p["lora_a"].astype(x.dtype),
                             precision=precision),
                     p["lora_b"].astype(x.dtype), precision=precision)
        y = y + lo * p["lora_scale"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y.reshape(*lead, y.shape[-1])


def _stat_dtype(dtype):
    """Accumulation dtype for norm/softmax statistics: at least fp32 (bf16
    activations upcast), but never DOWNcast (fp64 parity runs stay fp64)."""
    return jnp.promote_types(dtype, jnp.float32)


def layer_norm(p, x, eps: float = 1e-5, fast: bool = False):
    """LayerNorm over the trailing channel dim; >=fp32 statistics regardless
    of activation dtype (torch nn.LayerNorm default eps,
    models/layers.py:141). ``fast`` keeps stats in the activation dtype
    (perf mode)."""
    # activation-dtype stats only under fast=True; the "tanh" fast mode
    # (GELU approximation only) keeps >=fp32 stats
    xf = x if fast is True else x.astype(_stat_dtype(x.dtype))
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(y.dtype) + p["bias"].astype(y.dtype)
    return y.astype(x.dtype)


def mlp(p, x, precision=None, fast=False, *, rng=None):
    """Linear(dim,4dim) -> exact GELU -> Linear(4dim,dim)
    (models/layers.py:255-270; torch nn.GELU is the erf variant, hence
    approximate=False; truthy ``fast`` (True or "tanh") switches to the
    tanh approximation, max |err| 4.7e-4)."""
    r1, r2 = (None, None) if rng is None else tuple(jax.random.split(rng))
    h = dense(p["fc1"], x, precision, rng=r1)
    h = jax.nn.gelu(h, approximate=bool(fast))
    return dense(p["fc2"], h, precision, rng=r2)


def drop_path(x, rate: float, rng: Optional[jax.Array], deterministic: bool):
    """Stochastic depth on the residual branch (timm DropPath semantics,
    models/layers.py:140): per-sample Bernoulli, rescaled by keep prob."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape=shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# Patch embedding  (reference: PatchEmbedding_pretrain, models/layers.py:12-93)
# ---------------------------------------------------------------------------

def patch_embed(p, upper, surface, constants, cfg: ModelConfig,
                precision=None):
    """Embed the raw ERA5 state into the (B, Z, H, W, C) token grid.

    upper:   (B, 5, levels, lat, lon) raw physical units
    surface: (B, 4, lat, lon)
    constants: dict with
        upper_mean/upper_std:     (5, levels, 1, 1)  canonical level order
        surface_mean/surface_std: (4, 1, 1)
        surface_masks:            (3, lat_padded, lon)  pre-padded constant maps
        const_h:                  (levels, lat, lon)    ONNX Constant_17 plane

    Replicates models/layers.py:40-93: normalisation happens *inside* the
    model; the reference's double level-flip around normalisation
    (layers.py:73,76) cancels on the data and only reorders the statistics,
    which our constants loader already stores in canonical order
    (see pangu_tpu/data/constants.py).
    """
    B = upper.shape[0]
    pz, ph, pw = cfg.patch
    dtype = upper.dtype

    # ---- upper-air branch ------------------------------------------------
    # the constant channel (const_h) gets its OWN tiny convolution and is
    # added to the variable conv: the conv is linear, so this is exactly
    # conv(concat(vars, const)) — but the (B, 6, L, lat, lon) concat copy
    # never materialises (at batch 4 XLA picked a 21x-padded layout for
    # it, 12.9 GB for 618 MB of data)
    um = constants["upper_mean"].astype(dtype)
    us = constants["upper_std"].astype(dtype)
    up = (upper - um[None]) / us[None]
    up = jnp.pad(up, ((0, 0), (0, 0),
                      (0, cfg.levels_padded - cfg.levels),
                      (0, cfg.lat_padded - cfg.lat), (0, 0)))
    # the barrier pins the value saved for the weight gradient to its
    # natural (lon-lane) layout: without it XLA saves the conv OPERAND
    # form (channels-minor, 24x padding — a 270 MB tensor held as a
    # 6.4 GiB HLO temp across the whole train step)
    up = jax.lax.optimization_barrier(up)
    # patch projection as a strided 3-D convolution: mathematically the
    # reference's im2col + Conv1d-k1 (layers.py:82-86) with the kernel's
    # in-features ordered (var, z_off, h_off, w_off), but ~1.6x faster on
    # TPU than the explicit reshape/transpose gauntlet
    V1 = cfg.upper_vars + 1
    wu = p["upper"]["kernel"].astype(dtype)
    wu = wu.reshape(V1, pz, ph, pw, cfg.dims[0]).transpose(4, 0, 1, 2, 3)
    xu = jax.lax.conv_general_dilated(
        up, wu[:, :cfg.upper_vars], window_strides=(pz, ph, pw),
        padding="VALID", dimension_numbers=("NCDHW", "OIDHW", "NDHWC"),
        precision=precision)
    if "const_h_patches" in constants:
        # constant channel as a matmul on the host-precomputed patch
        # tiles (32 in lanes): the 1-channel conv operand pads 128x on
        # TPU (data/constants.py::derive_patch_constants)
        chp = constants["const_h_patches"].astype(dtype)  # (ZP,HT,WT,32)
        wc = wu[:, cfg.upper_vars:].reshape(cfg.dims[0], pz * ph * pw).T
        cu = jnp.dot(chp.reshape(-1, pz * ph * pw), wc,
                     precision=precision).reshape(
            1, cfg.upper_planes, cfg.h_tokens, cfg.w_tokens, cfg.dims[0])
    else:
        const_h = jnp.pad(constants["const_h"].astype(dtype)[None, None],
                          ((0, 0), (0, 0),
                           (0, cfg.levels_padded - cfg.levels),
                           (0, cfg.lat_padded - cfg.lat), (0, 0)))
        cu = jax.lax.conv_general_dilated(
            const_h, wu[:, cfg.upper_vars:], window_strides=(pz, ph, pw),
            padding="VALID", dimension_numbers=("NCDHW", "OIDHW", "NDHWC"),
            precision=precision)
    xu = xu + cu + p["upper"]["bias"].astype(dtype)      # (B, ZP, H, W, C)

    # ---- surface branch --------------------------------------------------
    sm = constants["surface_mean"].astype(dtype)
    ss = constants["surface_std"].astype(dtype)
    sf = (surface - sm[None]) / ss[None]
    sf = jnp.pad(sf, ((0, 0), (0, 0),
                      (0, cfg.lat_padded - cfg.lat), (0, 0)))
    sf = jax.lax.optimization_barrier(sf)
    SM = cfg.surface_vars + cfg.const_masks
    ws = p["surface"]["kernel"].astype(dtype)
    ws = ws.reshape(SM, ph, pw, cfg.dims[0]).transpose(3, 0, 1, 2)
    xs = jax.lax.conv_general_dilated(
        sf, ws[:, :cfg.surface_vars], window_strides=(ph, pw),
        padding="VALID", dimension_numbers=("NCHW", "OIHW", "NHWC"),
        precision=precision)
    if "surface_mask_patches" in constants:
        mp = constants["surface_mask_patches"].astype(dtype)  # (HT,WT,48)
        k = cfg.const_masks * ph * pw
        wm = ws[:, cfg.surface_vars:].reshape(cfg.dims[0], k).T
        cs = jnp.dot(mp.reshape(-1, k), wm, precision=precision).reshape(
            1, cfg.h_tokens, cfg.w_tokens, cfg.dims[0])
    else:
        cs = jax.lax.conv_general_dilated(
            constants["surface_masks"].astype(dtype)[None],
            ws[:, cfg.surface_vars:], window_strides=(ph, pw),
            padding="VALID", dimension_numbers=("NCHW", "OIHW", "NHWC"),
            precision=precision)
    xs = (xs + cs + p["surface"]["bias"].astype(dtype))[:, None]

    # surface plane is token plane 0, upper planes follow (layers.py:89)
    return jnp.concatenate([xs, xu], axis=1)


# ---------------------------------------------------------------------------
# Window partition / reverse
# ---------------------------------------------------------------------------

def window_partition(x, window: Tuple[int, int, int]):
    """(B, Z, Hp, W, C) -> (B, nlon, ntype, wz*wh*ww, C).

    Axis order matches the reference partition (models/layers.py:216-221):
    longitude windows outermost, window "type" = zw * nlat_windows + hw,
    token index = ((z_off * wh) + h_off) * ww + w_off.
    """
    B, Z, Hp, W, C = x.shape
    wz, wh, ww = window
    x = x.reshape(B, Z // wz, wz, Hp // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 5, 1, 3, 2, 4, 6, 7)
    return x.reshape(B, W // ww, (Z // wz) * (Hp // wh), wz * wh * ww, C)


def window_reverse(x, window: Tuple[int, int, int], z: int, hp: int, w: int):
    """Inverse of window_partition (models/layers.py:227-232)."""
    B = x.shape[0]
    C = x.shape[-1]
    wz, wh, ww = window
    x = x.reshape(B, w // ww, z // wz, hp // wh, wz, wh, ww, C)
    x = x.transpose(0, 2, 4, 3, 5, 1, 6, 7)
    return x.reshape(B, z, hp, w, C)


# ---------------------------------------------------------------------------
# Shifted-window attention mask  (reference: gen_mask, models/layers.py:153-181)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def window_region_ids(z: int, hp: int,
                      window: Tuple[int, int, int]) -> np.ndarray:
    """Region id of every window token, (ntype, N) int32.

    Built with the reference's exact region-assignment order — including
    its overlapping h-slice writes (models/layers.py:159-167), which the
    pretrained weights were trained against. Two tokens may attend iff
    their region ids match; the additive mask is derived from this.
    Longitude needs no region split: the roll wraps periodically, which is
    physically exact on a sphere (models/layers.py:199-201), so ids repeat
    across the longitude window dimension.
    """
    wz, wh, ww = window
    img = np.zeros((z, hp, 1), dtype=np.int32)
    cnt = 0
    z_slices = (slice(0, -wz), slice(-wz, -wz // 2), slice(-wz // 2, None))
    h_slices = (slice(0, -wh), slice(wh, -wh // 2), slice(-wh // 2, None))
    for zs in z_slices:
        for hs in h_slices:
            img[zs, hs, :] = cnt
            cnt += 1
    # (Zw, wz, Hw, wh) -> (ntype, wz*wh)
    img = img[:, :, 0].reshape(z // wz, wz, hp // wh, wh)
    img = img.transpose(0, 2, 1, 3).reshape(-1, wz * wh)
    # expand over the (unmasked) longitude window dimension
    return np.repeat(img[:, :, None], ww, axis=2).reshape(-1, wz * wh * ww)


@functools.lru_cache(maxsize=None)
def shifted_window_mask(z: int, hp: int,
                        window: Tuple[int, int, int]) -> np.ndarray:
    """Additive attention mask (ntype, N, N) float32 with 0 / -100 entries
    (reference gen_mask, models/layers.py:153-181)."""
    m = window_region_ids(z, hp, window)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, np.float32(-100.0), np.float32(0.0))


# ---------------------------------------------------------------------------
# Earth-specific windowed attention
# (reference: EarthAttention3D, models/layers.py:272-421)
# ---------------------------------------------------------------------------

def earth_attention(p, x, heads: int, mask: Optional[jax.Array],
                    precision=None, *, rng=None):
    """Windowed MHSA with the earth-specific per-window-type bias.

    x: (B, nlon, ntype, N, C). The full learnable bias table
    (ntype, heads, N, N) is added per (Z, lat) window position and shared
    across longitude — the layout the official ONNX weights use
    (models/layers.py:306-311,392-395).
    """
    B, nlon, ntype, N, C = x.shape
    hd = C // heads
    scale = hd ** -0.5

    r1, r2 = (None, None) if rng is None else tuple(jax.random.split(rng))
    qkv = dense(p["qkv"], x, precision, rng=r1)
    qkv = qkv.reshape(B, nlon, ntype, N, 3, heads, hd)
    qkv = qkv.transpose(4, 0, 1, 2, 5, 3, 6)   # (3, B, nlon, ntype, heads, N, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]

    sdt = _stat_dtype(x.dtype)
    attn = jnp.einsum("...qd,...kd->...qk", q * scale, k,
                      precision=precision,
                      preferred_element_type=sdt)
    attn = attn + p["bias_table"].astype(sdt)[None, None]
    if mask is not None:
        attn = attn + mask.astype(sdt)[None, None, :, None]
    attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("...qk,...kd->...qd", attn, v, precision=precision)
    out = out.transpose(0, 1, 2, 4, 3, 5).reshape(B, nlon, ntype, N, C)
    return dense(p["proj"], out, precision, rng=r2)


# ---------------------------------------------------------------------------
# Earth-specific transformer block
# (reference: EarthSpecificBlock, models/layers.py:127-253)
# ---------------------------------------------------------------------------

def earth_block(p, x, geom: StageGeometry, roll: bool, *,
                drop_rate: float = 0.0, rng=None, deterministic: bool = True,
                precision=None, attn_impl: str = "xla",
                fast_math: bool = False):
    """One 3D shifted-window transformer block on the (B, Z, H, W, C) grid.

    Post-norm residuals exactly as the reference (models/layers.py:250-251):
    ``x = shortcut + drop_path(norm1(attn(x)))`` then
    ``x = x + drop_path(norm2(mlp(x)))`` — no pre-norm anywhere.
    """
    B, Z, H, W, C = x.shape
    wz, wh, ww = geom.window
    hp = geom.h_padded
    shortcut = x

    xp = jnp.pad(x, ((0, 0), (0, 0), (0, hp - H), (0, 0), (0, 0)))
    if roll:
        xp = jnp.roll(xp, (-(wz // 2), -(wh // 2), -(ww // 2)), axis=(1, 2, 3))
        # build the (ntype, N, N) additive mask on device from the small
        # region-id table: embedding the precomputed mask as a literal
        # bloats the compiled program by ~10 MB per geometry
        ids = jnp.asarray(window_region_ids(Z, hp, geom.window))
        mask = jnp.where(ids[:, None, :] != ids[:, :, None],
                         jnp.float32(-100.0), jnp.float32(0.0))
    else:
        mask = None

    r_attn = r1 = r_mlp = r2 = None
    if rng is not None:
        r_attn, r1, r_mlp, r2 = tuple(jax.random.split(rng, 4))

    y = None
    if attn_impl == "pallas":
        from pangu_tpu.parallel.sharding import multi_device_mesh_active
        if not multi_device_mesh_active():
            # Fused kernels (single device; under a >1-device mesh GSPMD
            # cannot partition a pallas_call, so the sharded XLA path runs
            # instead). For unshifted deterministic blocks the WHOLE block
            # (attention + tail) is one kernel; the padded rows of the
            # residual base are cropped below, so using xp as shortcut is
            # exact.
            if not roll and deterministic:
                from pangu_tpu.ops.window_attention import block_noroll_fused
                yb = block_noroll_fused(p, xp, geom.heads, geom.window,
                                        fast_math)
                if yb is not None:
                    return yb[:, :, :H]
            # otherwise: fused grid attention, partition inside the kernel
            from pangu_tpu.ops.window_attention import window_attention_grid
            y = window_attention_grid(p["attn"], xp, geom.heads,
                                      (Z, hp) if roll else None, geom.window)
    if y is not None:
        xp = y
    else:
        win = window_partition(xp, geom.window)
        win = earth_attention(p["attn"], win, geom.heads, mask, precision,
                              rng=r_attn)
        xp = window_reverse(win, geom.window, Z, hp, W)

    if roll:
        xp = jnp.roll(xp, (wz // 2, wh // 2, ww // 2), axis=(1, 2, 3))
    x = xp[:, :, :H]

    from pangu_tpu.parallel.sharding import multi_device_mesh_active
    if (attn_impl == "pallas" and deterministic
            and "lora_a" not in p["mlp"]["fc1"]
            and "lora_a" not in p["mlp"]["fc2"]
            and not multi_device_mesh_active()):
        # fused residual+LN+MLP+LN tail (token-local, one pallas kernel);
        # training keeps the XLA tail: stochastic depth needs per-sample
        # RNG over the whole branch
        from pangu_tpu.ops.block_tail import fused_block_tail
        return fused_block_tail(p, x, shortcut, fast_math=fast_math)

    x = shortcut + drop_path(layer_norm(p["norm1"], x, fast=fast_math),
                             drop_rate, r1, deterministic)
    x = x + drop_path(
        layer_norm(p["norm2"], mlp(p["mlp"], x, precision, fast=fast_math,
                                   rng=r_mlp),
                   fast=fast_math),
        drop_rate, r2, deterministic)
    return x


# ---------------------------------------------------------------------------
# Down / up sampling  (reference: models/layers.py:423-499)
# ---------------------------------------------------------------------------

def down_sample(p, x, precision=None, *, rng=None):
    """2x2 space-to-depth on (H, W) + LayerNorm + Linear(4C -> 2C, no bias)
    (models/layers.py:432-459; latitude is padded 181 -> 182 first)."""
    B, Z, H, W, C = x.shape
    h2, w2 = -(-H // 2), W // 2
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 2 * h2 - H), (0, 0), (0, 0)))
    x = x.reshape(B, Z, h2, 2, w2, 2, C)
    # merge order (h_off, w_off, C) — matches the reference permute
    # (models/layers.py:449-451)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, Z, h2, w2, 4 * C)
    x = layer_norm(p["norm"], x)
    return dense(p["reduce"], x, precision, rng=rng)


def up_sample(p, x, out_h: int, precision=None, *, rng=None):
    """Linear(2C -> 4C') + 2x2 depth-to-space + crop + LayerNorm +
    Linear(C' -> C', no bias) (models/layers.py:474-499)."""
    B, Z, H, W, C = x.shape
    r1, r2 = (None, None) if rng is None else tuple(jax.random.split(rng))
    x = dense(p["expand"], x, precision, rng=r1)
    c_out = x.shape[-1] // 4
    x = x.reshape(B, Z, H, W, 2, 2, c_out)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, Z, 2 * H, 2 * W, c_out)
    x = x[:, :, :out_h]
    x = layer_norm(p["norm"], x)
    return dense(p["mix"], x, precision, rng=r2)


# ---------------------------------------------------------------------------
# Patch recovery  (reference: PatchRecovery_pretrain, models/layers.py:501-545)
# ---------------------------------------------------------------------------

def dense_split_rows(pd, parts, precision=None):
    """``dense`` over a feature-concatenated input given as separate
    ``parts``, without materialising the concat: the kernel's input rows
    are split to match (y = a @ K[:Ca] + b @ K[Ca:] + bias). Falls back to
    an explicit concat when LoRA leaves are present."""
    if "lora_a" in pd:
        return dense(pd, jnp.concatenate(parts, axis=-1), precision)
    lead = parts[0].shape[:-1]
    off, y = 0, None
    for part in parts:
        c = part.shape[-1]
        t = jnp.dot(part.reshape(-1, c),
                    pd["kernel"][off:off + c].astype(part.dtype),
                    precision=precision)
        y = t if y is None else y + t
        off += c
    if "bias" in pd:
        y = y + pd["bias"].astype(y.dtype)
    return y.reshape(*lead, y.shape[-1])


def patch_recovery(p, x, cfg: ModelConfig, precision=None):
    """Token grid (B, Z, H, W, 2C) -> normalised output fields.

    ``x`` may be the concatenated (B, Z, H, W, 2C) features or a tuple of
    parts (skip, decoder) — the tuple form skips the ~400 MB skip-concat
    materialisation by splitting the kernels' input rows instead
    (PanguModel concatenates before recovery, models/pangu_model.py:83-85;
    mathematically identical).

    Returns (upper (B,5,levels,lat,lon), surface (B,4,lat,lon)); outputs stay
    in normalised space — de-normalisation is the caller's job, exactly as
    the reference (models/layers.py:531,542).
    """
    parts = x if isinstance(x, tuple) else (x,)
    B = parts[0].shape[0]
    pz, ph, pw = cfg.patch
    V, S = cfg.upper_vars, cfg.surface_vars
    ZP, HT, WT = cfg.upper_planes, cfg.h_tokens, cfg.w_tokens

    # upper: token planes 1..ZP; out features ordered (var, z_off, h_off, w_off)
    # to match the pretrained Conv1d out-channel layout (layers.py:522-524)
    up = dense_split_rows(p["upper"], tuple(q[:, 1:] for q in parts),
                          precision)         # (B, ZP, HT, WT, V*pz*ph*pw)
    up = up.reshape(B, ZP, HT, WT, V, pz, ph, pw)
    up = up.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    up = up.reshape(B, V, ZP * pz, HT * ph, WT * pw)
    up = up[:, :, :cfg.levels, :cfg.lat, :]

    sf = dense_split_rows(p["surface"], tuple(q[:, 0] for q in parts),
                          precision)         # (B, HT, WT, S*ph*pw)
    sf = sf.reshape(B, HT, WT, S, ph, pw)
    sf = sf.transpose(0, 3, 1, 4, 2, 5)
    sf = sf.reshape(B, S, HT * ph, WT * pw)
    sf = sf[:, :, :cfg.lat, :]
    return up, sf
