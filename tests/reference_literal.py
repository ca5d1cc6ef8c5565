"""Literal numpy transcription of the reference forward pass.

This is the strongest weight-free parity oracle we can run: the complete
PanguModel forward (/root/reference/models/pangu_model.py:50-87) written
step by step in plain numpy — explicit pad/roll/partition/softmax, flat
token sequences, post-norm residuals — with NO code shared with
``pangu_tpu.models``. ``tests/test_reference_literal.py`` asserts
``pangu.forward`` against this at TINY geometry (fp32 in-process and fp64
in a subprocess) and at the full 721x1440 geometry, so the only unchecked
step left between this repo and the reference is the weight file itself.

Every function cites the reference lines it transcribes. Dtype is a
parameter: float64 turns fp reassociation noise off entirely.
"""

from __future__ import annotations

import numpy as np
from scipy.special import erf


def _np(p, dtype):
    return np.asarray(p, dtype)


def layer_norm(x, p, dtype, eps=1e-5):
    """torch nn.LayerNorm over the channel dim: biased variance, default
    eps (models/layers.py:141)."""
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return ((x - mu) / np.sqrt(var + eps)) * _np(p["scale"], dtype) \
        + _np(p["bias"], dtype)


def dense(p, x, dtype):
    y = x @ _np(p["kernel"], dtype)
    if "bias" in p:
        y = y + _np(p["bias"], dtype)
    return y


def gelu(x):
    """torch nn.GELU default: the exact erf formulation
    (models/layers.py:264)."""
    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def mlp(p, x, dtype):
    """Linear(C, 4C) -> GELU -> Linear(4C, C) (models/layers.py:255-270)."""
    return dense(p["fc2"], gelu(dense(p["fc1"], x, dtype)), dtype)


# ---------------------------------------------------------------------------
# Patch embedding (reference: PatchEmbedding_pretrain, models/layers.py:12-93)
# ---------------------------------------------------------------------------

def patch_embed(p, upper, surface, constants, cfg, dtype):
    B = upper.shape[0]
    pz, ph, pw = cfg.patch
    c = {k: _np(v, dtype) for k, v in constants.items()}

    # surface branch (layers.py:48-69): normalise, pad lat, append the 3
    # constant masks, im2col with patch (ph, pw), project
    sf = (np.asarray(surface, dtype) - c["surface_mean"][None]) \
        / c["surface_std"][None]
    sf = np.pad(sf, ((0, 0), (0, 0), (0, cfg.lat_padded - cfg.lat), (0, 0)))
    masks = np.broadcast_to(c["surface_masks"][None],
                            (B, cfg.const_masks, cfg.lat_padded, cfg.lon))
    sf = np.concatenate([sf, masks], axis=1)
    SM = cfg.surface_vars + cfg.const_masks
    col = sf.reshape(B, SM, cfg.h_tokens, ph, cfg.w_tokens, pw)
    col = col.transpose(0, 2, 4, 1, 3, 5).reshape(
        B, cfg.h_tokens, cfg.w_tokens, SM * ph * pw)
    xs = dense(p["surface"], col, dtype)       # (B, HT, WT, C)

    # upper branch (layers.py:71-87): normalise, append const_h plane, pad
    # Z 13->14 and lat 721->724, im2col with patch (pz, ph, pw), project
    up = (np.asarray(upper, dtype) - c["upper_mean"][None]) \
        / c["upper_std"][None]
    ch = np.broadcast_to(c["const_h"][None, None],
                         (B, 1, cfg.levels, cfg.lat, cfg.lon))
    up = np.concatenate([up, ch], axis=1)
    up = np.pad(up, ((0, 0), (0, 0),
                     (0, cfg.levels_padded - cfg.levels),
                     (0, cfg.lat_padded - cfg.lat), (0, 0)))
    V1 = cfg.upper_vars + 1
    col = up.reshape(B, V1, cfg.upper_planes, pz, cfg.h_tokens, ph,
                     cfg.w_tokens, pw)
    col = col.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(
        B, cfg.upper_planes, cfg.h_tokens, cfg.w_tokens, V1 * pz * ph * pw)
    xu = dense(p["upper"], col, dtype)         # (B, ZP, HT, WT, C)

    # surface plane is token plane 0 (layers.py:89)
    return np.concatenate([xs[:, None], xu], axis=1)


# ---------------------------------------------------------------------------
# Shifted-window machinery (reference: models/layers.py:153-181, 216-232)
# ---------------------------------------------------------------------------

def region_ids(z, hp, window):
    """Region label per (Z, lat) position using the reference's exact slice
    scheme — including the overlapping h-slice writes (layers.py:159-167)."""
    wz, wh, ww = window
    img = np.zeros((z, hp), np.int64)
    n = 0
    for zs in (slice(0, -wz), slice(-wz, -wz // 2), slice(-wz // 2, None)):
        for hs in (slice(0, -wh), slice(wh, -wh // 2), slice(-wh // 2, None)):
            img[zs, hs] = n
            n += 1
    return img


def shifted_mask(z, hp, window, dtype):
    """(ntype, N, N) additive mask with 0 / -100 (gen_mask,
    layers.py:153-181): tokens attend iff their region ids match."""
    wz, wh, ww = window
    ids = region_ids(z, hp, window)
    ids = ids.reshape(z // wz, wz, hp // wh, wh).transpose(0, 2, 1, 3)
    ids = ids.reshape(-1, wz * wh)
    ids = np.repeat(ids[:, :, None], ww, axis=2).reshape(-1, wz * wh * ww)
    diff = ids[:, None, :] - ids[:, :, None]
    return np.where(diff != 0, dtype(-100.0), dtype(0.0))


def partition(x, window):
    """(B, Z, Hp, W, C) -> (B, nlon, ntype, N, C) in the reference's
    view/permute order (layers.py:216-221): lon windows outermost, window
    type = z_window * n_lat_windows + lat_window, token index
    ((z_off * wh) + h_off) * ww + w_off."""
    B, Z, Hp, W, C = x.shape
    wz, wh, ww = window
    x = x.reshape(B, Z // wz, wz, Hp // wh, wh, W // ww, ww, C)
    x = x.transpose(0, 5, 1, 3, 2, 4, 6, 7)
    return x.reshape(B, W // ww, (Z // wz) * (Hp // wh), wz * wh * ww, C)


def unpartition(x, window, z, hp, w):
    """Inverse of ``partition`` (layers.py:227-232)."""
    B, C = x.shape[0], x.shape[-1]
    wz, wh, ww = window
    x = x.reshape(B, w // ww, z // wz, hp // wh, wz, wh, ww, C)
    x = x.transpose(0, 2, 4, 3, 5, 1, 6, 7)
    return x.reshape(B, z, hp, w, C)


# ---------------------------------------------------------------------------
# EarthAttention3D (reference: models/layers.py:272-421)
# ---------------------------------------------------------------------------

def attention(p, win, heads, mask, dtype):
    """Windowed MHSA + full earth-specific bias table, one (Z, lat) bias
    slice shared across longitude (layers.py:384-402); softmax over keys.
    Computed per longitude window to bound memory at full geometry (the
    (30, 124, 6, 144, 144) logits tensor would be GBs at once)."""
    B, nlon, ntype, N, C = win.shape
    hd = C // heads
    bias = _np(p["bias_table"], dtype)
    out = np.empty_like(win)
    for w in range(nlon):
        qkv = dense(p["qkv"], win[:, w], dtype)
        qkv = qkv.reshape(B, ntype, N, 3, heads, hd)
        q = qkv[..., 0, :, :].transpose(0, 1, 3, 2, 4)  # (B, ntype, h, N, hd)
        k = qkv[..., 1, :, :].transpose(0, 1, 3, 2, 4)
        v = qkv[..., 2, :, :].transpose(0, 1, 3, 2, 4)
        s = np.einsum("bthqd,bthkd->bthqk", q * dtype(hd) ** -0.5, k)
        s = s + bias[None]
        if mask is not None:
            s = s + mask[None, :, None]
        s = s - s.max(axis=-1, keepdims=True)
        e = np.exp(s)
        a = e / e.sum(axis=-1, keepdims=True)
        o = np.einsum("bthqk,bthkd->bthqd", a, v)
        out[:, w] = o.transpose(0, 1, 3, 2, 4).reshape(B, ntype, N, C)
    return dense(p["proj"], out, dtype)


# ---------------------------------------------------------------------------
# EarthSpecificBlock (reference: models/layers.py:127-253)
# ---------------------------------------------------------------------------

def block(p, x, geom, roll, dtype):
    """pad lat -> (roll) -> partition -> attention -> unpartition ->
    (roll back) -> crop -> post-norm residuals (layers.py:183-253).
    Eval mode: DropPath is identity."""
    B, Z, H, W, C = x.shape
    wz, wh, ww = geom.window
    hp = geom.h_padded
    shortcut = x

    xp = np.pad(x, ((0, 0), (0, 0), (0, hp - H), (0, 0), (0, 0)))
    mask = None
    if roll:
        xp = np.roll(xp, (-(wz // 2), -(wh // 2), -(ww // 2)), axis=(1, 2, 3))
        mask = shifted_mask(Z, hp, geom.window, dtype)

    win = partition(xp, geom.window)
    win = attention(p["attn"], win, geom.heads, mask, dtype)
    xp = unpartition(win, geom.window, Z, hp, W)

    if roll:
        xp = np.roll(xp, (wz // 2, wh // 2, ww // 2), axis=(1, 2, 3))
    a = xp[:, :, :H]

    # post-norm: x = shortcut + norm1(attn); x = x + norm2(mlp(x))
    # (layers.py:250-251)
    x = shortcut + layer_norm(a, p["norm1"], dtype)
    x = x + layer_norm(mlp(p["mlp"], x, dtype), p["norm2"], dtype)
    return x


def stage(sp, x, geom, dtype):
    """EarthSpecificLayer: blocks alternate roll=False/True by index
    (models/layers.py:110-125)."""
    for j, bp in enumerate(sp["blocks"]):
        x = block(bp, x, geom, roll=(j % 2 == 1), dtype=dtype)
    return x


# ---------------------------------------------------------------------------
# Down / up sampling (reference: models/layers.py:423-499)
# ---------------------------------------------------------------------------

def down_sample(p, x, dtype):
    B, Z, H, W, C = x.shape
    h2 = -(-H // 2)
    x = np.pad(x, ((0, 0), (0, 0), (0, 2 * h2 - H), (0, 0), (0, 0)))
    x = x.reshape(B, Z, h2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, Z, h2, W // 2, 4 * C)
    return dense(p["reduce"], layer_norm(x, p["norm"], dtype), dtype)


def up_sample(p, x, out_h, dtype):
    B, Z, H, W, C = x.shape
    x = dense(p["expand"], x, dtype)
    c = x.shape[-1] // 4
    x = x.reshape(B, Z, H, W, 2, 2, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, Z, 2 * H, 2 * W, c)
    x = layer_norm(x[:, :, :out_h], p["norm"], dtype)
    return dense(p["mix"], x, dtype)


# ---------------------------------------------------------------------------
# Patch recovery (reference: PatchRecovery_pretrain, models/layers.py:501-545)
# ---------------------------------------------------------------------------

def patch_recovery(p, x, cfg, dtype):
    B = x.shape[0]
    pz, ph, pw = cfg.patch
    V, S = cfg.upper_vars, cfg.surface_vars
    ZP, HT, WT = cfg.upper_planes, cfg.h_tokens, cfg.w_tokens

    up = dense(p["upper"], x[:, 1:], dtype)
    up = up.reshape(B, ZP, HT, WT, V, pz, ph, pw)
    up = up.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    up = up.reshape(B, V, ZP * pz, HT * ph, WT * pw)
    up = up[:, :, :cfg.levels, :cfg.lat, :]

    sf = dense(p["surface"], x[:, 0], dtype)
    sf = sf.reshape(B, HT, WT, S, ph, pw)
    sf = sf.transpose(0, 3, 1, 4, 2, 5).reshape(B, S, HT * ph, WT * pw)
    return up, sf[:, :, :cfg.lat, :]


# ---------------------------------------------------------------------------
# Full model (reference: PanguModel.forward, models/pangu_model.py:50-87)
# ---------------------------------------------------------------------------

def forward(params, upper, surface, constants, cfg, dtype=np.float64):
    """embed -> enc(stage0) -> skip -> down -> enc(stage1) -> dec(stage2)
    -> up -> dec(stage3) -> concat skip -> recover. Outputs stay
    normalised (layers.py:531,542)."""
    params = jax_tree_to_numpy(params, dtype)
    x = patch_embed(params["patch_embed"], upper, surface, constants,
                    cfg, dtype)
    x = stage(params["stages"][0], x, cfg.stage(0), dtype)
    skip = x
    x = down_sample(params["downsample"], x, dtype)
    x = stage(params["stages"][1], x, cfg.stage(1), dtype)
    x = stage(params["stages"][2], x, cfg.stage(2), dtype)
    x = up_sample(params["upsample"], x, cfg.h_tokens, dtype)
    x = stage(params["stages"][3], x, cfg.stage(3), dtype)
    x = np.concatenate([skip, x], axis=-1)
    return patch_recovery(params["patch_recovery"], x, cfg, dtype)


def jax_tree_to_numpy(tree, dtype):
    if isinstance(tree, dict):
        return {k: jax_tree_to_numpy(v, dtype) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [jax_tree_to_numpy(v, dtype) for v in tree]
    return np.asarray(tree, dtype)
