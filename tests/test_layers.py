"""Unit tests for the pure-function layers: each checks my TPU-layout
realisation against an independent brute-force construction that follows
the reference's tensor manipulations literally (numpy, full-size masks,
naive per-window attention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pangu_tpu.config import TINY, PANGU_24
from pangu_tpu.models import layers as L

# sub-second unit tests: the <3-min driver smoke tier (pytest -m quick)
pytestmark = pytest.mark.quick


RNG = np.random.default_rng(0)


def test_window_partition_roundtrip():
    window = (2, 6, 12)
    x = jnp.asarray(RNG.normal(size=(2, 4, 18, 48, 8)).astype(np.float32))
    win = L.window_partition(x, window)
    assert win.shape == (2, 4, 2 * 3, 144, 8)
    back = L.window_reverse(win, window, 4, 18, 48)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_window_partition_ordering():
    """Token/type indices must follow the reference layout
    (models/layers.py:216-221): windows indexed lon-major, type = zw*Hw+hw,
    token = (z_off*wh + h_off)*ww + w_off."""
    window = (2, 6, 12)
    Z, Hp, W = 4, 18, 48
    # encode coordinates in the values
    coords = np.zeros((1, Z, Hp, W, 3), np.float32)
    for z in range(Z):
        coords[0, z, :, :, 0] = z
    for h in range(Hp):
        coords[0, :, h, :, 1] = h
    for w in range(W):
        coords[0, :, :, w, 2] = w
    win = np.asarray(L.window_partition(jnp.asarray(coords), window))
    wz, wh, ww = window
    nlat = Hp // wh
    for lon_w in (0, 2):
        for typ in (0, 5):
            zw, hw = divmod(typ, nlat)
            for tok in (0, 143):
                zo, rem = divmod(tok, wh * ww)
                ho, wo = divmod(rem, ww)
                np.testing.assert_array_equal(
                    win[0, lon_w, typ, tok],
                    [zw * wz + zo, hw * wh + ho, lon_w * ww + wo])


def _reference_gen_mask(Z, Hp, W, window):
    """Literal numpy translation of the reference mask construction
    (models/layers.py:153-181), kept deliberately naive (full W axis) as an
    independent check of the W-free fast path."""
    wz, wh, ww = window
    img = np.zeros((1, Z, Hp, W, 1), np.float32)
    cnt = 0
    z_slices = (slice(0, -wz), slice(-wz, -wz // 2), slice(-wz // 2, None))
    h_slices = (slice(0, -wh), slice(wh, -wh // 2), slice(-wh // 2, None))
    for zs in z_slices:
        for hs in h_slices:
            img[:, zs, hs, :, :] = cnt
            cnt += 1
    ntype = (Z // wz) * (Hp // wh)
    img = img.reshape(1, Z // wz, wz, Hp // wh, wh, W // ww, ww, 1)
    img = img.transpose(0, 5, 1, 3, 2, 4, 6, 7)
    mw = img.reshape(-1, ntype, wz * wh * ww)
    attn_mask = mw[:, :, None, :] - mw[:, :, :, None]
    return np.where(attn_mask != 0, np.float32(-100.0), np.float32(0.0))


@pytest.mark.parametrize("geom", [(4, 18, 48), (8, 186, 360), (8, 96, 180)])
def test_shifted_window_mask_matches_reference(geom):
    Z, Hp, W = geom
    window = (2, 6, 12)
    ref = _reference_gen_mask(Z, Hp, W, window)
    mine = L.shifted_window_mask(Z, Hp, window)
    # reference repeats the same mask for every longitude window
    for lw in range(ref.shape[0]):
        np.testing.assert_array_equal(ref[lw], mine)


def test_layer_norm_matches_numpy():
    x = RNG.normal(size=(3, 7, 16)).astype(np.float32)
    p = {"scale": jnp.asarray(RNG.normal(size=16).astype(np.float32)),
         "bias": jnp.asarray(RNG.normal(size=16).astype(np.float32))}
    got = np.asarray(L.layer_norm(p, jnp.asarray(x)))
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    want = (x - mu) / np.sqrt(var + 1e-5) * np.asarray(p["scale"]) + np.asarray(p["bias"])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mlp_uses_exact_gelu():
    # torch nn.GELU default is the erf formulation (models/layers.py:261)
    dim = 8
    p = {"fc1": {"kernel": jnp.eye(dim, 4 * dim), "bias": jnp.zeros(4 * dim)},
         "fc2": {"kernel": jnp.eye(4 * dim, dim), "bias": jnp.zeros(dim)}}
    x = jnp.asarray(RNG.normal(size=(5, dim)).astype(np.float32))
    got = np.asarray(L.mlp(p, x))
    from scipy.special import erf  # scipy ships with the image's numpy stack
    xn = np.asarray(x)
    want = xn * 0.5 * (1.0 + erf(xn / np.sqrt(2.0)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_attention_matches_bruteforce():
    """Batched windowed attention vs a naive per-window softmax loop."""
    B, nlon, ntype, N, C, heads = 1, 2, 3, 24, 8, 2
    hd = C // heads
    x = RNG.normal(size=(B, nlon, ntype, N, C)).astype(np.float32)
    p = {
        "qkv": {"kernel": RNG.normal(size=(C, 3 * C)).astype(np.float32) * 0.1,
                "bias": RNG.normal(size=3 * C).astype(np.float32) * 0.1},
        "proj": {"kernel": RNG.normal(size=(C, C)).astype(np.float32) * 0.1,
                 "bias": RNG.normal(size=C).astype(np.float32) * 0.1},
        "bias_table": RNG.normal(size=(ntype, heads, N, N)).astype(np.float32) * 0.1,
    }
    mask = np.where(RNG.random((ntype, N, N)) > 0.7, -100.0, 0.0).astype(np.float32)

    got = np.asarray(L.earth_attention(
        {k: jax.tree.map(jnp.asarray, v) for k, v in p.items()},
        jnp.asarray(x), heads, jnp.asarray(mask)))

    # brute force
    def softmax(a):
        e = np.exp(a - a.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    want = np.zeros_like(x)
    for b in range(B):
        for lw in range(nlon):
            for t in range(ntype):
                qkv = x[b, lw, t] @ p["qkv"]["kernel"] + p["qkv"]["bias"]
                q, k, v = np.split(qkv, 3, axis=-1)
                out = np.zeros((N, C), np.float32)
                for h in range(heads):
                    qh = q[:, h * hd:(h + 1) * hd] * (hd ** -0.5)
                    kh = k[:, h * hd:(h + 1) * hd]
                    vh = v[:, h * hd:(h + 1) * hd]
                    a = qh @ kh.T + p["bias_table"][t, h] + mask[t]
                    out[:, h * hd:(h + 1) * hd] = softmax(a) @ vh
                want[b, lw, t] = out @ p["proj"]["kernel"] + p["proj"]["bias"]
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_qkv_head_split_matches_torch_layout():
    """The reference splits qkv as reshape(..., 3, heads, hd)
    (models/layers.py:368-371): q/k/v are interleaved per head from the
    fused projection. Verify our split picks the same columns."""
    C, heads = 12, 3
    hd = C // heads
    x = jnp.asarray(RNG.normal(size=(1, 1, 1, 4, C)).astype(np.float32))
    kernel = np.zeros((C, 3 * C), np.float32)
    # make q = x, k = x, v = x via identity blocks at torch's column layout:
    # column index = 3*? no: out feature f = (token stays), reshape(..., 3, H, hd)
    # => f = qkv_idx*(heads*hd) + h*hd + d
    for h in range(heads):
        for d in range(hd):
            col_q = 0 * C + h * hd + d
            col_k = 1 * C + h * hd + d
            col_v = 2 * C + h * hd + d
            row = h * hd + d
            kernel[row, col_q] = 1.0
            kernel[row, col_k] = 1.0
            kernel[row, col_v] = 1.0
    p = {"qkv": {"kernel": jnp.asarray(kernel), "bias": jnp.zeros(3 * C)},
         "proj": {"kernel": jnp.eye(C), "bias": jnp.zeros(C)},
         "bias_table": jnp.zeros((1, heads, 4, 4))}
    out = np.asarray(L.earth_attention(p, x, heads, None))
    # the identity-block kernel makes q = k = v = x per head IFF the head
    # split picks torch's columns; then out_h = softmax(x_h x_h^T / sqrt(hd)) x_h
    xn = np.asarray(x)[0, 0, 0]
    want = np.zeros_like(xn)
    for h in range(heads):
        xh = xn[:, h * hd:(h + 1) * hd]
        a = (xh / np.sqrt(hd)) @ xh.T
        e = np.exp(a - a.max(-1, keepdims=True))
        want[:, h * hd:(h + 1) * hd] = (e / e.sum(-1, keepdims=True)) @ xh
    np.testing.assert_allclose(out[0, 0, 0], want, atol=1e-5)


def test_down_up_sample_shapes():
    cfg = TINY
    g0, g1 = cfg.stage(0), cfg.stage(1)
    C = cfg.dims[0]
    x = jnp.asarray(RNG.normal(size=(2, g0.z, g0.h, g0.w, C)).astype(np.float32))
    pd = {"norm": {"scale": jnp.ones(4 * C), "bias": jnp.zeros(4 * C)},
          "reduce": {"kernel": jnp.asarray(
              RNG.normal(size=(4 * C, 2 * C)).astype(np.float32))}}
    y = L.down_sample(pd, x)
    assert y.shape == (2, g1.z, g1.h, g1.w, 2 * C)

    pu = {"expand": {"kernel": jnp.asarray(
              RNG.normal(size=(2 * C, 4 * C)).astype(np.float32))},
          "norm": {"scale": jnp.ones(C), "bias": jnp.zeros(C)},
          "mix": {"kernel": jnp.eye(C)}}
    z = L.up_sample(pu, y, g0.h)
    assert z.shape == (2, g0.z, g0.h, g0.w, C)


def _np_layernorm(x, scale, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def test_downsample_matches_reference_literal():
    """down_sample vs a literal numpy translation of the reference's
    view/permute chain (models/layers.py:436-457) on an odd latitude."""
    B, Z, H, W, C = 1, 2, 5, 4, 4
    x = RNG.normal(size=(B, Z, H, W, C)).astype(np.float32)
    scale = RNG.normal(size=4 * C).astype(np.float32)
    bias = RNG.normal(size=4 * C).astype(np.float32)
    kernel = RNG.normal(size=(4 * C, 2 * C)).astype(np.float32)

    got = np.asarray(L.down_sample(
        {"norm": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
         "reduce": {"kernel": jnp.asarray(kernel)}}, jnp.asarray(x)))

    # reference: pad lat to even, view (B,Z,H/2,2,W/2,2,C), permute
    # (0,1,2,4,3,5,6), flatten -> LN -> matmul
    xp = np.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0), (0, 0)))
    h2, w2 = (H + 1) // 2, W // 2
    m = xp.reshape(B, Z, h2, 2, w2, 2, C).transpose(0, 1, 2, 4, 3, 5, 6)
    m = m.reshape(B, Z, h2, w2, 4 * C)
    want = _np_layernorm(m, scale, bias) @ kernel
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_upsample_matches_reference_literal():
    """up_sample vs a literal numpy translation of models/layers.py:474-499."""
    B, Z, H, W, C2, C = 1, 2, 3, 4, 8, 4
    x = RNG.normal(size=(B, Z, H, W, C2)).astype(np.float32)
    k1 = RNG.normal(size=(C2, 4 * C)).astype(np.float32)
    k2 = RNG.normal(size=(C, C)).astype(np.float32)
    scale = RNG.normal(size=C).astype(np.float32)
    bias = RNG.normal(size=C).astype(np.float32)
    out_h = 2 * H - 1

    got = np.asarray(L.up_sample(
        {"expand": {"kernel": jnp.asarray(k1)},
         "norm": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
         "mix": {"kernel": jnp.asarray(k2)}}, jnp.asarray(x), out_h))

    e = x @ k1
    e = e.reshape(B, Z, H, W, 2, 2, C).transpose(0, 1, 2, 4, 3, 5, 6)
    e = e.reshape(B, Z, 2 * H, 2 * W, C)[:, :, :out_h]
    want = _np_layernorm(e, scale, bias) @ k2
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_drop_path():
    x = jnp.ones((4, 3, 3))
    # deterministic: identity
    np.testing.assert_array_equal(
        np.asarray(L.drop_path(x, 0.5, None, True)), np.asarray(x))
    # stochastic: rows either 0 or 1/keep
    y = np.asarray(L.drop_path(x, 0.5, jax.random.PRNGKey(0), False))
    for b in range(4):
        assert np.allclose(y[b], 0.0) or np.allclose(y[b], 2.0)
