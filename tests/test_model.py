"""End-to-end model tests on the TINY geometry: shapes, determinism,
longitude-rotation equivariance (the strongest structural parity check we
can run without the pretrained weights), gradient flow, and patch
embed/recovery consistency against literal reference translations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pangu_tpu.config import TINY
from pangu_tpu.data.constants import synthetic_constants
from pangu_tpu.models import pangu
from pangu_tpu.models import layers as L


CFG = TINY


@pytest.fixture(scope="module")
def setup():
    params = pangu.init_params(jax.random.PRNGKey(0), CFG)
    consts = {k: jnp.asarray(v) for k, v in synthetic_constants(CFG).items()}
    rng = np.random.default_rng(7)
    upper = jnp.asarray(rng.normal(
        size=(1, CFG.upper_vars, CFG.levels, CFG.lat, CFG.lon)
    ).astype(np.float32))
    surface = jnp.asarray(rng.normal(
        size=(1, CFG.surface_vars, CFG.lat, CFG.lon)).astype(np.float32))
    return params, consts, upper, surface


def test_forward_shapes(setup):
    params, consts, upper, surface = setup
    out_u, out_s = pangu.forward(params, upper, surface, consts, CFG)
    assert out_u.shape == upper.shape
    assert out_s.shape == surface.shape
    assert np.isfinite(np.asarray(out_u)).all()
    assert np.isfinite(np.asarray(out_s)).all()


def test_jit_matches_eager(setup):
    params, consts, upper, surface = setup
    eager = pangu.forward(params, upper, surface, consts, CFG)
    jitted = jax.jit(
        lambda p, u, s: pangu.forward(p, u, s, consts, CFG))(params, upper,
                                                             surface)
    np.testing.assert_allclose(np.asarray(eager[0]), np.asarray(jitted[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(eager[1]), np.asarray(jitted[1]),
                               atol=1e-5)


def test_longitude_rotation_equivariance(setup):
    """Rolling the globe by one window of longitude must roll the forecast
    identically: the periodic longitude roll (models/layers.py:199-201),
    lon-shared bias tables and lon-free masks make the architecture exactly
    equivariant to rotations by multiples of patch_w * window_w * 2 pixels
    (the extra factor 2 because the inner stages run at half longitude
    resolution)."""
    params, consts, upper, surface = setup
    shift = CFG.patch[2] * CFG.window[2] * 2   # 96 grid points

    out_u, out_s = pangu.forward(params, upper, surface, consts, CFG)

    from pangu_tpu.data.constants import derive_patch_constants
    rolled_consts = dict(consts)
    rolled_consts["const_h"] = jnp.roll(consts["const_h"], shift, axis=-1)
    rolled_consts["surface_masks"] = jnp.roll(consts["surface_masks"], shift,
                                              axis=-1)
    # re-derive the host-im2col'd patch tiles from the rolled planes
    # (patch_embed consumes them in preference to the raw conv operands)
    rolled_consts = {k: jnp.asarray(v) for k, v in derive_patch_constants(
        {k: np.asarray(v) for k, v in rolled_consts.items()}, CFG).items()}
    r_u, r_s = pangu.forward(params,
                             jnp.roll(upper, shift, axis=-1),
                             jnp.roll(surface, shift, axis=-1),
                             rolled_consts, CFG)
    np.testing.assert_allclose(np.asarray(r_u),
                               np.roll(np.asarray(out_u), shift, axis=-1),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(r_s),
                               np.roll(np.asarray(out_s), shift, axis=-1),
                               atol=1e-4)


def test_training_mode_stochastic_but_reproducible(setup):
    params, consts, upper, surface = setup
    key = jax.random.PRNGKey(3)
    a = pangu.forward(params, upper, surface, consts, CFG, rng=key,
                      deterministic=False)
    b = pangu.forward(params, upper, surface, consts, CFG, rng=key,
                      deterministic=False)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_gradients_flow_to_all_params(setup):
    params, consts, upper, surface = setup

    def loss_fn(p):
        u, s = pangu.forward(p, upper, surface, consts, CFG)
        return jnp.mean(jnp.abs(u)) + jnp.mean(jnp.abs(s))

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten_with_path(grads)
    for path, g in flat:
        assert np.isfinite(np.asarray(g)).all(), path
        assert float(jnp.max(jnp.abs(g))) > 0.0, f"dead gradient at {path}"


def test_remat_matches_no_remat(setup):
    import dataclasses
    params, consts, upper, surface = setup
    cfg_remat = dataclasses.replace(CFG, remat=True)
    cfg_plain = dataclasses.replace(CFG, remat=False)
    key = jax.random.PRNGKey(5)

    def loss(cfg):
        def f(p):
            u, s = pangu.forward(p, upper, surface, consts, cfg, rng=key,
                                 deterministic=False)
            return jnp.mean(u ** 2) + jnp.mean(s ** 2)
        return f

    g1 = jax.grad(loss(cfg_remat))(params)
    g2 = jax.grad(loss(cfg_plain))(params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5), g1, g2)


def test_patch_embed_matches_reference_literal(setup):
    """patch_embed vs a literal numpy translation of the reference's
    normalise/pad/im2col/conv chain (models/layers.py:40-93)."""
    params, consts, upper, surface = setup
    cfg = CFG
    got = np.asarray(L.patch_embed(params["patch_embed"], upper, surface,
                                   consts, cfg))

    up = np.asarray(upper)
    sf = np.asarray(surface)
    c = {k: np.asarray(v) for k, v in consts.items()}
    B = up.shape[0]
    pz, ph, pw = cfg.patch

    # --- surface (layers.py:48-69): norm, pad lat, concat masks, im2col ---
    sfn = (sf - c["surface_mean"][None]) / c["surface_std"][None]
    sfn = np.pad(sfn, ((0, 0), (0, 0), (0, cfg.lat_padded - cfg.lat), (0, 0)))
    sfn = np.concatenate(
        [sfn, np.broadcast_to(c["surface_masks"][None],
                              (B, cfg.const_masks, cfg.lat_padded, cfg.lon))],
        axis=1)
    SM = cfg.surface_vars + cfg.const_masks
    col = sfn.reshape(B, SM, cfg.h_tokens, ph, cfg.w_tokens, pw)
    col = col.transpose(0, 1, 3, 5, 2, 4).reshape(B, SM * ph * pw, -1)
    w_s = np.asarray(params["patch_embed"]["surface"]["kernel"])
    b_s = np.asarray(params["patch_embed"]["surface"]["bias"])
    xs = np.einsum("bft,fc->btc", col, w_s) + b_s
    xs = xs.reshape(B, cfg.h_tokens, cfg.w_tokens, -1)

    # --- upper (layers.py:71-87): norm, concat const_h, pad Z/lat, im2col ---
    upn = (up - c["upper_mean"][None]) / c["upper_std"][None]
    upn = np.concatenate(
        [upn, np.broadcast_to(c["const_h"][None, None],
                              (B, 1, cfg.levels, cfg.lat, cfg.lon))], axis=1)
    upn = np.pad(upn, ((0, 0), (0, 0), (0, cfg.levels_padded - cfg.levels),
                       (0, cfg.lat_padded - cfg.lat), (0, 0)))
    V1 = cfg.upper_vars + 1
    col = upn.reshape(B, V1, cfg.upper_planes, pz, cfg.h_tokens, ph,
                      cfg.w_tokens, pw)
    col = col.transpose(0, 1, 3, 5, 7, 2, 4, 6).reshape(B, V1 * pz * ph * pw, -1)
    w_u = np.asarray(params["patch_embed"]["upper"]["kernel"])
    b_u = np.asarray(params["patch_embed"]["upper"]["bias"])
    xu = np.einsum("bft,fc->btc", col, w_u) + b_u
    xu = xu.reshape(B, cfg.upper_planes, cfg.h_tokens, cfg.w_tokens, -1)

    want = np.concatenate([xs[:, None], xu], axis=1)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_patch_recovery_matches_reference_literal(setup):
    """patch_recovery vs a literal numpy translation of
    models/layers.py:511-545 (col2im reshape/permute + crops)."""
    params, consts, upper, surface = setup
    cfg = CFG
    rng = np.random.default_rng(11)
    x = rng.normal(size=(1, cfg.z_tokens, cfg.h_tokens, cfg.w_tokens,
                         2 * cfg.dims[3])).astype(np.float32)
    got_u, got_s = (np.asarray(a) for a in L.patch_recovery(
        params["patch_recovery"], jnp.asarray(x), cfg))

    pz, ph, pw = cfg.patch
    V, S = cfg.upper_vars, cfg.surface_vars
    wk = np.asarray(params["patch_recovery"]["upper"]["kernel"])
    bk = np.asarray(params["patch_recovery"]["upper"]["bias"])
    out = x[:, 1:] @ wk + bk    # (B, ZP, HT, WT, V*pz*ph*pw)
    B = x.shape[0]
    ZP, HT, WT = cfg.upper_planes, cfg.h_tokens, cfg.w_tokens
    # reference reshapes conv output (B, V, pz, ph, pw, ZP, HT, WT) then
    # permutes (0,1,5,2,6,3,7,4)
    out = out.reshape(B, ZP, HT, WT, V, pz, ph, pw)
    out = out.transpose(0, 4, 5, 6, 7, 1, 2, 3)  # (B,V,pz,ph,pw,ZP,HT,WT)
    out = out.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    out = out.reshape(B, V, ZP * pz, HT * ph, WT * pw)
    want_u = out[:, :, :cfg.levels, :cfg.lat, :]
    np.testing.assert_allclose(got_u, want_u, atol=2e-5)

    wk = np.asarray(params["patch_recovery"]["surface"]["kernel"])
    bk = np.asarray(params["patch_recovery"]["surface"]["bias"])
    out = x[:, 0] @ wk + bk
    out = out.reshape(B, HT, WT, S, ph, pw).transpose(0, 3, 4, 5, 1, 2)
    out = out.transpose(0, 1, 4, 2, 5, 3).reshape(B, S, HT * ph, WT * pw)
    want_s = out[:, :, :cfg.lat, :]
    np.testing.assert_allclose(got_s, want_s, atol=2e-5)


def _bf16_perf_delta(cfg_base):
    """Lat-weighted RMS delta between the PERF config (bf16 + pallas wm
    trunk + edge kernels — what bench.py ships) and the PARITY config
    (fp32 + xla), relative to the fp32 output's lat-weighted RMS."""
    import dataclasses

    from jax.experimental.pallas import tpu as pltpu

    cfg32 = dataclasses.replace(cfg_base, param_dtype="float32",
                                compute_dtype="float32", attn_impl="xla")
    cfg16 = dataclasses.replace(cfg_base, param_dtype="bfloat16",
                                compute_dtype="bfloat16",
                                attn_impl="pallas", block_layout="wm",
                                edge_kernels=True, gelu="tanh")
    consts = {k: jnp.asarray(v)
              for k, v in synthetic_constants(cfg32).items()}
    params = pangu.init_params(jax.random.PRNGKey(0), cfg32)
    p16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    r = np.random.default_rng(5)
    u = jnp.asarray(r.normal(size=(1, 5, cfg32.levels, cfg32.lat,
                                   cfg32.lon)).astype(np.float32))
    s = jnp.asarray(r.normal(size=(1, 4, cfg32.lat,
                                   cfg32.lon)).astype(np.float32))

    ref = jax.jit(lambda p, a, b: pangu.forward(p, a, b, consts,
                                                cfg32))(params, u, s)
    if jax.default_backend() == "tpu":
        got = jax.jit(lambda p, a, b: pangu.forward(p, a, b, consts,
                                                    cfg16))(p16, u, s)
    else:
        with pltpu.force_tpu_interpret_mode():
            got = jax.jit(lambda p, a, b: pangu.forward(p, a, b, consts,
                                                        cfg16))(p16, u, s)

    lat = np.deg2rad(np.linspace(90, -90, cfg32.lat))
    wgt = np.cos(lat)
    wgt = wgt / wgt.mean()

    def lw_rms(x):
        return np.sqrt((x ** 2 * wgt[:, None]).mean())

    out = {}
    for name, a, b in [("upper", got[0], ref[0]), ("surface", got[1],
                                                   ref[1])]:
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        out[name] = {"maxdiff": float(np.abs(a - b).max()),
                     "rel_lw_rms": float(lw_rms(a - b) / lw_rms(b))}
    return out


def test_bf16_perf_config_error_bound():
    """The shipped PERF configuration (bf16 + pallas wm + edge kernels)
    must stay within a documented error bound of the PARITY configuration
    (fp32 + xla) in normalised output units — the argument that the
    136.9 ms bench number still meets the 0.5% RMSE bar (VERDICT round-3
    item 6). Measured at TINY on CPU 2026-08-19: upper rel 0.0089 /
    maxdiff 0.0032, surface rel 0.0112 / maxdiff 0.0029 — bf16 noise,
    an order of magnitude below the ~0.1+ normalised RMS of a real 24 h
    forecast error, so its quadrature contribution to RMSE is <<0.5%
    (PARITY.md quantifies)."""
    d = _bf16_perf_delta(TINY)
    for name in ("upper", "surface"):
        assert d[name]["rel_lw_rms"] < 0.03, (name, d)
        assert d[name]["maxdiff"] < 0.02, (name, d)


@pytest.mark.slow
def test_bf16_perf_config_error_bound_full_geometry():
    """Same bound at the FULL Pangu geometry (16 blocks of bf16
    accumulation). Interpret-mode pallas at this scale is impractical on
    CPU, so this runs only where the perf config actually ships: a real
    TPU backend (slow tier; scripts/bf16_bound.py records the value in
    PARITY.md)."""
    if jax.default_backend() != "tpu":
        pytest.skip("full-geometry perf config needs the TPU backend")
    from pangu_tpu.config import PANGU_24
    d = _bf16_perf_delta(PANGU_24)
    for name in ("upper", "surface"):
        assert d[name]["rel_lw_rms"] < 0.05, (name, d)
        assert d[name]["maxdiff"] < 0.12, (name, d)
