"""Token-space rollout transition: the composed recovery->embed affine
must match the canonical output/input round trip bit-for-bit in exact
arithmetic (reference loop: inference/inference_singleOutput.py:92-105 —
recovery -> de-norm -> crop -> re-norm -> zero-pad -> embed)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pangu_tpu.config import TINY
from pangu_tpu.data.constants import denorm_data, synthetic_constants
from pangu_tpu.engine.rollout import make_rollout
from pangu_tpu.engine.transition import apply_transition, build_transition
from pangu_tpu.models import layers as L
from pangu_tpu.models import pangu

RNG = np.random.default_rng(7)


def _consts(cfg):
    return {k: jnp.asarray(v) for k, v in synthetic_constants(cfg).items()}


def test_transition_matches_canonical_round_trip():
    """apply_transition == embed(renorm(crop(denorm(recovery(x))))) on
    TINY — whose odd levels (5) and lat (49) exercise both crop edges."""
    cfg = TINY
    consts = _consts(cfg)
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    x_cat = jnp.asarray(RNG.normal(size=(
        2, cfg.z_tokens, cfg.h_tokens, cfg.w_tokens, 2 * cfg.dims[0])
    ).astype(np.float32))

    out_u, out_s = L.patch_recovery(params["patch_recovery"], x_cat, cfg)
    raw_u, raw_s = denorm_data(out_u, out_s, consts)
    want = L.patch_embed(params["patch_embed"], raw_u, raw_s, consts, cfg)

    tp = build_transition(params, consts, cfg)
    got = apply_transition(tp, x_cat)

    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("trajectory", [False, True])
def test_token_space_rollout_matches_standard(trajectory):
    cfg = TINY
    consts = _consts(cfg)
    params = pangu.init_params(jax.random.PRNGKey(1), cfg)
    u = jnp.asarray(RNG.normal(size=(1, cfg.upper_vars, cfg.levels,
                                     cfg.lat, cfg.lon)).astype(np.float32))
    s = jnp.asarray(RNG.normal(size=(1, cfg.surface_vars, cfg.lat,
                                     cfg.lon)).astype(np.float32))

    std = make_rollout(cfg, consts, 3, return_trajectory=trajectory)
    tok = make_rollout(cfg, consts, 3, return_trajectory=trajectory,
                       token_space=True)
    a = std(params, u + 0, s + 0)
    b = tok(params, u + 0, s + 0)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        assert x.shape == y.shape
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=5e-3, rtol=1e-3)


def test_transition_wm_matches_apply_transition():
    """Window-major transition kernel (engine/transition_wm.py): stitched
    reads of the ROLLED skip/decoder wm storage + per-program token-type
    matmuls must equal apply_transition on the canonical pair."""
    from jax.experimental.pallas import tpu as pltpu
    from pangu_tpu.engine.transition_wm import (apply_transition_wm,
                                                build_transition_wm)
    from pangu_tpu.ops.earth_block_wm import (from_window_major,
                                              to_window_major)

    cfg = TINY
    geom = cfg.stage(0)
    consts = _consts(cfg)
    params = pangu.init_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(17)
    off = (1, 3, 6)
    B, Z, H, W, C = 2, geom.z, geom.h, geom.w, geom.dim
    skip = jnp.asarray(rng.normal(size=(B, Z, H, W, C)).astype(np.float32))
    dec = jnp.asarray(rng.normal(size=(B, Z, H, W, C)).astype(np.float32))

    def rolled(x):
        hp = geom.h_padded
        junk = jnp.asarray(rng.normal(
            size=(B, Z, hp - H, W, C)).astype(np.float32)) * 50.0
        xp = jnp.concatenate([x, junk], axis=2)
        return to_window_major(jnp.roll(xp, (-off[0], -off[1], -off[2]),
                                        axis=(1, 2, 3)), geom.window)

    tp = build_transition_wm(params, consts, cfg)
    want = apply_transition(tp, (skip, dec))       # (B, Z, H, W, C)
    with pltpu.force_tpu_interpret_mode():
        got = apply_transition_wm(tp, rolled(skip), rolled(dec), geom, off)
    got = from_window_major(got, geom.window)[:, :, :H]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_wm_rollout_matches_standard():
    """The all-window-major chained rollout (forward_core_wm +
    apply_transition_wm: the token state never exists in canonical layout
    between steps) must match the standard physical-space rollout."""
    import dataclasses
    from jax.experimental.pallas import tpu as pltpu

    cfg = dataclasses.replace(TINY, attn_impl="pallas", block_layout="wm")
    consts = _consts(cfg)
    params = pangu.init_params(jax.random.PRNGKey(5), cfg)
    assert pangu.wm_core_supported(params, cfg)
    u = jnp.asarray(RNG.normal(size=(1, cfg.upper_vars, cfg.levels,
                                     cfg.lat, cfg.lon)).astype(np.float32))
    s = jnp.asarray(RNG.normal(size=(1, cfg.surface_vars, cfg.lat,
                                     cfg.lon)).astype(np.float32))

    std = make_rollout(TINY, consts, 3)
    a = std(params, u + 0, s + 0)
    with pltpu.force_tpu_interpret_mode():
        tok = make_rollout(cfg, consts, 3, token_space=True)
        b = tok(params, u + 0, s + 0)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        assert x.shape == y.shape
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=5e-3, rtol=1e-3)


def test_wm_rollout_matches_standard_batched():
    """Batch-2 all-wm rollout: per-sample embed/recover endpoints plus
    the batched (grid bb dim) wm kernels must match the standard rollout."""
    import dataclasses
    from jax.experimental.pallas import tpu as pltpu

    cfg = dataclasses.replace(TINY, attn_impl="pallas", block_layout="wm")
    consts = _consts(cfg)
    params = pangu.init_params(jax.random.PRNGKey(6), cfg)
    B = 2
    u = jnp.asarray(RNG.normal(size=(B, cfg.upper_vars, cfg.levels,
                                     cfg.lat, cfg.lon)).astype(np.float32))
    s = jnp.asarray(RNG.normal(size=(B, cfg.surface_vars, cfg.lat,
                                     cfg.lon)).astype(np.float32))

    std = make_rollout(TINY, consts, 2)
    a = std(params, u + 0, s + 0)
    with pltpu.force_tpu_interpret_mode():
        tok = make_rollout(cfg, consts, 2, token_space=True)
        b = tok(params, u + 0, s + 0)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        assert x.shape == y.shape
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=5e-3, rtol=1e-3)


def test_wm_rollout_edge_kernels_matches_standard():
    """Batch-2 all-wm rollout with edge_kernels=True (Pallas embed->wm
    entry + batched rolled-wm recovery at the endpoints) must match the
    standard physical-space rollout."""
    import dataclasses
    from jax.experimental.pallas import tpu as pltpu

    cfg = dataclasses.replace(TINY, attn_impl="pallas", block_layout="wm",
                              edge_kernels=True)
    consts = _consts(cfg)
    params = pangu.init_params(jax.random.PRNGKey(7), cfg)
    B = 2
    u = jnp.asarray(RNG.normal(size=(B, cfg.upper_vars, cfg.levels,
                                     cfg.lat, cfg.lon)).astype(np.float32))
    s = jnp.asarray(RNG.normal(size=(B, cfg.surface_vars, cfg.lat,
                                     cfg.lon)).astype(np.float32))

    std = make_rollout(TINY, consts, 2)
    a = std(params, u + 0, s + 0)
    with pltpu.force_tpu_interpret_mode():
        tok = make_rollout(cfg, consts, 2, token_space=True)
        b = tok(params, u + 0, s + 0)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        assert x.shape == y.shape
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=5e-3, rtol=1e-3)
