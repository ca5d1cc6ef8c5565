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
