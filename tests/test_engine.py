"""Engine tests: scan-based rollout vs step-by-step feedback, orbax
checkpoint roundtrip, evaluation sweep CSV layout."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from pangu_tpu.config import TINY, Config, DataConfig
from pangu_tpu.data.constants import synthetic_constants
from pangu_tpu.engine import rollout as R
from pangu_tpu.engine import evaluate as E
from pangu_tpu.engine import train as T
from pangu_tpu.models import pangu

CFG = dataclasses.replace(TINY, remat=False)


def _problem():
    consts = {k: jnp.asarray(v) for k, v in synthetic_constants(CFG).items()}
    params = pangu.init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(5)
    upper = jnp.asarray(rng.normal(
        size=(1, 5, CFG.levels, CFG.lat, CFG.lon)).astype(np.float32))
    surface = jnp.asarray(rng.normal(
        size=(1, 4, CFG.lat, CFG.lon)).astype(np.float32))
    return params, consts, upper, surface


def test_rollout_matches_iterated_single_step():
    """lax.scan rollout == feeding the de-normalised output back by hand
    (the reference's host loop, inference/inference_singleOutput.py:97-105)."""
    params, consts, upper, surface = _problem()

    ru, rs = R.make_rollout(CFG, consts, steps=3)(
        params, jnp.copy(upper), jnp.copy(surface))

    u, s = upper, surface
    for _ in range(3):
        u, s = R.single_step(params, u, s, consts, CFG)
    np.testing.assert_allclose(np.asarray(ru), np.asarray(u), atol=1e-4)
    np.testing.assert_allclose(np.asarray(rs), np.asarray(s), atol=1e-4)


def test_rollout_trajectory_shapes():
    params, consts, upper, surface = _problem()
    (fu, fs), (tu, ts) = R.make_rollout(CFG, consts, steps=2,
                                        return_trajectory=True)(
        params, jnp.copy(upper), jnp.copy(surface))
    assert tu.shape == (2,) + upper.shape
    assert ts.shape == (2,) + surface.shape
    np.testing.assert_allclose(np.asarray(tu[-1]), np.asarray(fu), atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    from pangu_tpu.utils.checkpoint import Checkpointer
    params, consts, upper, surface = _problem()
    tx = T.make_optimizer(Config().train, steps_per_epoch=10)
    state = T.create_train_state(params, tx)

    ck = Checkpointer(str(tmp_path / "run"))
    ck.save(state, epoch=1)
    ck.save_best(state)
    ck.wait()

    template = jax.tree.map(np.zeros_like, state)
    restored, step, progress = ck.restore_latest(template)
    assert step == 1
    assert progress == {"epoch": 1, "batch": 0}
    np.testing.assert_array_equal(
        np.asarray(restored.params["patch_embed"]["upper"]["kernel"]),
        np.asarray(state.params["patch_embed"]["upper"]["kernel"]))

    best = ck.restore_best(template)
    np.testing.assert_array_equal(
        np.asarray(best.params["downsample"]["reduce"]["kernel"]),
        np.asarray(state.params["downsample"]["reduce"]["kernel"]))
    ck.close()


def test_evaluate_sweep_writes_csvs(tmp_path):
    params, consts, upper, surface = _problem()
    cfg = Config(model=CFG)

    def batches():
        for t in ("2018010312", "2018010400"):
            yield {"upper": upper, "surface": surface,
                   "target_upper": upper, "target_surface": surface,
                   "times": ("in", t)}

    tables = E.evaluate(params, batches(), cfg, consts,
                        res_path=str(tmp_path), visualize=False)
    csvs = sorted(os.listdir(tmp_path / "csv"))
    assert csvs == sorted(
        [f"{e}_upper_{v}.csv" for e in ("rmse", "acc") for v in "zqtuv"]
        + ["rmse_surface.csv", "acc_surface.csv"])
    import pandas as pd
    df = pd.read_csv(tmp_path / "csv" / "rmse_upper_z.csv", index_col=0)
    assert [str(i) for i in df.index] == ["2018010312", "2018010400"]
    assert df.shape == (2, CFG.levels)
    # surface CSV columns are variable names
    df = pd.read_csv(tmp_path / "csv" / "acc_surface.csv", index_col=0)
    assert list(df.columns) == ["msl", "u10", "v10", "t2m"]


def test_evaluate_partial_final_batch_pads_not_retraces(tmp_path):
    """drop_last=False leaves a smaller final batch: evaluate() must pad it
    to the traced batch size (one compile for the whole sweep) and emit
    exactly the real rows; a sample-count/timestamp mismatch hard-errors
    instead of synthesizing CSV row keys."""
    import pytest

    params, consts, upper, surface = _problem()
    cfg = Config(model=CFG)
    u2 = jnp.concatenate([upper, upper * 0.5])
    s2 = jnp.concatenate([surface, surface * 0.5])

    def batches():
        yield {"upper": u2, "surface": s2, "target_upper": u2,
               "target_surface": s2, "times": (["a", "b"], ["t0", "t1"])}
        yield {"upper": upper, "surface": surface, "target_upper": upper,
               "target_surface": surface, "times": (["c"], ["t2"])}

    tables = E.evaluate(params, batches(), cfg, consts,
                        res_path=str(tmp_path), visualize=False)
    assert sorted(tables["rmse_upper_z"].keys()) == ["t0", "t1", "t2"]
    # the padded row must NOT leak into the tables, and the 1-sample batch
    # must score identically to its batch-2 twin (same inputs -> same row)
    np.testing.assert_allclose(tables["rmse_upper_z"]["t2"],
                               tables["rmse_upper_z"]["t0"], rtol=1e-5)

    bad = [{"upper": u2, "surface": s2, "target_upper": u2,
            "target_surface": s2, "times": (["a"], ["t0"])}]
    with pytest.raises(ValueError, match="row keys"):
        E.evaluate(params, bad, cfg, consts, res_path=str(tmp_path),
                   visualize=False)


def test_evaluate_visualization(tmp_path):
    params, consts, upper, surface = _problem()
    cfg = Config(model=CFG)
    batches = [{"upper": upper, "surface": surface,
                "target_upper": upper, "target_surface": surface,
                "times": ("in", "t0")}]
    E.evaluate(params, batches, cfg, consts, res_path=str(tmp_path),
               visualize=True)
    pngs = os.listdir(tmp_path / "png")
    assert any("t_Z" in p for p in pngs)
    assert any("u10" in p for p in pngs)


def test_greedy_schedule():
    from pangu_tpu.engine.rollout import greedy_schedule
    assert greedy_schedule(24) == [24]
    assert greedy_schedule(168) == [24] * 7
    assert greedy_schedule(31) == [24, 6, 1]
    assert greedy_schedule(17) == [6, 6, 3, 1, 1]
    import pytest
    with pytest.raises(ValueError):
        greedy_schedule(5, available=(24, 6, 3))
    with pytest.raises(ValueError):
        greedy_schedule(0)


def test_hierarchical_rollout_matches_manual_chain():
    from pangu_tpu.engine.rollout import (make_hierarchical_rollout,
                                          single_step)
    params, consts, upper, surface = _problem()
    # two "models": reuse the same params for 24h and 6h slots
    models = {24: params, 6: params}
    roll, schedule = make_hierarchical_rollout(CFG, consts, 54, (24, 6))
    assert schedule == [24, 24, 6]
    got_u, got_s = roll(models, jnp.copy(upper), jnp.copy(surface))

    u, s = upper, surface
    for _ in range(3):
        u, s = single_step(params, u, s, consts, CFG)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(u), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(s), atol=1e-4)


def test_hierarchical_token_space_rollout_matches_physical():
    """Token-space hierarchy: cross-model handoffs compose model A's
    recovery with model B's embed (build_transition(embed_params=B)) —
    must match the physical-space hierarchical chain with two DISTINCT
    models."""
    import jax
    from pangu_tpu.engine.rollout import make_hierarchical_rollout
    params, consts, upper, surface = _problem()
    params_b = pangu.init_params(jax.random.PRNGKey(99), CFG.model
                                 if hasattr(CFG, "model") else CFG)
    models = {24: params, 6: params_b}

    phys, schedule = make_hierarchical_rollout(CFG, consts, 54, (24, 6))
    tok, schedule2 = make_hierarchical_rollout(CFG, consts, 54, (24, 6),
                                               token_space=True)
    assert schedule == schedule2 == [24, 24, 6]
    want = phys(models, jnp.copy(upper), jnp.copy(surface))
    got = tok(models, jnp.copy(upper), jnp.copy(surface))
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-3)


def test_hierarchical_token_space_rollout_wm():
    """Hierarchical token-space chain on the all-window-major path (both
    models wm-capable): must match the physical-space chain."""
    import dataclasses
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from pangu_tpu.engine.rollout import make_hierarchical_rollout
    params, consts, upper, surface = _problem()
    cfg_wm = dataclasses.replace(CFG, attn_impl="pallas",
                                 block_layout="wm")
    params_b = pangu.init_params(jax.random.PRNGKey(98), CFG)
    models = {24: params, 6: params_b}

    phys, _ = make_hierarchical_rollout(CFG, consts, 30, (24, 6))
    want = phys(models, jnp.copy(upper), jnp.copy(surface))
    with pltpu.force_tpu_interpret_mode():
        tok, _ = make_hierarchical_rollout(cfg_wm, consts, 30, (24, 6),
                                           token_space=True)
        got = tok(models, jnp.copy(upper), jnp.copy(surface))
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-3)
