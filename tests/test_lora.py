"""LoRA tests: init neutrality, masked training freezes the base and
updates only LoRA + output layer, merged-weight equivalence, audit report
(reference semantics: finetune/lora_tune.py:124-175)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pangu_tpu.config import TINY, TrainConfig
from pangu_tpu.data.constants import synthetic_constants
from pangu_tpu.engine import train as T
from pangu_tpu.models import lora, pangu
import pytest

# sub-second unit tests: the <3-min driver smoke tier (pytest -m quick)
pytestmark = pytest.mark.quick

CFG = dataclasses.replace(TINY, remat=False)


def _problem():
    consts = {k: jnp.asarray(v) for k, v in synthetic_constants(CFG).items()}
    base = pangu.init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(9)
    batch = {
        "upper": jnp.asarray(rng.normal(
            size=(1, 5, CFG.levels, CFG.lat, CFG.lon)).astype(np.float32)),
        "surface": jnp.asarray(rng.normal(
            size=(1, 4, CFG.lat, CFG.lon)).astype(np.float32)),
    }
    batch["target_upper"] = batch["upper"] * 1.1
    batch["target_surface"] = batch["surface"] * 1.1
    return consts, base, batch


def test_lora_sites_found():
    base = pangu.init_params(jax.random.PRNGKey(0), CFG)
    sites = lora._dense_sites(base)
    names = {p[-1] for p in sites}
    # every reference nn.Linear family: attn qkv/proj, mlp fc1/fc2,
    # down/up-sample linears
    assert names == {"qkv", "proj", "fc1", "fc2", "reduce", "expand", "mix"}
    # 8 TINY blocks x 4 + downsample + upsample x 2 = 35
    assert len(sites) == 8 * 4 + 3


def test_lora_init_is_neutral():
    consts, base, batch = _problem()
    lp = lora.init_lora(jax.random.PRNGKey(1), base)
    out_b = pangu.forward(base, batch["upper"], batch["surface"], consts, CFG)
    out_l = pangu.forward(lp, batch["upper"], batch["surface"], consts, CFG)
    np.testing.assert_allclose(np.asarray(out_l[0]), np.asarray(out_b[0]),
                               atol=1e-6)


def test_masked_training_updates_only_lora_and_output():
    consts, base, batch = _problem()
    params = lora.init_lora(jax.random.PRNGKey(1), base)
    tcfg = TrainConfig(lr=1e-3, weight_decay=0.0)
    mask = lora.trainable_mask(params)
    tx = T.make_optimizer(tcfg, steps_per_epoch=100, trainable_mask=mask)
    state = T.create_train_state(params, tx)
    step = T.make_train_step(CFG, tcfg, consts, tx)
    for i in range(2):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(m["loss"]))

    report = lora.audit(params, state.params)
    updated = set(report["updated"])
    frozen = set(report["frozen"])
    assert any("lora_b" in n for n in updated)
    assert any("patch_recovery" in n for n in updated)
    # base kernels frozen
    assert all("lora" in n or "patch_recovery" in n for n in updated), \
        sorted(updated)[:10]
    assert any(".attn.qkv.kernel" in n for n in frozen)
    # lora_a updates too once lora_b is nonzero? (first step: grad of A is
    # zero because B=0; second step nonzero) — just require B moved:
    b0 = params["stages"][0]["blocks"][0]["attn"]["qkv"]["lora_b"]
    b1 = state.params["stages"][0]["blocks"][0]["attn"]["qkv"]["lora_b"]
    assert not np.allclose(np.asarray(b0), np.asarray(b1))


def test_merge_and_strip():
    consts, base, batch = _problem()
    params = lora.init_lora(jax.random.PRNGKey(1), base)
    # give the factors real values
    params = jax.tree.map(
        lambda x: x, params)
    site = params["stages"][0]["blocks"][0]["mlp"]["fc1"]
    site["lora_b"] = jnp.asarray(np.random.default_rng(3).normal(
        size=site["lora_b"].shape).astype(np.float32) * 0.01)

    out_l = pangu.forward(params, batch["upper"], batch["surface"], consts,
                          CFG)
    merged = lora.merge_lora(params)
    # merged tree has no lora leaves
    assert not any("lora" in str(p)
                   for p, _ in jax.tree_util.tree_flatten_with_path(merged)[0]
                   for p in [p])
    out_m = pangu.forward(merged, batch["upper"], batch["surface"], consts,
                          CFG)
    np.testing.assert_allclose(np.asarray(out_m[0]), np.asarray(out_l[0]),
                               atol=1e-4)

    stripped = lora.strip_lora(params)
    out_s = pangu.forward(stripped, batch["upper"], batch["surface"], consts,
                          CFG)
    out_b = pangu.forward(base, batch["upper"], batch["surface"], consts,
                          CFG)
    np.testing.assert_allclose(np.asarray(out_s[0]), np.asarray(out_b[0]),
                               atol=1e-6)


def test_lora_dropout_applied_in_training():
    """lora_dropout stores a rate leaf and layers.dense drops the
    LoRA-branch input when an rng is threaded (peft
    LoraConfig(lora_dropout=...) semantics, lora_tune.py:133)."""
    from pangu_tpu.models import layers as L

    rng = np.random.default_rng(3)
    p = {"kernel": jnp.zeros((8, 4), jnp.float32),
         "bias": jnp.zeros((4,), jnp.float32),
         "lora_a": jnp.asarray(rng.normal(size=(8, 2)).astype(np.float32)),
         "lora_b": jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32)),
         "lora_scale": jnp.asarray(1.0, jnp.float32),
         "lora_drop": jnp.asarray(0.5, jnp.float32)}
    x = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))

    y_det = L.dense(p, x)                       # eval: no dropout
    np.testing.assert_allclose(
        np.asarray(y_det),
        np.asarray(x @ p["lora_a"] @ p["lora_b"]), atol=1e-5)

    y1 = L.dense(p, x, rng=jax.random.PRNGKey(0))
    y2 = L.dense(p, x, rng=jax.random.PRNGKey(1))
    assert not np.allclose(np.asarray(y1), np.asarray(y_det))
    assert not np.allclose(np.asarray(y1), np.asarray(y2))

    # init_lora wires the leaf; merge_lora strips it
    base = pangu.init_params(jax.random.PRNGKey(0), CFG)
    lp = lora.init_lora(jax.random.PRNGKey(1), base, dropout=0.1)
    site = lp["stages"][0]["blocks"][0]["attn"]["qkv"]
    assert float(site["lora_drop"]) == np.float32(0.1)
    merged = lora.merge_lora(lp)
    msite = merged["stages"][0]["blocks"][0]["attn"]["qkv"]
    assert "lora_drop" not in msite and "lora_a" not in msite
    # rate leaf is frozen, factors trainable
    mask = lora.trainable_mask(lp)
    s = mask["stages"][0]["blocks"][0]["attn"]["qkv"]
    assert s["lora_a"] and s["lora_b"]
    assert not s["lora_drop"] and not s["lora_scale"]


def test_lora_feature_dropout_merges_exactly():
    """Feature-mode dropout (token-constant mask over the branch's input
    features) commutes into weight space: merge_lora(params, rng) must
    equal W + s·(diag(m)/keep·A)@B with the mask re-derived from the same
    fold_in scheme — the exactness that keeps fused training on the
    merged fast path (models/lora.py::init_lora dropout_mode docs)."""
    base = pangu.init_params(jax.random.PRNGKey(0), CFG)
    lp = lora.init_lora(jax.random.PRNGKey(1), base, dropout=0.5,
                        dropout_mode="feature")
    # feature mode stores lora_drop_feat, not the element-mode leaf
    site = lp["stages"][0]["blocks"][0]["attn"]["qkv"]
    assert "lora_drop_feat" in site and "lora_drop" not in site
    assert not lora.has_lora_dropout(lp)            # element-mode check
    assert lora.has_lora_dropout(lp, "lora_drop_feat")

    rng = jax.random.PRNGKey(7)
    merged = lora.merge_lora(lp, rng=rng)
    sites = lora._dense_sites(lp)
    for idx in (0, len(sites) - 1):                 # first + last site
        p = lora._get(lp, sites[idx])
        keep = 1.0 - p["lora_drop_feat"]
        k = jax.random.fold_in(
            jax.random.fold_in(rng, lora._FEAT_DROP_TAG), idx)
        m = jax.random.bernoulli(k, keep, (p["lora_a"].shape[0], 1))
        a = jnp.where(m, p["lora_a"] / keep, 0.0)
        want = p["kernel"] + (a @ p["lora_b"]) * p["lora_scale"]
        got = lora._get(merged, sites[idx])["kernel"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)
        # and the merged weight acts like dropping input features of the
        # branch: x @ W_eff == x@W + s·(drop(x)@A)@B for token-constant m
        x = jnp.asarray(np.random.default_rng(3).normal(
            size=(5, p["kernel"].shape[0])).astype(np.float32))
        xd = jnp.where(m.T, x / keep, 0.0)
        y_branch = (x @ p["kernel"]
                    + (xd @ p["lora_a"] @ p["lora_b"]) * p["lora_scale"])
        np.testing.assert_allclose(np.asarray(x @ got),
                                   np.asarray(y_branch), atol=1e-5)
    # without rng (export path) the merge ignores dropout entirely
    plain = lora.merge_lora(lp)
    p0 = lora._get(lp, sites[0])
    np.testing.assert_allclose(
        np.asarray(lora._get(plain, sites[0])["kernel"]),
        np.asarray(p0["kernel"]
                   + (p0["lora_a"] @ p0["lora_b"]) * p0["lora_scale"]),
        atol=1e-6)


def test_lora_feature_dropout_training_step_runs():
    """Full train step with feature-mode dropout: runs, is finite, and
    updates the LoRA factors while the base stays frozen."""
    consts, base, batch = _problem()
    params = lora.init_lora(jax.random.PRNGKey(1), base, dropout=0.2,
                            dropout_mode="feature")
    tcfg = TrainConfig(batch_size=1, lora_dropout=0.2,
                       lora_dropout_mode="feature")
    tx = T.make_optimizer(tcfg, 1,
                          trainable_mask=lora.trainable_mask(params))
    state = T.create_train_state(params, tx)
    step = T.make_train_step(CFG, tcfg, consts, tx)
    state, m = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    qkv0 = state.params["stages"][0]["blocks"][0]["attn"]["qkv"]
    base0 = base["stages"][0]["blocks"][0]["attn"]["qkv"]
    assert np.allclose(np.asarray(qkv0["kernel"]),
                       np.asarray(base0["kernel"]))   # base frozen
    assert not np.allclose(np.asarray(qkv0["lora_b"]), 0.0)  # B moved


def test_lora_dropout_training_step_runs():
    """A full train step through the model with lora_drop leaves present
    (non-deterministic path threads rngs to every LoRA site)."""
    consts, base, batch = _problem()
    params = lora.init_lora(jax.random.PRNGKey(1), base, dropout=0.2)
    tcfg = TrainConfig(batch_size=1, lora_dropout=0.2)
    tx = T.make_optimizer(tcfg, 1,
                          trainable_mask=lora.trainable_mask(params))
    state = T.create_train_state(params, tx)
    step = T.make_train_step(CFG, tcfg, consts, tx)
    state, m = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
