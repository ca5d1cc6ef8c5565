"""LoRA fast-path tests (VERDICT round-3 item 7): merged-weight
training through the fused wm kernels vs the unmerged XLA path.
Separate module from test_lora.py so the quick tier stays <3 min."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pangu_tpu.config import TrainConfig
from pangu_tpu.engine import train as T
from pangu_tpu.models import lora

from pangu_tpu.config import TINY
from pangu_tpu.data.constants import synthetic_constants
from pangu_tpu.models import pangu

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

def test_lora_fused_fast_path_matches_unmerged():
    """LoRA on the fast path (VERDICT round-3 item 7): with lora_dropout
    off, forward() under attn_impl=pallas merges W + s·A@B as traced ops
    and runs the fused wm trunk — the TRAIN step (loss and every
    lora/base gradient) must match the unmerged XLA path, and the fused
    kernels must actually engage (no LoRA fallback)."""
    from jax.experimental.pallas import tpu as pltpu

    from pangu_tpu.ops import earth_block_bwd as EBB

    consts, base, batch = _problem()
    params = lora.init_lora(jax.random.PRNGKey(1), base, dropout=0.0)
    # make B nonzero so the LoRA branch contributes (fresh-init B=0 would
    # make the merged-vs-unmerged comparison vacuous)
    rng = np.random.default_rng(17)
    params = jax.tree.map(lambda x: x, params)
    for path in lora._dense_sites(params):
        site = lora._get(params, path)
        site["lora_b"] = jnp.asarray(rng.normal(
            scale=0.02, size=site["lora_b"].shape).astype(np.float32))

    tcfg = TrainConfig(lr=1e-3, weight_decay=0.0)
    mask = lora.trainable_mask(params)
    tx = T.make_optimizer(tcfg, steps_per_epoch=10, trainable_mask=mask)
    key = jax.random.PRNGKey(0)

    # reference: unmerged two-matmul LoRA through the XLA path
    cfg_x = dataclasses.replace(CFG, attn_impl="xla")
    step_x = T.make_train_step(cfg_x, tcfg, consts, tx, jit=False)
    ref_state, ref_m = jax.jit(step_x)(T.create_train_state(params, tx),
                                       batch, key)

    # fast path: merged weights through the fused wm training trunk
    cfg_p = dataclasses.replace(CFG, attn_impl="pallas", block_layout="wm")
    spy_calls = []
    orig = EBB.run_stage_train_wm

    def spy(*a, **k):
        spy_calls.append(1)
        return orig(*a, **k)

    EBB.run_stage_train_wm, saved = spy, orig
    try:
        step_p = T.make_train_step(cfg_p, tcfg, consts, tx, jit=False)
        with pltpu.force_tpu_interpret_mode():
            got_state, got_m = jax.jit(step_p)(
                T.create_train_state(params, tx), batch, key)
    finally:
        EBB.run_stage_train_wm = saved

    assert spy_calls, "fused wm training trunk must engage under LoRA"
    np.testing.assert_allclose(float(got_m["loss"]), float(ref_m["loss"]),
                               rtol=2e-5)
    # every trainable leaf (lora_a/lora_b + patch_recovery) must update
    # identically through the merge
    flat_ref = dict(lora._walk(ref_state.params))
    for path, b in lora._walk(got_state.params):
        a = flat_ref[path]
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = max(1e-8, float(np.max(np.abs(a))))
        assert float(np.max(np.abs(a - b))) <= 3e-5 * scale, path


def test_lora_dropout_keeps_unmerged_path():
    """With lora_dropout > 0 the merged form is NOT equivalent (dropout
    acts on the LoRA-branch input), so training must keep the unmerged
    XLA path; eval (deterministic) may still merge."""
    from pangu_tpu.models.pangu import wm_core_supported

    consts, base, batch = _problem()
    params = lora.init_lora(jax.random.PRNGKey(1), base, dropout=0.1)
    assert lora.has_lora(params) and lora.has_lora_dropout(params)
    cfg_p = dataclasses.replace(CFG, attn_impl="pallas", block_layout="wm")
    # the trunk gate sees the UNmerged params in training with dropout
    assert not wm_core_supported(params, cfg_p)
    merged = lora.merge_lora(params)
    assert wm_core_supported(merged, cfg_p)
