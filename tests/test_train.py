"""Training-engine semantics: loss formula, torch-Adam-compatible optimizer,
MultiStep LR schedule, early-stopping orchestration — each checked against
literal numpy translations of the reference behaviour
(/root/reference/models/pangu_sample.py, finetune/finetune_fully.py:121,133)."""

import jax
import jax.numpy as jnp
import numpy as np

from pangu_tpu.config import TrainConfig
from pangu_tpu.engine import train as T
import pytest

# sub-second unit tests: the <3-min driver smoke tier (pytest -m quick)
pytestmark = pytest.mark.quick


RNG = np.random.default_rng(0)
TCFG = TrainConfig()


def test_weighted_l1_loss_matches_reference_formula():
    ou = RNG.normal(size=(2, 5, 3, 4, 6)).astype(np.float32)
    os_ = RNG.normal(size=(2, 4, 4, 6)).astype(np.float32)
    tu = RNG.normal(size=ou.shape).astype(np.float32)
    ts = RNG.normal(size=os_.shape).astype(np.float32)

    loss, aux = T.weighted_l1_loss(jnp.asarray(ou), jnp.asarray(os_),
                                   jnp.asarray(tu), jnp.asarray(ts), TCFG)

    # reference: mean(L1 * weights) with weights broadcast (1,V,1,1,1)/(1,V,1,1),
    # total = upper + 0.25 * surface (models/pangu_sample.py:61-67)
    wu = np.asarray(TCFG.upper_weights).reshape(1, 5, 1, 1, 1)
    ws = np.asarray(TCFG.surface_weights).reshape(1, 4, 1, 1)
    want_u = np.mean(np.abs(ou - tu) * wu)
    want_s = np.mean(np.abs(os_ - ts) * ws)
    np.testing.assert_allclose(float(aux["loss_upper"]), want_u, rtol=1e-6)
    np.testing.assert_allclose(float(aux["loss_surface"]), want_s, rtol=1e-6)
    np.testing.assert_allclose(float(loss), want_u + 0.25 * want_s, rtol=1e-6)


def test_lr_schedule_multistep():
    # x0.5 at epochs 25 and 50 (finetune_fully.py:133)
    sched = T.lr_schedule(TCFG, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(0)), TCFG.lr, rtol=1e-6)
    np.testing.assert_allclose(float(sched(249)), TCFG.lr, rtol=1e-6)
    np.testing.assert_allclose(float(sched(250)), TCFG.lr * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(500)), TCFG.lr * 0.25, rtol=1e-6)


def test_optimizer_matches_torch_adam_semantics():
    """One optax step vs a hand-rolled torch.optim.Adam update (L2 decay
    folded into the gradient before the moment estimates)."""
    tcfg = TrainConfig(lr=1e-3, weight_decay=0.1, lr_milestones=(1000,))
    p0 = RNG.normal(size=(7,)).astype(np.float32)
    g0 = RNG.normal(size=(7,)).astype(np.float32)

    tx = T.make_optimizer(tcfg, steps_per_epoch=1)
    params = {"w": jnp.asarray(p0)}
    opt_state = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray(g0)}, opt_state, params)
    got = np.asarray(params["w"] + updates["w"])

    # torch Adam, step 1: g' = g + wd*p; m = (1-b1)g'; v = (1-b2)g'^2;
    # mhat = m/(1-b1); vhat = v/(1-b2); p -= lr*mhat/(sqrt(vhat)+eps)
    b1, b2, eps = 0.9, 0.999, 1e-8
    g = g0 + tcfg.weight_decay * p0
    mhat = g
    vhat = g ** 2
    want = p0 - tcfg.lr * mhat / (np.sqrt(vhat) + eps)
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_train_step_reduces_loss_on_fixed_batch():
    """A few steps on one tiny batch must strictly reduce the training
    loss (sanity of grads + optimizer wiring)."""
    import dataclasses
    from pangu_tpu.config import TINY
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.models import pangu

    cfg = dataclasses.replace(TINY, remat=False)
    tcfg = TrainConfig(lr=1e-3, weight_decay=0.0)
    consts = {k: jnp.asarray(v) for k, v in synthetic_constants(cfg).items()}
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    tx = T.make_optimizer(tcfg, steps_per_epoch=1000)
    state = T.create_train_state(params, tx)

    batch = {
        "upper": jnp.asarray(RNG.normal(
            size=(1, 5, cfg.levels, cfg.lat, cfg.lon)).astype(np.float32)),
        "surface": jnp.asarray(RNG.normal(
            size=(1, 4, cfg.lat, cfg.lon)).astype(np.float32)),
    }
    batch["target_upper"] = batch["upper"]
    batch["target_surface"] = batch["surface"]

    step = T.make_train_step(cfg, tcfg, consts, tx)
    losses = []
    rng = jax.random.PRNGKey(1)
    for i in range(3):
        rng, sub = jax.random.split(rng)
        state, m = step(state, batch, sub)
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 3


def test_step_granular_resume_continues_trajectory(tmp_path):
    """Kill mid-epoch, resume from the step-interval checkpoint, and the
    parameter trajectory must continue EXACTLY as the uninterrupted run:
    same batches consumed, same per-step RNG stream (fold_in on the global
    step), same final params. The reference can only restart at epoch
    boundaries (models/pangu_sample.py:93-98)."""
    import dataclasses
    from pangu_tpu.config import Config, TINY
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.models import pangu
    from pangu_tpu.utils.checkpoint import Checkpointer

    cfgT = dataclasses.replace(TINY, remat=False)
    tcfg = TrainConfig(lr=1e-3, weight_decay=0.0, epochs=1, save_steps=2,
                       save_interval=1000, val_interval=1000)
    conf = Config(train=tcfg)
    consts = {k: jnp.asarray(v) for k, v in synthetic_constants(cfgT).items()}
    params = pangu.init_params(jax.random.PRNGKey(0), cfgT)
    tx = T.make_optimizer(tcfg, steps_per_epoch=5)
    step = T.make_train_step(cfgT, tcfg, consts, tx)

    r = np.random.default_rng(5)

    def mk_batch(i):
        u = jnp.asarray(r.normal(size=(1, 5, cfgT.levels, cfgT.lat,
                                       cfgT.lon)).astype(np.float32))
        s = jnp.asarray(r.normal(size=(1, 4, cfgT.lat, cfgT.lon)
                                 ).astype(np.float32))
        return {"upper": u, "surface": s, "target_upper": u,
                "target_surface": s}

    batches = [mk_batch(i) for i in range(5)]
    rng = jax.random.PRNGKey(42)

    # uninterrupted run over all 5 batches
    sA = T.create_train_state(params, tx)
    sA, _ = T.train_loop(conf, sA, step, lambda p, b: {"loss": jnp.zeros(())},
                         train_batches=lambda e: iter(batches),
                         val_batches=lambda: iter([]), rng=rng)
    assert int(sA.step) == 5

    # interrupted run: dies after 3 steps; save_steps=2 -> checkpoint @2
    ck = Checkpointer(str(tmp_path / "run"))
    sB = T.create_train_state(params, tx)
    sB, _ = T.train_loop(conf, sB, step, lambda p, b: {"loss": jnp.zeros(())},
                         train_batches=lambda e: iter(batches[:3]),
                         val_batches=lambda: iter([]), rng=rng,
                         checkpointer=ck)
    ck.wait()

    # resume: restore step-2 checkpoint, continue through the full epoch
    template = jax.tree.map(np.zeros_like, T.create_train_state(params, tx))
    restored, key, progress = ck.restore_latest(template)
    assert key == 2 and progress == {"epoch": 1, "batch": 2}
    sC, _ = T.train_loop(conf, restored, step,
                         lambda p, b: {"loss": jnp.zeros(())},
                         train_batches=lambda e: iter(batches),
                         val_batches=lambda: iter([]), rng=rng,
                         start_epoch=progress["epoch"],
                         start_batch=progress["batch"])
    ck.close()
    assert int(sC.step) == 5
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=0), sA.params, sC.params)


def test_train_loop_early_stopping():
    """Early stop after `patience` non-improving validations
    (models/pangu_sample.py:160-173), best params retained."""
    import dataclasses as dc
    from pangu_tpu.config import Config

    cfg = Config(train=TrainConfig(epochs=50, early_stop_patience=3))

    calls = {"train": 0, "val": 0}
    val_losses = iter([1.0, 0.5, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9])

    class FakeState:
        params = {"w": jnp.zeros(1)}
        opt_state = None
        step = jnp.zeros((), jnp.int32)

    def fake_train_step(state, batch, rng):
        calls["train"] += 1
        return state, {"loss": jnp.asarray(1.0)}

    current = {"v": None}

    def fake_eval_step(params, batch):
        calls["val"] += 1
        current["v"] = next(val_losses)
        return {"loss": jnp.asarray(current["v"])}

    state = T.TrainState(params={"w": jnp.zeros(1)}, opt_state=None,
                         step=jnp.zeros((), jnp.int32))
    final, hist = T.train_loop(
        cfg, state, fake_train_step, fake_eval_step,
        train_batches=lambda e: [{}],
        val_batches=lambda: [{}],
        rng=jax.random.PRNGKey(0))
    # epochs run: 2 improving + 3 stale -> stop at epoch 5
    assert calls["val"] == 5
    assert hist["best_val_loss"] == 0.5
