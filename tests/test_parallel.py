"""Multi-device tests on the 8-way virtual CPU mesh: the JAX-native "fake
cluster" (SURVEY.md §4c). Checks that (a) the sharded forward is numerically
identical to single-device, (b) a full dp/sp/tp-sharded train step runs and
the dp gradient reduction is correct, (c) mesh factoring respects
divisibility."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pangu_tpu.config import TINY, MeshConfig, TrainConfig
from pangu_tpu.data.constants import synthetic_constants
from pangu_tpu.engine import train as T
from pangu_tpu.models import pangu
from pangu_tpu.parallel import mesh as M
from pangu_tpu.parallel import sharding as S

CFG = dataclasses.replace(TINY, remat=False)


@pytest.fixture(scope="module")
def problem():
    consts = {k: jnp.asarray(v) for k, v in synthetic_constants(CFG).items()}
    params = pangu.init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(3)
    batch = {
        "upper": rng.normal(size=(2, 5, CFG.levels, CFG.lat, CFG.lon)
                            ).astype(np.float32),
        "surface": rng.normal(size=(2, 4, CFG.lat, CFG.lon)
                              ).astype(np.float32),
    }
    batch["target_upper"] = (batch["upper"] * 1.01).astype(np.float32)
    batch["target_surface"] = (batch["surface"] * 1.01).astype(np.float32)
    return params, consts, batch


def test_auto_mesh_config():
    mc = M.auto_mesh_config(8, lon_windows=2, max_heads=2, batch=2)
    assert mc.size == 8 and mc.sp == 2 and mc.dp >= 2
    mc = M.auto_mesh_config(4, lon_windows=30, max_heads=6, batch=1)
    assert mc.size == 4
    mc = M.auto_mesh_config(1, lon_windows=30, max_heads=6)
    assert mc.size == 1


def test_sharded_forward_matches_single_device(problem):
    params, consts, batch = problem
    u = jnp.asarray(batch["upper"])
    s = jnp.asarray(batch["surface"])

    ref_u, ref_s = jax.jit(
        lambda p, a, b: pangu.forward(p, a, b, consts, CFG))(params, u, s)

    mesh = M.build_mesh(MeshConfig(dp=2, sp=2, tp=2))
    sp = jax.device_put(params, S.param_shardings(mesh, params))
    bsh = S.batch_shardings(mesh)
    su = jax.device_put(u, bsh["upper"])
    ss = jax.device_put(s, bsh["surface"])
    with jax.set_mesh(mesh):
        got_u, got_s = jax.jit(
            lambda p, a, b: pangu.forward(p, a, b, consts, CFG))(sp, su, ss)

    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s),
                               atol=2e-4)


def test_sharded_train_step_matches_single_device(problem):
    """The dp gradient psum + tp/sp resharding must not change the math:
    one train step sharded == one train step unsharded."""
    params, consts, batch = problem
    tcfg = TrainConfig(lr=1e-4, weight_decay=0.0)
    tx = T.make_optimizer(tcfg, steps_per_epoch=10)
    step = T.make_train_step(CFG, tcfg, consts, tx, jit=False)
    key = jax.random.PRNGKey(0)

    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state0 = T.create_train_state(params, tx)
    ref_state, ref_m = jax.jit(step)(state0, jb, key)

    mesh = M.build_mesh(MeshConfig(dp=2, sp=2, tp=2))
    sparams = jax.device_put(params, S.param_shardings(mesh, params))
    bsh = S.batch_shardings(mesh)
    sb = {k: jax.device_put(jnp.asarray(v), bsh[k]) for k, v in batch.items()}
    with jax.set_mesh(mesh):
        sstate = T.create_train_state(sparams, tx)
        got_state, got_m = jax.jit(step)(sstate, sb, key)

    np.testing.assert_allclose(float(got_m["loss"]), float(ref_m["loss"]),
                               rtol=1e-5)
    # spot-check a couple of updated parameter groups
    for path in [("patch_embed", "upper", "kernel"),
                 ("downsample", "reduce", "kernel")]:
        a = ref_state.params
        b = got_state.params
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_param_sharding_specs(problem):
    params, _, _ = problem
    mesh = M.build_mesh(MeshConfig(dp=2, sp=2, tp=2))
    sh = S.param_shardings(mesh, params)
    # bias tables are the ~87% param group: tp-sharded on the z-type-major
    # window-type axis (the layout the wm trunk's z-window tp consumes)
    bt = sh["stages"][1]["blocks"][0]["attn"]["bias_table"]
    assert bt.spec == jax.sharding.PartitionSpec("tp", None, None, None)
    # mlp fc1 sharded on hidden dim
    fc1 = sh["stages"][0]["blocks"][0]["mlp"]["fc1"]["kernel"]
    assert fc1.spec == jax.sharding.PartitionSpec(None, "tp")
    # layernorms replicated
    n1 = sh["stages"][0]["blocks"][0]["norm1"]["scale"]
    assert n1.spec == jax.sharding.PartitionSpec()


def test_pallas_config_falls_back_under_mesh(problem):
    """attn_impl=pallas under a mesh the kernels CANNOT shard over (here:
    sp=3 divides no stage's lon-window count) must route through the
    sharded XLA path (GSPMD cannot partition pallas_call) and match the
    XLA numerics exactly."""
    params, consts, batch = problem
    cfg_p = dataclasses.replace(CFG, attn_impl="pallas")
    u = jnp.asarray(batch["upper"])
    s = jnp.asarray(batch["surface"])
    ref = jax.jit(lambda p, a, b: pangu.forward(p, a, b, consts, CFG))(
        params, u, s)

    mesh = M.build_mesh(MeshConfig(dp=2, sp=3, tp=1))
    with jax.set_mesh(mesh):
        assert pangu.wm_core_mesh(cfg_p) is None
    sp = jax.device_put(params, S.param_shardings(mesh, params))
    bsh = S.batch_shardings(mesh)
    su = jax.device_put(u, bsh["upper"])
    ss = jax.device_put(s, bsh["surface"])
    with jax.set_mesh(mesh):
        got = jax.jit(lambda p, a, b: pangu.forward(p, a, b, consts,
                                                    cfg_p))(sp, su, ss)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=2e-4)


def test_pallas_shard_map_keeps_kernels_under_mesh(problem, monkeypatch):
    """Under a dp=2/sp=2 (tp=1) mesh the fused Pallas stage must run via
    shard_map — kernels per shard, the shifted blocks' longitude roll as a
    ppermute halo exchange — not the XLA fallback, and match the
    single-device numerics (interpret mode on the virtual CPU mesh)."""
    from jax.experimental.pallas import tpu as pltpu

    import pangu_tpu.ops.earth_block_fused as EBF

    params, consts, batch = problem
    cfg_p = dataclasses.replace(CFG, attn_impl="pallas", block_layout="v2")
    u = jnp.asarray(batch["upper"])
    s = jnp.asarray(batch["surface"])
    ref = jax.jit(lambda p, a, b: pangu.forward(p, a, b, consts, CFG))(
        params, u, s)

    calls = []
    orig = EBF.run_stage_fused_sharded

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(EBF, "run_stage_fused_sharded", spy)

    mesh = M.build_mesh(MeshConfig(dp=2, sp=2, tp=1))
    sp = jax.device_put(params, S.param_shardings(mesh, params))
    bsh = S.batch_shardings(mesh)
    su = jax.device_put(u, bsh["upper"])
    ss = jax.device_put(s, bsh["surface"])
    with jax.set_mesh(mesh), pltpu.force_tpu_interpret_mode():
        got = jax.jit(lambda p, a, b: pangu.forward(p, a, b, consts,
                                                    cfg_p))(sp, su, ss)
    assert len(calls) == 4, "expected all 4 stages on the shard_map path"
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=2e-4)


def test_wm_shard_map_keeps_kernels_under_mesh(problem, monkeypatch):
    """block_layout="wm" under a dp=2/sp=2 (tp=1) mesh must route through
    run_stage_wm_sharded when the all-wm trunk doesn't apply (here:
    ``taps`` forces the per-stage forward_core) — window-major kernels
    per shard, each shifted block's longitude roll as a one-window-column
    ppermute halo exchange (``_lon_shift_wm``) — and match the
    single-device XLA numerics (VERDICT round-2 item 6)."""
    from jax.experimental.pallas import tpu as pltpu

    import pangu_tpu.ops.earth_block_wm as EBW

    params, consts, batch = problem
    cfg_p = dataclasses.replace(CFG, attn_impl="pallas", block_layout="wm")
    u = jnp.asarray(batch["upper"])
    s = jnp.asarray(batch["surface"])
    ref = jax.jit(lambda p, a, b: pangu.forward(p, a, b, consts, CFG))(
        params, u, s)

    calls = []
    orig = EBW.run_stage_wm_sharded

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(EBW, "run_stage_wm_sharded", spy)

    mesh = M.build_mesh(MeshConfig(dp=2, sp=2, tp=1))
    sp = jax.device_put(params, S.param_shardings(mesh, params))
    bsh = S.batch_shardings(mesh)
    su = jax.device_put(u, bsh["upper"])
    ss = jax.device_put(s, bsh["surface"])

    def fwd(p, a, b):
        # taps forces the per-stage forward_core dispatch (the all-wm
        # trunk shard_map path has its own test below)
        return pangu.forward(p, a, b, consts, cfg_p, taps={})

    with jax.set_mesh(mesh), pltpu.force_tpu_interpret_mode():
        got = jax.jit(fwd)(sp, su, ss)
    assert len(calls) == 4, "expected all 4 stages on the wm shard_map path"
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=2e-4)


def test_wm_trunk_shard_map_matches_single_device(problem):
    """The ALL-window-major trunk (forward_core_wm) must run per (dp, sp)
    shard under shard_map — wm stage chains, wm down/up, lon halos as
    ppermute — via forward()'s wm fast path, matching single-device XLA
    (wm_core_supported no longer requires one device)."""
    from jax.experimental.pallas import tpu as pltpu

    params, consts, batch = problem
    cfg_p = dataclasses.replace(CFG, attn_impl="pallas", block_layout="wm")
    u = jnp.asarray(batch["upper"])
    s = jnp.asarray(batch["surface"])
    ref = jax.jit(lambda p, a, b: pangu.forward(p, a, b, consts, CFG))(
        params, u, s)

    mesh = M.build_mesh(MeshConfig(dp=2, sp=2, tp=1))
    with jax.set_mesh(mesh):
        assert pangu.wm_core_supported(params, cfg_p)
        assert pangu.wm_core_mesh(cfg_p) is not None
    sp = jax.device_put(params, S.param_shardings(mesh, params))
    bsh = S.batch_shardings(mesh)
    su = jax.device_put(u, bsh["upper"])
    ss = jax.device_put(s, bsh["surface"])
    with jax.set_mesh(mesh), pltpu.force_tpu_interpret_mode():
        got = jax.jit(lambda p, a, b: pangu.forward(p, a, b, consts,
                                                    cfg_p))(sp, su, ss)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=2e-4)


def test_wm_rollout_shard_map_matches_single_device(problem):
    """The all-wm chained token-space rollout under a dp=2/sp=2 mesh (ONE
    shard_map around the whole scan; the carried wm state never leaves
    its shard) must match the standard single-device rollout."""
    from jax.experimental.pallas import tpu as pltpu

    from pangu_tpu.engine.rollout import make_rollout

    params, consts, batch = problem
    cfg_p = dataclasses.replace(CFG, attn_impl="pallas", block_layout="wm")
    u = jnp.asarray(batch["upper"])
    s = jnp.asarray(batch["surface"])

    std = make_rollout(CFG, consts, 2)
    ref = std(params, u + 0, s + 0)

    mesh = M.build_mesh(MeshConfig(dp=2, sp=2, tp=1))
    sp = jax.device_put(params, S.param_shardings(mesh, params))
    bsh = S.batch_shardings(mesh)
    su = jax.device_put(u, bsh["upper"])
    ss = jax.device_put(s, bsh["surface"])
    with jax.set_mesh(mesh), pltpu.force_tpu_interpret_mode():
        tok = make_rollout(cfg_p, consts, 2, token_space=True)
        got = tok(sp, su, ss)
    for x, y in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        assert x.shape == y.shape
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=5e-3, rtol=1e-3)


def test_wm_rollout_shard_map_tp_matches_single_device(problem):
    """The all-wm chained rollout under a dp=2/sp=1/tp=2 mesh: z-window
    tensor parallelism on the SERVING path (round 5) — bias tables stay
    type-sharded through the scan, the shifted blocks' z component is a
    ppermute halo, and the wm transition kernel places the surface/top
    token-type rows by GLOBAL z window (z_base scalar).  sp=1 also pins
    the canon_l lon-roll component, which must be applied locally when
    longitude is unsharded (the NOTES r5 latent-bug class)."""
    from jax.experimental.pallas import tpu as pltpu

    from pangu_tpu.engine.rollout import make_rollout

    params, consts, batch = problem
    cfg_p = dataclasses.replace(CFG, attn_impl="pallas", block_layout="wm")
    u = jnp.asarray(batch["upper"])
    s = jnp.asarray(batch["surface"])

    std = make_rollout(CFG, consts, 2)
    ref = std(params, u + 0, s + 0)

    mesh = M.build_mesh(MeshConfig(dp=2, sp=1, tp=2))
    sp = jax.device_put(params, S.param_shardings(mesh, params))
    bsh = S.batch_shardings(mesh)
    su = jax.device_put(u, bsh["upper"])
    ss = jax.device_put(s, bsh["surface"])
    with jax.set_mesh(mesh), pltpu.force_tpu_interpret_mode():
        assert pangu.wm_core_mesh(cfg_p) is not None
        tok = make_rollout(cfg_p, consts, 2, token_space=True)
        got = tok(sp, su, ss)
    for x, y in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        assert x.shape == y.shape
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=5e-3, rtol=1e-3)


def test_sharded_wm_train_stage_matches_xla(problem):
    """run_stage_train_wm under shard_map (window-major whole-block
    fwd+bwd kernels per (dp, sp) shard, lon shifts as differentiable
    one-window-column ppermute halos OUTSIDE the custom_vjp cores):
    value AND all gradients must match the unsharded XLA composition
    (VERDICT round-3 item 3)."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import PartitionSpec as P

    from pangu_tpu.models import layers as L
    from pangu_tpu.ops.earth_block_bwd import run_stage_train_wm

    params, _, _ = problem
    stage_idx, depth = 1, 4
    geom = CFG.stage(stage_idx)
    blocks = params["stages"][stage_idx]["blocks"]
    sp_params = {"blocks": (list(blocks) * 2)[:depth]}
    B = 2
    rng = np.random.default_rng(29)
    drops = [jnp.asarray(rng.choice([0.0, 0.8, 1.25], size=(B, 2))
                         .astype(np.float32)) for _ in range(depth)]
    x = jnp.asarray(rng.normal(
        size=(B, geom.z, geom.h, geom.w, geom.dim)).astype(np.float32))

    mesh = M.build_mesh(MeshConfig(dp=2, sp=2, tp=1))
    spec_x = P("dp", None, None, "sp", None)
    spec_d = [P("dp", None)] * depth

    def sharded_stage(sp, xx, dr):
        def inner(p, x_, d_):
            return run_stage_train_wm(p, x_, geom, d_,
                                      sp_axis="sp", sp_size=2)
        return jax.shard_map(inner, mesh=mesh,
                             in_specs=(P(), spec_x, spec_d),
                             out_specs=spec_x, check_vma=False)(
            sp, xx, list(dr))

    def ref_chain(sp, xx):
        y = xx
        for j, bp in enumerate(sp["blocks"]):
            roll = j % 2 == 1
            s1 = drops[j][:, 0].reshape(B, 1, 1, 1, 1)
            s2 = drops[j][:, 1].reshape(B, 1, 1, 1, 1)
            shortcut = y
            hp = geom.h_padded
            xp = jnp.pad(y, ((0, 0), (0, 0), (0, hp - geom.h),
                             (0, 0), (0, 0)))
            mask = None
            if roll:
                xp = jnp.roll(xp, (-1, -3, -6), axis=(1, 2, 3))
                ids = jnp.asarray(L.window_region_ids(geom.z, hp,
                                                      geom.window))
                mask = jnp.where(ids[:, None, :] != ids[:, :, None],
                                 jnp.float32(-100.0), jnp.float32(0.0))
            win = L.window_partition(xp, geom.window)
            win = L.earth_attention(bp["attn"], win, geom.heads, mask)
            xp = L.window_reverse(win, geom.window, geom.z, hp, geom.w)
            if roll:
                xp = jnp.roll(xp, (1, 3, 6), axis=(1, 2, 3))
            y2 = xp[:, :, :geom.h]
            y = shortcut + s1 * L.layer_norm(bp["norm1"], y2)
            y = y + s2 * L.layer_norm(bp["norm2"], L.mlp(bp["mlp"], y))
        return y

    def loss_sharded(sp, xx):
        return jnp.sum(sharded_stage(sp, xx, drops) ** 2)

    def loss_ref(sp, xx):
        return jnp.sum(ref_chain(sp, xx) ** 2)

    with pltpu.force_tpu_interpret_mode():
        vf, gf = jax.value_and_grad(loss_sharded, argnums=(0, 1))(
            sp_params, x)
    vr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1))(sp_params, x)

    np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_r = jax.tree.leaves(gr)
    assert len(flat_f) == len(flat_r)
    for (path, a), b in zip(flat_f, flat_r):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = max(1.0, float(np.max(np.abs(b))))
        assert float(np.max(np.abs(a - b))) <= 2e-5 * scale, (
            jax.tree_util.keystr(path))


def test_sharded_wm_train_step_matches_single_device(problem, monkeypatch):
    """The FULL train step through the all-window-major training trunk
    under a dp=2/sp=2 mesh (forward() wm training fast path: shard_map
    around forward_core_wm_train, drops drawn globally outside, lon
    halos as differentiable ppermutes, param grads psum'd by the
    shard_map transpose) must match the single-device XLA train step —
    the last fast path that didn't compose with the mesh (VERDICT
    round-3 item 3)."""
    from jax.experimental.pallas import tpu as pltpu

    params, consts, batch = problem
    cfg_p = dataclasses.replace(CFG, attn_impl="pallas", block_layout="wm")
    tcfg = TrainConfig(lr=1e-4, weight_decay=0.0)
    tx = T.make_optimizer(tcfg, steps_per_epoch=10)
    key = jax.random.PRNGKey(0)

    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    ref_step = T.make_train_step(CFG, tcfg, consts, tx, jit=False)
    state0 = T.create_train_state(params, tx)
    ref_state, ref_m = jax.jit(ref_step)(state0, jb, key)

    calls = []
    orig = pangu.forward_core_wm_train

    def spy(*a, **k):
        calls.append(k.get("sp_axis"))
        return orig(*a, **k)

    monkeypatch.setattr(pangu, "forward_core_wm_train", spy)

    mesh = M.build_mesh(MeshConfig(dp=2, sp=2, tp=1))
    sparams = jax.device_put(params, S.param_shardings(mesh, params))
    bsh = S.batch_shardings(mesh)
    sb = {k: jax.device_put(jnp.asarray(v), bsh[k]) for k, v in batch.items()}
    step_p = T.make_train_step(cfg_p, tcfg, consts, tx, jit=False)
    with jax.set_mesh(mesh), pltpu.force_tpu_interpret_mode():
        sstate = T.create_train_state(sparams, tx)
        got_state, got_m = jax.jit(step_p)(sstate, sb, key)

    assert calls == ["sp"], "expected the sharded wm training trunk"
    np.testing.assert_allclose(float(got_m["loss"]), float(ref_m["loss"]),
                               rtol=1e-5)
    for path in [("patch_embed", "upper", "kernel"),
                 ("downsample", "reduce", "kernel"),
                 ("stages", 1, "blocks", 1, "attn", "qkv", "kernel"),
                 ("stages", 3, "blocks", 0, "mlp", "fc1", "kernel")]:
        a = ref_state.params
        b = got_state.params
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_wm_trunk_tp_shard_map_matches_single_device(problem):
    """The all-wm trunk under a dp=2/sp=2/tp=2 mesh: tp shards the Z
    WINDOWS — and with them the z-type-major bias tables (~87% of all
    parameters) — the shifted blocks' z component runs as a one-z-row
    ppermute halo (``_z_shift_wm``), and the forward must match
    single-device XLA (VERDICT round-4 item 6: tp-composable fused
    kernels)."""
    from jax.experimental.pallas import tpu as pltpu

    params, consts, batch = problem
    cfg_p = dataclasses.replace(CFG, attn_impl="pallas", block_layout="wm")
    u = jnp.asarray(batch["upper"])
    s = jnp.asarray(batch["surface"])
    ref = jax.jit(lambda p, a, b: pangu.forward(p, a, b, consts, CFG))(
        params, u, s)

    # dp=2 x sp=1 x tp=2 = 4 devices: tp halos exercised without the
    # 8-concurrent-interpret-device serialisation pathology (NOTES.md)
    mesh = M.build_mesh(MeshConfig(dp=2, sp=1, tp=2))
    with jax.set_mesh(mesh):
        assert pangu.wm_core_mesh(cfg_p) is not None, \
            "tp=2 must now compose with the wm trunk (TINY nz=2)"
    sp = jax.device_put(params, S.param_shardings(mesh, params))
    bsh = S.batch_shardings(mesh)
    su = jax.device_put(u, bsh["upper"])
    ss = jax.device_put(s, bsh["surface"])
    with jax.set_mesh(mesh), pltpu.force_tpu_interpret_mode():
        got = jax.jit(lambda p, a, b: pangu.forward(p, a, b, consts,
                                                    cfg_p))(sp, su, ss)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               atol=2e-4)


def test_sharded_wm_train_step_tp_matches_single_device(problem,
                                                        monkeypatch):
    """The FULL train step through the all-wm training trunk under a
    dp=2/sp=2/tp=2 mesh — z-window tp with differentiable z halos, bias
    tables entering shard_map tp-sharded, param grads psum'd by the
    transpose — must match the single-device XLA train step (VERDICT
    round-4 item 6: 'MID dryrun runs the wm kernels at tp=4 with grads
    == XLA'; TINY's nz=2 pins the same path at tp=2)."""
    from jax.experimental.pallas import tpu as pltpu

    params, consts, batch = problem
    cfg_p = dataclasses.replace(CFG, attn_impl="pallas", block_layout="wm")
    tcfg = TrainConfig(lr=1e-4, weight_decay=0.0)
    tx = T.make_optimizer(tcfg, steps_per_epoch=10)
    key = jax.random.PRNGKey(0)

    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    ref_step = T.make_train_step(CFG, tcfg, consts, tx, jit=False)
    state0 = T.create_train_state(params, tx)
    ref_state, ref_m = jax.jit(ref_step)(state0, jb, key)

    calls = []
    orig = pangu.forward_core_wm_train

    def spy(*a, **k):
        calls.append((k.get("sp_axis"), k.get("tp_axis")))
        return orig(*a, **k)

    monkeypatch.setattr(pangu, "forward_core_wm_train", spy)

    # 4 devices (dp=2 x sp=1 x tp=2): see the forward test above
    mesh = M.build_mesh(MeshConfig(dp=2, sp=1, tp=2))
    sparams = jax.device_put(params, S.param_shardings(mesh, params))
    bsh = S.batch_shardings(mesh)
    sb = {k: jax.device_put(jnp.asarray(v), bsh[k]) for k, v in batch.items()}
    step_p = T.make_train_step(cfg_p, tcfg, consts, tx, jit=False)
    with jax.set_mesh(mesh), pltpu.force_tpu_interpret_mode():
        sstate = T.create_train_state(sparams, tx)
        got_state, got_m = jax.jit(step_p)(sstate, sb, key)

    assert calls == [("sp", "tp")], "expected the tp-sharded wm trunk"
    np.testing.assert_allclose(float(got_m["loss"]), float(ref_m["loss"]),
                               rtol=1e-5)
    for path in [("patch_embed", "upper", "kernel"),
                 ("downsample", "reduce", "kernel"),
                 ("stages", 1, "blocks", 1, "attn", "qkv", "kernel"),
                 ("stages", 1, "blocks", 1, "attn", "bias_table"),
                 ("stages", 3, "blocks", 0, "mlp", "fc1", "kernel")]:
        a = ref_state.params
        b = got_state.params
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_initialize_distributed_env_detection(monkeypatch):
    """initialize_distributed must decide from the ENVIRONMENT (explicit
    coordinator or multi-task SLURM) and call
    jax.distributed.initialize() — never query the backend first, which
    would initialise single-process and make init too late
    (reference launchers: era5_data/utils_dist.py:24-59)."""
    from pangu_tpu.parallel import mesh as M

    assert not M._should_initialize({})
    assert not M._should_initialize({"SLURM_NTASKS": "1"})
    assert M._should_initialize({"SLURM_NTASKS": "4"})
    assert M._should_initialize({"JAX_COORDINATOR_ADDRESS": "h:1234"})
    assert M._should_initialize({"COORDINATOR_ADDRESS": "h:1234"})
    assert not M._should_initialize({"SLURM_NTASKS": "garbage"})

    calls = []
    monkeypatch.setattr(M, "_DISTRIBUTED_INITIALIZED", False)
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append(1))
    M.initialize_distributed({"SLURM_NTASKS": "4"})
    assert calls == [1]
    # idempotent: second call is a no-op
    M.initialize_distributed({"SLURM_NTASKS": "4"})
    assert calls == [1]

    # single-process env: never touches jax.distributed
    monkeypatch.setattr(M, "_DISTRIBUTED_INITIALIZED", False)
    M.initialize_distributed({})
    assert calls == [1]


def test_multi_host_device_put_uses_process_local_assembly(monkeypatch):
    """Under >1 process, device_put_fn must assemble GLOBAL arrays from
    per-process local shards (jax.make_array_from_process_local_data),
    not device_put the local batch as if it were global."""
    from pangu_tpu.data import era5

    mesh = M.build_mesh(MeshConfig(dp=2, sp=2, tp=2))
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    seen = []
    real = jax.make_array_from_process_local_data

    def spy(sharding, data, *a, **k):
        seen.append(data.shape)
        # single-process under the hood: fall back to a plain put so the
        # test can still execute
        return jax.device_put(data, sharding)

    monkeypatch.setattr(jax, "make_array_from_process_local_data", spy)
    put = era5.device_put_fn(mesh)
    batch = {"upper": np.zeros((2, 5, 5, 49, 192), np.float32)}
    out = put(batch)
    assert seen == [(2, 5, 5, 49, 192)]
    assert out["upper"].shape[0] == 2


def test_sharded_fused_train_stage_matches_xla(problem):
    """run_stage_train_sharded (whole-block kernels per (dp, sp) shard,
    lon shifts as differentiable ppermute halo exchanges): value AND all
    gradients must match the unsharded XLA composition — the multi-chip
    fused TRAINING path (VERDICT round-1 item 3)."""
    from jax.experimental.pallas import tpu as pltpu

    from pangu_tpu.models import layers as L
    from pangu_tpu.ops.earth_block_fused import (run_stage_train_sharded,
                                                 stage_shardable)

    params, _, _ = problem
    stage_idx, depth = 1, 4
    geom = CFG.stage(stage_idx)
    blocks = params["stages"][stage_idx]["blocks"]
    sp_params = {"blocks": (list(blocks) * 2)[:depth]}
    B = 2
    rng = np.random.default_rng(23)
    drops = [jnp.asarray(rng.choice([0.0, 0.8, 1.25], size=(B, 2))
                         .astype(np.float32)) for _ in range(depth)]
    x = jnp.asarray(rng.normal(
        size=(B, geom.z, geom.h, geom.w, geom.dim)).astype(np.float32))

    mesh = M.build_mesh(MeshConfig(dp=2, sp=2, tp=1))
    assert stage_shardable(geom, dict(mesh.shape), B)

    def ref_chain(sp, xx):
        y = xx
        for j, bp in enumerate(sp["blocks"]):
            roll = j % 2 == 1
            s1 = drops[j][:, 0].reshape(B, 1, 1, 1, 1)
            s2 = drops[j][:, 1].reshape(B, 1, 1, 1, 1)
            shortcut = y
            hp = geom.h_padded
            xp = jnp.pad(y, ((0, 0), (0, 0), (0, hp - geom.h),
                             (0, 0), (0, 0)))
            mask = None
            if roll:
                xp = jnp.roll(xp, (-1, -3, -6), axis=(1, 2, 3))
                ids = jnp.asarray(L.window_region_ids(geom.z, hp,
                                                      geom.window))
                mask = jnp.where(ids[:, None, :] != ids[:, :, None],
                                 jnp.float32(-100.0), jnp.float32(0.0))
            win = L.window_partition(xp, geom.window)
            win = L.earth_attention(bp["attn"], win, geom.heads, mask)
            xp = L.window_reverse(win, geom.window, geom.z, hp, geom.w)
            if roll:
                xp = jnp.roll(xp, (1, 3, 6), axis=(1, 2, 3))
            y2 = xp[:, :, :geom.h]
            y = shortcut + s1 * L.layer_norm(bp["norm1"], y2)
            y = y + s2 * L.layer_norm(bp["norm2"], L.mlp(bp["mlp"], y))
        return y

    def loss_sharded(sp, xx):
        return jnp.sum(run_stage_train_sharded(sp, xx, geom, drops,
                                               mesh) ** 2)

    def loss_ref(sp, xx):
        return jnp.sum(ref_chain(sp, xx) ** 2)

    with pltpu.force_tpu_interpret_mode():
        vf, gf = jax.value_and_grad(loss_sharded, argnums=(0, 1))(
            sp_params, x)
    vr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1))(sp_params, x)

    np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_r = jax.tree.leaves(gr)
    assert len(flat_f) == len(flat_r)
    for (path, a), b in zip(flat_f, flat_r):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = max(1.0, float(np.max(np.abs(b))))
        assert float(np.max(np.abs(a - b))) <= 2e-5 * scale, (
            jax.tree_util.keystr(path))
