"""Pallas fused window-attention tests, run in interpreter mode on CPU so
they validate the kernel logic everywhere (the real lowering is exercised
on TPU by bench.py and the pallas attn_impl config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pangu_tpu.models import layers as L
from pangu_tpu.ops import window_attention as W

RNG = np.random.default_rng(0)


def _mk(nwin=2, ntype=3, heads=2, N=24, hd=8):
    qkv = RNG.normal(size=(nwin, ntype, 3, heads, hd, N)).astype(np.float32)
    bias = RNG.normal(size=(ntype, heads, N, N)).astype(np.float32)
    return jnp.asarray(qkv), jnp.asarray(bias)


def test_reference_sdpa_matches_earth_attention_math():
    """_sdpa_reference (transposed layout) == the plain attention core."""
    nwin, ntype, heads, N, hd = 2, 3, 2, 24, 8
    qkv, bias = _mk(nwin, ntype, heads, N, hd)
    out_t = W._sdpa_reference(qkv, bias)       # (nwin, ntype, heads, hd, N)

    q = np.asarray(qkv[:, :, 0]).transpose(0, 1, 2, 4, 3)  # (..., N, hd)
    k = np.asarray(qkv[:, :, 1]).transpose(0, 1, 2, 4, 3)
    v = np.asarray(qkv[:, :, 2]).transpose(0, 1, 2, 4, 3)
    s = (q * hd ** -0.5) @ k.transpose(0, 1, 2, 4, 3) + np.asarray(bias)[None]
    e = np.exp(s - s.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    want = (p @ v).transpose(0, 1, 2, 4, 3)
    np.testing.assert_allclose(np.asarray(out_t), want, atol=1e-5)


@pytest.mark.quick
def test_pallas_kernel_interpret_matches_reference():
    qkv, bias = _mk()
    with pltpu.force_tpu_interpret_mode():
        got = W._sdpa_pallas(qkv, bias)
    want = W._sdpa_reference(qkv, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_gradient_is_reference_gradient():
    qkv, bias = _mk()

    def loss_p(qkv, bias):
        return jnp.sum(W._sdpa(qkv, bias) ** 2)

    def loss_r(qkv, bias):
        return jnp.sum(W._sdpa_reference(qkv, bias) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1))(qkv, bias)
    gr = jax.grad(loss_r, argnums=(0, 1))(qkv, bias)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_window_attention_pallas_matches_xla_path():
    """Full wrapper (qkv proj + kernel + out proj) vs layers.earth_attention
    on a window geometry with a shifted mask."""
    B, nlon, ntype, N, C, heads = 1, 4, 3, 144, 16, 2
    x = jnp.asarray(RNG.normal(size=(B, nlon, ntype, N, C)).astype(np.float32))
    p = {
        "qkv": {"kernel": jnp.asarray(
            RNG.normal(size=(C, 3 * C)).astype(np.float32) * 0.1),
            "bias": jnp.asarray(RNG.normal(size=3 * C).astype(np.float32) * 0.1)},
        "proj": {"kernel": jnp.asarray(
            RNG.normal(size=(C, C)).astype(np.float32) * 0.1),
            "bias": jnp.asarray(RNG.normal(size=C).astype(np.float32) * 0.1)},
        "bias_table": jnp.asarray(
            RNG.normal(size=(ntype, heads, N, N)).astype(np.float32) * 0.1),
    }
    mask = jnp.asarray(L.shifted_window_mask(4, 18, (2, 6, 12)))[:ntype]
    want = L.earth_attention(p, x, heads, mask)
    with pltpu.force_tpu_interpret_mode():
        got = W.window_attention_pallas(p, x, heads, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_pick_block():
    assert W._pick_block(30, 10) == 10
    assert W._pick_block(15, 10) == 5
    assert W._pick_block(7, 10) == 7
    assert W._pick_block(13, 10) == 1


def test_fused_wrapper_gradients_match_xla():
    """Gradients through the fused megakernel custom_vjp == gradients
    through the plain XLA attention."""
    B, nlon, ntype, N, C, heads = 1, 2, 3, 144, 16, 2
    x = jnp.asarray(RNG.normal(size=(B, nlon, ntype, N, C)).astype(np.float32))
    p = {
        "qkv": {"kernel": jnp.asarray(
            RNG.normal(size=(C, 3 * C)).astype(np.float32) * 0.1),
            "bias": jnp.asarray(RNG.normal(size=3 * C).astype(np.float32) * 0.1)},
        "proj": {"kernel": jnp.asarray(
            RNG.normal(size=(C, C)).astype(np.float32) * 0.1),
            "bias": jnp.asarray(RNG.normal(size=C).astype(np.float32) * 0.1)},
        "bias_table": jnp.asarray(
            RNG.normal(size=(ntype, heads, N, N)).astype(np.float32) * 0.1),
    }
    mask = jnp.asarray(L.shifted_window_mask(4, 18, (2, 6, 12)))[:ntype]

    def loss_pallas(p, x):
        return jnp.sum(W.window_attention_pallas(p, x, heads, mask) ** 2)

    def loss_xla(p, x):
        return jnp.sum(L.earth_attention(p, x, heads, mask) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_pallas, argnums=(0, 1))(p, x)
    gx = jax.grad(loss_xla, argnums=(0, 1))(p, x)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3), gp, gx)


def test_fused_wrapper_lora_fallback():
    """With LoRA leaves attached the wrapper must route through the XLA
    dense path (which applies the low-rank update)."""
    B, nlon, ntype, N, C, heads = 1, 1, 2, 144, 8, 2
    x = jnp.asarray(RNG.normal(size=(B, nlon, ntype, N, C)).astype(np.float32))
    p = {
        "qkv": {"kernel": jnp.asarray(
            RNG.normal(size=(C, 3 * C)).astype(np.float32) * 0.1),
            "bias": jnp.zeros(3 * C),
            "lora_a": jnp.asarray(
                RNG.normal(size=(C, 2)).astype(np.float32)),
            "lora_b": jnp.asarray(
                RNG.normal(size=(2, 3 * C)).astype(np.float32) * 0.1),
            "lora_scale": jnp.asarray(1.0)},
        "proj": {"kernel": jnp.eye(C), "bias": jnp.zeros(C)},
        "bias_table": jnp.zeros((ntype, heads, N, N)),
    }
    got = W.window_attention_pallas(p, x, heads, None)
    want = L.earth_attention(p, x, heads, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_block_tail_matches_xla():
    from pangu_tpu.ops.block_tail import fused_block_tail
    B, Z, H, Wd, C = 1, 2, 3, 4, 16
    attn_out = jnp.asarray(RNG.normal(size=(B, Z, H, Wd, C)).astype(np.float32))
    shortcut = jnp.asarray(RNG.normal(size=(B, Z, H, Wd, C)).astype(np.float32))
    p = {
        "norm1": {"scale": jnp.asarray(RNG.normal(size=C).astype(np.float32)),
                  "bias": jnp.asarray(RNG.normal(size=C).astype(np.float32))},
        "norm2": {"scale": jnp.asarray(RNG.normal(size=C).astype(np.float32)),
                  "bias": jnp.asarray(RNG.normal(size=C).astype(np.float32))},
        "mlp": {"fc1": {"kernel": jnp.asarray(
                    RNG.normal(size=(C, 4 * C)).astype(np.float32) * 0.1),
                    "bias": jnp.asarray(RNG.normal(size=4 * C).astype(np.float32))},
                "fc2": {"kernel": jnp.asarray(
                    RNG.normal(size=(4 * C, C)).astype(np.float32) * 0.1),
                    "bias": jnp.asarray(RNG.normal(size=C).astype(np.float32))}},
    }
    want = shortcut + L.layer_norm(p["norm1"], attn_out)
    want = want + L.layer_norm(p["norm2"], L.mlp(p["mlp"], want))
    with pltpu.force_tpu_interpret_mode():
        got = fused_block_tail(p, attn_out, shortcut)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_grid_attention_matches_partitioned():
    """window_attention_grid (in-kernel partition) == partition ->
    earth_attention -> reverse, shifted mask included."""
    B, Z, Hp, Wd, C, heads = 1, 4, 18, 48, 16, 2
    window = (2, 6, 12)
    xg = jnp.asarray(RNG.normal(size=(B, Z, Hp, Wd, C)).astype(np.float32))
    ntype = (Z // 2) * (Hp // 6)
    p = {
        "qkv": {"kernel": jnp.asarray(
            RNG.normal(size=(C, 3 * C)).astype(np.float32) * 0.1),
            "bias": jnp.asarray(RNG.normal(size=3 * C).astype(np.float32) * 0.1)},
        "proj": {"kernel": jnp.asarray(
            RNG.normal(size=(C, C)).astype(np.float32) * 0.1),
            "bias": jnp.asarray(RNG.normal(size=C).astype(np.float32) * 0.1)},
        "bias_table": jnp.asarray(
            RNG.normal(size=(ntype, heads, 144, 144)).astype(np.float32) * 0.1),
    }
    mask = jnp.asarray(L.shifted_window_mask(Z, Hp, window))

    win = L.window_partition(xg, window)
    want = L.window_reverse(L.earth_attention(p, win, heads, mask),
                            window, Z, Hp, Wd)
    with pltpu.force_tpu_interpret_mode():
        got = W.window_attention_grid(p, xg, heads, (Z, Hp), window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_grid_attention_gradients():
    B, Z, Hp, Wd, C, heads = 1, 2, 6, 24, 8, 2
    window = (2, 6, 12)
    ntype = (Z // 2) * (Hp // 6)
    xg = jnp.asarray(RNG.normal(size=(B, Z, Hp, Wd, C)).astype(np.float32))
    p = {
        "qkv": {"kernel": jnp.asarray(
            RNG.normal(size=(C, 3 * C)).astype(np.float32) * 0.1),
            "bias": jnp.zeros(3 * C)},
        "proj": {"kernel": jnp.asarray(
            RNG.normal(size=(C, C)).astype(np.float32) * 0.1),
            "bias": jnp.zeros(C)},
        "bias_table": jnp.asarray(
            RNG.normal(size=(ntype, heads, 144, 144)).astype(np.float32) * 0.1),
    }

    def loss_grid(p, xg):
        return jnp.sum(W.window_attention_grid(p, xg, heads, None, window) ** 2)

    def loss_xla(p, xg):
        win = L.window_partition(xg, window)
        y = L.window_reverse(L.earth_attention(p, win, heads, None),
                             window, Z, Hp, Wd)
        return jnp.sum(y ** 2)

    with pltpu.force_tpu_interpret_mode():
        gg = jax.grad(loss_grid, argnums=(0, 1))(p, xg)
    gx = jax.grad(loss_xla, argnums=(0, 1))(p, xg)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3), gg, gx)


@pytest.mark.parametrize("masked", [False, True])
def test_grid_attention_pallas_bwd_kernel(monkeypatch, masked):
    """The one-kernel fused grid backward (PANGU_GRID_BWD=pallas):
    dX and every weight/bias gradient must match the XLA composition,
    with and without the in-kernel shifted-window region-id mask.
    Covers B=2 so the resident accumulator blocks (dW*, per-type dbias)
    are revisited across the innermost batch grid dim."""
    B, Z, Hp, Wd, C, heads = 2, 2, 6, 24, 8, 2
    window = (2, 6, 12)
    ntype = (Z // 2) * (Hp // 6)
    xg = jnp.asarray(RNG.normal(size=(B, Z, Hp, Wd, C)).astype(np.float32))
    args = (
        jnp.asarray(RNG.normal(size=(C, 3 * C)).astype(np.float32) * 0.1),
        jnp.asarray(RNG.normal(size=(3 * C,)).astype(np.float32) * 0.1),
        jnp.asarray(RNG.normal(size=(C, C)).astype(np.float32) * 0.1),
        jnp.asarray(RNG.normal(size=(C,)).astype(np.float32) * 0.1),
        jnp.asarray(RNG.normal(size=(ntype, heads, 144, 144)
                               ).astype(np.float32) * 0.1),
    )

    def loss(impl, *a):
        monkeypatch.setattr(W, "GRID_BWD_IMPL", impl)
        W._grid_core.cache_clear()
        core = W._grid_core(heads, window, (Z, Hp) if masked else None)
        return lambda xg, *aa: jnp.sum(core(xg, *aa) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss("pallas"), argnums=tuple(range(6)))(xg, *args)
        # the "xla" bwd still runs the pallas fwd + sdpa kernels inside
        gx = jax.grad(loss("xla"), argnums=tuple(range(6)))(xg, *args)
    W._grid_core.cache_clear()
    names = ["dx", "dwqkv", "dbqkv", "dwp", "dbp", "dbias"]
    for name, a, b in zip(names, gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-3, err_msg=name)


def test_grid_attention_batch2():
    """Batch dimension rides the grid correctly (B=2 must equal two
    independent B=1 calls)."""
    B, Z, Hp, Wd, C, heads = 2, 2, 6, 24, 8, 2
    window = (2, 6, 12)
    ntype = (Z // 2) * (Hp // 6)
    xg = jnp.asarray(RNG.normal(size=(B, Z, Hp, Wd, C)).astype(np.float32))
    p = {
        "qkv": {"kernel": jnp.asarray(
            RNG.normal(size=(C, 3 * C)).astype(np.float32) * 0.1),
            "bias": jnp.zeros(3 * C)},
        "proj": {"kernel": jnp.asarray(
            RNG.normal(size=(C, C)).astype(np.float32) * 0.1),
            "bias": jnp.zeros(C)},
        "bias_table": jnp.asarray(
            RNG.normal(size=(ntype, heads, 144, 144)).astype(np.float32) * 0.1),
    }
    with pltpu.force_tpu_interpret_mode():
        both = W.window_attention_grid(p, xg, heads, None, window)
        one = W.window_attention_grid(p, xg[1:], heads, None, window)
    np.testing.assert_allclose(np.asarray(both[1]), np.asarray(one[0]),
                               atol=1e-5)


def test_block_noroll_fused_matches_xla_block():
    """Whole-block no-roll kernel == pad -> attention -> crop -> tail via
    the XLA path, at the earth_block level."""
    import dataclasses
    from pangu_tpu.config import TINY
    from pangu_tpu.models import pangu
    from pangu_tpu.data.constants import synthetic_constants

    cfg_x = dataclasses.replace(TINY, remat=False, attn_impl="xla")
    g = cfg_x.stage(0)
    params = pangu.init_params(jax.random.PRNGKey(3), cfg_x)
    bp = params["stages"][0]["blocks"][0]
    x = jnp.asarray(RNG.normal(size=(1, g.z, g.h, g.w, g.dim)
                               ).astype(np.float32))
    want = L.earth_block(bp, x, geom=g, roll=False)
    with pltpu.force_tpu_interpret_mode():
        got = L.earth_block(bp, x, geom=g, roll=False, attn_impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    # shifted block goes through grid attention + fused tail instead
    want_r = L.earth_block(bp, x, geom=g, roll=True)
    with pltpu.force_tpu_interpret_mode():
        got_r = L.earth_block(bp, x, geom=g, roll=True, attn_impl="pallas")
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=2e-4)


def _stage_xla_reference(stage_params, x, geom):
    """The XLA earth_block composition (pad/roll/partition/attn/tail per
    block) — the proven-parity path the fused stage must match."""
    y = x
    for j, bp in enumerate(stage_params["blocks"]):
        y = L.earth_block(bp, y, geom=geom, roll=(j % 2 == 1),
                          deterministic=True, attn_impl="xla")
    return y


@pytest.mark.parametrize("stage_idx", [0, 1])
@pytest.mark.parametrize("depth", [2, 4])
def test_run_stage_fused_matches_xla(stage_idx, depth):
    """Whole-stage fused kernels (pad/roll via index maps, in-kernel zero
    synthesis, rolled-coordinate storage) == the XLA composition, at both
    full-res and half-res TINY geometry, including the unshifted-after-
    shifted inverse-offset read (depth 4)."""
    from pangu_tpu.config import TINY
    from pangu_tpu.models import pangu
    from pangu_tpu.ops.earth_block_fused import run_stage_fused

    cfg = TINY
    geom = cfg.stage(stage_idx)
    params = pangu.init_params(jax.random.PRNGKey(stage_idx), cfg)
    blocks = params["stages"][stage_idx]["blocks"]
    stage_params = {"blocks": (blocks * 2)[:depth]}

    x = jnp.asarray(RNG.normal(
        size=(1, geom.z, geom.h, geom.w, geom.dim)).astype(np.float32))

    want = _stage_xla_reference(stage_params, x, geom)
    with pltpu.force_tpu_interpret_mode():
        got = run_stage_fused(stage_params, x, geom)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-5)


@pytest.mark.parametrize("stage_idx,depth", [(0, 2), (1, 4)])
def test_run_stage_train_matches_xla_with_drop_scales(stage_idx, depth):
    """Training-path whole-block kernels (run_stage_train): value AND
    gradients must match the XLA composition with the same per-sample
    stochastic-depth branch scales."""
    from pangu_tpu.config import TINY
    from pangu_tpu.models import pangu
    from pangu_tpu.ops.earth_block_fused import run_stage_train

    cfg = TINY
    geom = cfg.stage(stage_idx)
    params = pangu.init_params(jax.random.PRNGKey(stage_idx), cfg)
    blocks = params["stages"][stage_idx]["blocks"]
    stage_params = {"blocks": (blocks * 2)[:depth]}
    B = 2
    rng = np.random.default_rng(41 + 10 * stage_idx + depth)  # order-proof
    # non-trivial scales incl. a fully-dropped branch and a rescale
    drops = [jnp.asarray(rng.choice([0.0, 0.8, 1.25], size=(B, 2))
                         .astype(np.float32)) for _ in range(depth)]

    x = jnp.asarray(rng.normal(
        size=(B, geom.z, geom.h, geom.w, geom.dim)).astype(np.float32))

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

    def loss_fused(sp, xx):
        return jnp.sum(run_stage_train(sp, xx, geom, drops) ** 2)

    def loss_ref(sp, xx):
        return jnp.sum(ref_chain(sp, xx) ** 2)

    with pltpu.force_tpu_interpret_mode():
        vf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1))(
            stage_params, x)
    vr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1))(stage_params, x)

    np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_r = jax.tree.leaves(gr)
    assert len(flat_f) == len(flat_r)
    for (path, a), b in zip(flat_f, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path))


def test_forward_train_rng_parity_pallas_vs_xla():
    """pangu.forward in training mode: the fused-kernel path must consume
    the SAME drop-path RNG stream as the XLA path (identical outputs)."""
    import dataclasses
    from pangu_tpu.config import TINY
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.models import pangu

    consts = {k: jnp.asarray(v) for k, v in synthetic_constants(TINY).items()}
    params = pangu.init_params(jax.random.PRNGKey(3), TINY)
    u = jnp.asarray(RNG.normal(size=(2, 5, TINY.levels, TINY.lat, TINY.lon)
                               ).astype(np.float32))
    s = jnp.asarray(RNG.normal(size=(2, 4, TINY.lat, TINY.lon)
                               ).astype(np.float32))
    key = jax.random.PRNGKey(9)

    cfg_x = dataclasses.replace(TINY, attn_impl="xla")
    cfg_p = dataclasses.replace(TINY, attn_impl="pallas")
    wu, ws = pangu.forward(params, u, s, consts, cfg_x, rng=key,
                           deterministic=False)
    with pltpu.force_tpu_interpret_mode():
        gu, gs = pangu.forward(params, u, s, consts, cfg_p, rng=key,
                               deterministic=False)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu), atol=2e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ws), atol=2e-4,
                               rtol=1e-4)


@pytest.mark.parametrize("edges", [True, False])
def test_forward_train_wm_trunk_grads_match_xla(edges):
    """The all-window-major training trunk (forward_core_wm_train via
    pangu.forward with deterministic=False: wm-io whole-block bwd kernels
    + differentiable wm down/up boundaries) must match the XLA path in
    BOTH loss value and every parameter/input gradient, with the same
    drop-path RNG stream.  With ``edges`` the step also runs the
    differentiable Pallas embed/recovery edges (embed_wm_train /
    recovery_wm_train) — the full shipping training configuration."""
    import dataclasses
    from pangu_tpu.config import TINY
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.models import pangu

    consts = {k: jnp.asarray(v) for k, v in synthetic_constants(TINY).items()}
    params = pangu.init_params(jax.random.PRNGKey(4), TINY)
    rng = np.random.default_rng(17)
    u = jnp.asarray(rng.normal(size=(2, 5, TINY.levels, TINY.lat, TINY.lon)
                               ).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(2, 4, TINY.lat, TINY.lon)
                               ).astype(np.float32))
    key = jax.random.PRNGKey(11)

    cfg_x = dataclasses.replace(TINY, attn_impl="xla")
    cfg_p = dataclasses.replace(TINY, attn_impl="pallas", block_layout="wm",
                                edge_kernels=edges)

    def loss(cfg):
        def f(p, uu, ss):
            wu, ws = pangu.forward(p, uu, ss, consts, cfg, rng=key,
                                   deterministic=False)
            return jnp.sum(wu ** 2) + jnp.sum(ws ** 2)
        return f

    vr, gr = jax.value_and_grad(loss(cfg_x), argnums=(0, 1, 2))(params, u, s)
    with pltpu.force_tpu_interpret_mode():
        vf, gf = jax.value_and_grad(loss(cfg_p), argnums=(0, 1, 2))(
            params, u, s)

    np.testing.assert_allclose(float(vf), float(vr), rtol=2e-5)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_r = jax.tree.leaves(gr)
    assert len(flat_f) == len(flat_r)
    for (path, a), b in zip(flat_f, flat_r):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = max(1.0, float(np.max(np.abs(b))))
        d = float(np.max(np.abs(a - b)))
        assert d <= 5e-5 * scale, (
            f"{jax.tree_util.keystr(path)}: maxdiff {d:.3e} vs "
            f"scale {scale:.3e}")


@pytest.mark.parametrize("odd_h", [True, False])
def test_down_up_sample_fused_match_xla(odd_h):
    """Fused down/up-sample kernels == the XLA compositions (values and
    gradients), including the odd-latitude pad/crop edges."""
    from pangu_tpu.ops.updown import down_sample_fused, up_sample_fused

    rng = np.random.default_rng(5 + odd_h)
    B, Z, H, W, C = 2, 2, (13 if odd_h else 14), 24, 16
    x = jnp.asarray(rng.normal(size=(B, Z, H, W, C)).astype(np.float32))
    h2 = -(-H // 2)
    pd = {
        "norm": {"scale": jnp.asarray(rng.normal(size=4 * C)
                                      .astype(np.float32)),
                 "bias": jnp.asarray(rng.normal(size=4 * C)
                                     .astype(np.float32))},
        "reduce": {"kernel": jnp.asarray(
            rng.normal(size=(4 * C, 2 * C)).astype(np.float32) * 0.1)},
    }
    want = L.down_sample(pd, x)

    def loss_f(pd, x):
        return jnp.sum(down_sample_fused(pd, x) ** 2)

    def loss_r(pd, x):
        return jnp.sum(L.down_sample(pd, x) ** 2)

    with pltpu.force_tpu_interpret_mode():
        got = down_sample_fused(pd, x)
        gf = jax.grad(loss_f, argnums=(0, 1))(pd, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    gr = jax.grad(loss_r, argnums=(0, 1))(pd, x)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)

    # upsample back to H
    xu = jnp.asarray(rng.normal(size=(B, Z, h2, W // 2, 2 * C)
                                ).astype(np.float32))
    pu = {
        "expand": {"kernel": jnp.asarray(
            rng.normal(size=(2 * C, 4 * C)).astype(np.float32) * 0.1)},
        "norm": {"scale": jnp.asarray(rng.normal(size=C).astype(np.float32)),
                 "bias": jnp.asarray(rng.normal(size=C).astype(np.float32))},
        "mix": {"kernel": jnp.asarray(
            rng.normal(size=(C, C)).astype(np.float32) * 0.1)},
    }
    want_u = L.up_sample(pu, xu, H)

    def loss_fu(pu, xu):
        return jnp.sum(up_sample_fused(pu, xu, H) ** 2)

    def loss_ru(pu, xu):
        return jnp.sum(L.up_sample(pu, xu, H) ** 2)

    with pltpu.force_tpu_interpret_mode():
        got_u = up_sample_fused(pu, xu, H)
        gfu = jax.grad(loss_fu, argnums=(0, 1))(pu, xu)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u),
                               atol=1e-4)
    gru = jax.grad(loss_ru, argnums=(0, 1))(pu, xu)
    for a, b in zip(jax.tree.leaves(gfu), jax.tree.leaves(gru)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


@pytest.mark.quick
@pytest.mark.parametrize("stage_idx", [0, 1])
@pytest.mark.parametrize("depth", [2, 4])
def test_run_stage_wm_matches_xla(stage_idx, depth):
    """Window-major whole-stage kernels (ops/earth_block_wm.py: direct
    window-row reads, 4-chunk z/lat stitch via index maps, roll+select
    lat/lon interleave) == the XLA composition, both TINY geometries,
    including the inverse-offset read after a shifted block (depth 4)."""
    from pangu_tpu.config import TINY
    from pangu_tpu.models import pangu
    from pangu_tpu.ops.earth_block_wm import run_stage_wm

    cfg = TINY
    geom = cfg.stage(stage_idx)
    params = pangu.init_params(jax.random.PRNGKey(stage_idx), cfg)
    blocks = params["stages"][stage_idx]["blocks"]
    stage_params = {"blocks": (blocks * 2)[:depth]}

    x = jnp.asarray(RNG.normal(
        size=(1, geom.z, geom.h, geom.w, geom.dim)).astype(np.float32))

    want = _stage_xla_reference(stage_params, x, geom)
    with pltpu.force_tpu_interpret_mode():
        got = run_stage_wm(stage_params, x, geom)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-5)


@pytest.mark.quick
def test_window_major_roundtrip():
    from pangu_tpu.ops.earth_block_wm import (from_window_major,
                                              to_window_major)
    x = jnp.asarray(RNG.normal(size=(2, 4, 12, 24, 8)).astype(np.float32))
    xs = to_window_major(x, (2, 6, 12))
    assert xs.shape == (2, 2, 2, 2, 144, 8)
    np.testing.assert_array_equal(
        np.asarray(from_window_major(xs, (2, 6, 12))), np.asarray(x))


@pytest.mark.parametrize("stage_idx,depth", [(0, 2), (1, 4)])
def test_run_stage_train_wm_matches_xla_with_drop_scales(stage_idx, depth):
    """Whole-block BACKWARD kernel chain (ops/earth_block_bwd.py —
    mixed-layout wm primal, one-kernel-per-block backward, cotangent
    chain carrying coordinate offsets): value AND all gradients must
    match the XLA composition with the same stochastic-depth scales."""
    from pangu_tpu.config import TINY
    from pangu_tpu.models import pangu
    from pangu_tpu.ops.earth_block_bwd import run_stage_train_wm

    cfg = TINY
    geom = cfg.stage(stage_idx)
    params = pangu.init_params(jax.random.PRNGKey(stage_idx), cfg)
    blocks = params["stages"][stage_idx]["blocks"]
    stage_params = {"blocks": (blocks * 2)[:depth]}
    B = 2
    rng = np.random.default_rng(91 + 10 * stage_idx + depth)
    drops = [jnp.asarray(rng.choice([0.0, 0.8, 1.25], size=(B, 2))
                         .astype(np.float32)) for _ in range(depth)]

    x = jnp.asarray(rng.normal(
        size=(B, geom.z, geom.h, geom.w, geom.dim)).astype(np.float32))

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

    def loss_fused(sp, xx):
        return jnp.sum(run_stage_train_wm(sp, xx, geom, drops) ** 2)

    def loss_ref(sp, xx):
        return jnp.sum(ref_chain(sp, xx) ** 2)

    with pltpu.force_tpu_interpret_mode():
        vf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1))(
            stage_params, x)
    vr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1))(stage_params, x)

    np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5)
    # per-leaf comparison scaled by the leaf's max magnitude — the right
    # metric for fp32 gradient sums whose elementwise rounding differs
    # with reduction order (kernel accumulators vs XLA fusion order)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    flat_r = jax.tree.leaves(gr)
    assert len(flat_f) == len(flat_r)
    for (path, a), b in zip(flat_f, flat_r):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = max(1.0, float(np.max(np.abs(b))))
        d = float(np.max(np.abs(a - b)))
        assert d <= 2e-5 * scale, (
            f"{jax.tree_util.keystr(path)}: maxdiff {d:.3e} vs "
            f"scale {scale:.3e}")


def test_down_up_sample_wm_match_xla():
    """Window-major DownSample/UpSample kernels (ops/updown_wm.py):
    consume rolled wm storage (roll-back + crop + re-pad folded into the
    stitch index maps and masks) and emit the next stage's wm entry
    storage; must match pad->roll->crop->L.down_sample/up_sample."""
    from pangu_tpu.config import TINY
    from pangu_tpu.ops.earth_block_wm import (from_window_major,
                                              to_window_major)
    from pangu_tpu.ops.updown_wm import down_sample_wm, up_sample_wm

    cfg = TINY
    g0, g1 = cfg.stage(0), cfg.stage(1)
    g2, g3 = cfg.stage(2), cfg.stage(3)
    rng = np.random.default_rng(7)
    off = (1, 3, 6)
    B = 2

    def rolled_wm_storage(x, geom):
        """Simulate a stage that ended shifted: pad with JUNK rows (the
        exit blocks write garbage in the lat pad), roll by -off."""
        hp = geom.h_padded
        junk = jnp.asarray(rng.normal(
            size=(x.shape[0], x.shape[1], hp - x.shape[2], x.shape[3],
                  x.shape[4])).astype(np.float32)) * 100.0
        xp = jnp.concatenate([x, junk], axis=2)
        return to_window_major(jnp.roll(xp, (-off[0], -off[1], -off[2]),
                                        axis=(1, 2, 3)), geom.window)

    # ---- down ----------------------------------------------------------
    C = g0.dim
    x = jnp.asarray(rng.normal(
        size=(B, g0.z, g0.h, g0.w, C)).astype(np.float32))
    pd = {
        "norm": {"scale": jnp.asarray(rng.normal(size=4 * C)
                                      .astype(np.float32)),
                 "bias": jnp.asarray(rng.normal(size=4 * C)
                                     .astype(np.float32))},
        "reduce": {"kernel": jnp.asarray(
            rng.normal(size=(4 * C, 2 * C)).astype(np.float32) * 0.1)},
    }
    want = L.down_sample(pd, x)                      # (B, Z, h1, w1, 2C)
    want = jnp.pad(want, ((0, 0), (0, 0), (0, g1.h_padded - g1.h),
                          (0, 0), (0, 0)))
    want = to_window_major(want, g1.window)
    with pltpu.force_tpu_interpret_mode():
        got = down_sample_wm(pd, rolled_wm_storage(x, g0), g0, g1, off)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)

    # ---- up ------------------------------------------------------------
    C2, C3 = g2.dim, g3.dim
    xu = jnp.asarray(rng.normal(
        size=(B, g2.z, g2.h, g2.w, C2)).astype(np.float32))
    pu = {
        "expand": {"kernel": jnp.asarray(
            rng.normal(size=(C2, 4 * C3)).astype(np.float32) * 0.1)},
        "norm": {"scale": jnp.asarray(rng.normal(size=C3)
                                      .astype(np.float32)),
                 "bias": jnp.asarray(rng.normal(size=C3)
                                     .astype(np.float32))},
        "mix": {"kernel": jnp.asarray(
            rng.normal(size=(C3, C3)).astype(np.float32) * 0.1)},
    }
    want_u = L.up_sample(pu, xu, g3.h)               # (B, Z, h3, w3, C3)
    with pltpu.force_tpu_interpret_mode():
        got_u = up_sample_wm(pu, rolled_wm_storage(xu, g2), g2, g3, off)
    got_u = from_window_major(got_u, g3.window)[:, :, :g3.h]
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("stage_idx,gh", [(0, 3), (1, 2)])
def test_run_stage_wm_lat_group_matches(stage_idx, gh):
    """Lat-grouped interior wm kernels (gh windows per program, adjacent-
    block stitch pairs) == the ungrouped wm chain, including shifted
    blocks and the single-block wrap (nblk small)."""
    from pangu_tpu.config import TINY
    from pangu_tpu.models import pangu
    from pangu_tpu.ops.earth_block_wm import run_stage_wm

    cfg = TINY
    geom = cfg.stage(stage_idx)
    params = pangu.init_params(jax.random.PRNGKey(stage_idx), cfg)
    blocks = params["stages"][stage_idx]["blocks"]
    stage_params = {"blocks": (blocks * 2)[:4]}

    x = jnp.asarray(RNG.normal(
        size=(2, geom.z, geom.h, geom.w, geom.dim)).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        want = run_stage_wm(stage_params, x, geom, lat_group=1)
        got = run_stage_wm(stage_params, x, geom, lat_group=gh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-5)


def test_embed_wm_matches_patch_embed():
    """Fused embed->wm-entry kernel (ops/embed_wm.py) ==
    to_window_major(pad(L.patch_embed(...))): normalisation, const_h /
    const-mask channels, surface plane 0, zeroed lat-pad rows."""
    import dataclasses

    from pangu_tpu.config import TINY
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.models import pangu
    from pangu_tpu.ops.earth_block_wm import to_window_major
    from pangu_tpu.ops.embed_wm import embed_supported, embed_wm

    cfg = dataclasses.replace(TINY, param_dtype="float32",
                              compute_dtype="float32")
    assert embed_supported(cfg)
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    constants = {k: jnp.asarray(v)
                 for k, v in synthetic_constants(cfg).items()}
    rng = np.random.default_rng(11)
    B = 2
    upper = jnp.asarray(rng.normal(
        size=(B, cfg.upper_vars, cfg.levels, cfg.lat, cfg.lon)
    ).astype(np.float32))
    surface = jnp.asarray(rng.normal(
        size=(B, cfg.surface_vars, cfg.lat, cfg.lon)).astype(np.float32))

    want = L.patch_embed(params["patch_embed"], upper, surface, constants,
                         cfg)
    g0 = cfg.stage(0)
    want = to_window_major(
        jnp.pad(want, ((0, 0), (0, 0), (0, g0.h_padded - want.shape[2]),
                       (0, 0), (0, 0))), g0.window)
    with pltpu.force_tpu_interpret_mode():
        got = embed_wm(params["patch_embed"], upper, surface, constants,
                       cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("off", [(0, 0, 0), (1, 3, 6)])
def test_recovery_wm_matches_patch_recovery(off):
    """Rolled-wm recovery kernel (ops/recovery_wm.py) ==
    patch_recovery((canon(skip), canon(dec))): roll-back stitch, crop,
    split-row dense, (var, z_off, h_off, w_off) interleave."""
    import dataclasses

    from pangu_tpu.config import TINY
    from pangu_tpu.models import pangu
    from pangu_tpu.ops.earth_block_wm import to_window_major
    from pangu_tpu.ops.recovery_wm import recovery_supported, recovery_wm

    cfg = dataclasses.replace(TINY, param_dtype="float32",
                              compute_dtype="float32")
    assert recovery_supported(cfg)
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    g3 = cfg.stage(3)
    rng = np.random.default_rng(12)
    B = 2
    skip_c = jnp.asarray(rng.normal(
        size=(B, g3.z, g3.h_padded, g3.w, g3.dim)).astype(np.float32))
    dec_c = jnp.asarray(rng.normal(
        size=(B, g3.z, g3.h_padded, g3.w, g3.dim)).astype(np.float32))
    skip_s = to_window_major(
        jnp.roll(skip_c, tuple(-o for o in off), axis=(1, 2, 3)), g3.window)
    dec_s = to_window_major(
        jnp.roll(dec_c, tuple(-o for o in off), axis=(1, 2, 3)), g3.window)

    want_u, want_s = L.patch_recovery(
        params["patch_recovery"],
        (skip_c[:, :, :g3.h], dec_c[:, :, :g3.h]), cfg)
    with pltpu.force_tpu_interpret_mode():
        got_u, got_s = recovery_wm(params["patch_recovery"], skip_s, dec_s,
                                   off, cfg)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               atol=2e-5, rtol=1e-5)


def test_embed_wm_train_grads_match_xla():
    """Differentiable edge embed (ops/embed_wm.embed_wm_train: Pallas
    forward + direct-math XLA backward) == jax.grad of
    to_window_major(pad(L.patch_embed(...))) for every parameter grad and
    the upper/surface input cotangents."""
    import dataclasses

    from pangu_tpu.config import TINY
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.models import pangu
    from pangu_tpu.ops.earth_block_wm import to_window_major
    from pangu_tpu.ops.embed_wm import embed_supported, embed_wm_train

    cfg = dataclasses.replace(TINY, param_dtype="float32",
                              compute_dtype="float32")
    assert embed_supported(cfg)
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    constants = {k: jnp.asarray(v)
                 for k, v in synthetic_constants(cfg).items()}
    rng = np.random.default_rng(11)
    B = 2
    upper = jnp.asarray(rng.normal(
        size=(B, cfg.upper_vars, cfg.levels, cfg.lat, cfg.lon)
    ).astype(np.float32))
    surface = jnp.asarray(rng.normal(
        size=(B, cfg.surface_vars, cfg.lat, cfg.lon)).astype(np.float32))
    g0 = cfg.stage(0)
    w_out = jnp.asarray(rng.normal(size=(
        B, g0.z // g0.window[0], g0.h_padded // g0.window[1],
        g0.w // g0.window[2], g0.window_tokens, cfg.dims[0])
    ).astype(np.float32))

    def f_xla(pe, up, sf):
        x = L.patch_embed(pe, up, sf, constants, cfg)
        x = to_window_major(
            jnp.pad(x, ((0, 0), (0, 0), (0, g0.h_padded - x.shape[2]),
                        (0, 0), (0, 0))), g0.window)
        return jnp.sum(x * w_out)

    def f_pal(pe, up, sf):
        return jnp.sum(embed_wm_train(pe, up, sf, constants, cfg) * w_out)

    g_ref = jax.grad(f_xla, argnums=(0, 1, 2))(params["patch_embed"],
                                               upper, surface)
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(f_pal, argnums=(0, 1, 2))(params["patch_embed"],
                                                   upper, surface)
    flat_g = jax.tree_util.tree_leaves_with_path(g_got)
    flat_r = jax.tree.leaves(g_ref)
    assert len(flat_g) == len(flat_r)
    for (path, a), b in zip(flat_g, flat_r):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        d = float(jnp.max(jnp.abs(a - b)))
        assert d <= 5e-5 * scale, (
            f"{jax.tree_util.keystr(path)}: maxdiff {d:.3e} vs {scale:.3e}")


@pytest.mark.parametrize("off", [(0, 0, 0), (1, 3, 6)])
def test_recovery_wm_train_grads_match_xla(off):
    """Differentiable edge recovery (ops/recovery_wm.recovery_wm_train:
    Pallas forward + direct-math XLA backward) == jax.grad of
    L.patch_recovery((canon(skip), canon(dec))) for the head weight/bias
    grads AND the rolled-wm token cotangents the training trunk's
    backward consumes."""
    import dataclasses

    from pangu_tpu.config import TINY
    from pangu_tpu.models import pangu
    from pangu_tpu.ops.earth_block_wm import (from_window_major,
                                              to_window_major)
    from pangu_tpu.ops.recovery_wm import (recovery_supported,
                                           recovery_wm_train)

    cfg = dataclasses.replace(TINY, param_dtype="float32",
                              compute_dtype="float32")
    assert recovery_supported(cfg)
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    g3 = cfg.stage(3)
    rng = np.random.default_rng(12)
    B = 2
    skip_c = jnp.asarray(rng.normal(
        size=(B, g3.z, g3.h_padded, g3.w, g3.dim)).astype(np.float32))
    dec_c = jnp.asarray(rng.normal(
        size=(B, g3.z, g3.h_padded, g3.w, g3.dim)).astype(np.float32))
    skip_s = to_window_major(
        jnp.roll(skip_c, tuple(-o for o in off), axis=(1, 2, 3)), g3.window)
    dec_s = to_window_major(
        jnp.roll(dec_c, tuple(-o for o in off), axis=(1, 2, 3)), g3.window)
    wu = jnp.asarray(rng.normal(
        size=(B, cfg.upper_vars, cfg.levels, cfg.lat, cfg.lon)
    ).astype(np.float32))
    ws = jnp.asarray(rng.normal(
        size=(B, cfg.surface_vars, cfg.lat, cfg.lon)).astype(np.float32))

    def r_xla(pr, ss, ds):
        def canon(t):
            t = from_window_major(t, g3.window)
            return jnp.roll(t, off, axis=(1, 2, 3))[:, :, :g3.h]
        u, s = L.patch_recovery(pr, (canon(ss), canon(ds)), cfg)
        return jnp.sum(u * wu) + jnp.sum(s * ws)

    def r_pal(pr, ss, ds):
        u, s = recovery_wm_train(pr, ss, ds, off, cfg)
        return jnp.sum(u * wu) + jnp.sum(s * ws)

    g_ref = jax.grad(r_xla, argnums=(0, 1, 2))(params["patch_recovery"],
                                               skip_s, dec_s)
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(r_pal, argnums=(0, 1, 2))(params["patch_recovery"],
                                                   skip_s, dec_s)
    flat_g = jax.tree_util.tree_leaves_with_path(g_got)
    flat_r = jax.tree.leaves(g_ref)
    assert len(flat_g) == len(flat_r)
    for (path, a), b in zip(flat_g, flat_r):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        d = float(jnp.max(jnp.abs(a - b)))
        assert d <= 5e-5 * scale, (
            f"{jax.tree_util.keystr(path)}: maxdiff {d:.3e} vs {scale:.3e}")


def test_forward_edge_kernels_matches_xla_forward():
    """forward() with edge_kernels=True (Pallas embed->wm + wm->fields
    recovery around the all-wm trunk) == the plain XLA forward."""
    import dataclasses

    from pangu_tpu.config import TINY
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.models import pangu

    cfg_x = dataclasses.replace(TINY, param_dtype="float32",
                                compute_dtype="float32", attn_impl="xla")
    cfg_e = dataclasses.replace(cfg_x, attn_impl="pallas",
                                block_layout="wm", edge_kernels=True)
    params = pangu.init_params(jax.random.PRNGKey(0), cfg_x)
    constants = {k: jnp.asarray(v)
                 for k, v in synthetic_constants(cfg_x).items()}
    rng = np.random.default_rng(13)
    upper = jnp.asarray(rng.normal(
        size=(1, cfg_x.upper_vars, cfg_x.levels, cfg_x.lat, cfg_x.lon)
    ).astype(np.float32))
    surface = jnp.asarray(rng.normal(
        size=(1, cfg_x.surface_vars, cfg_x.lat, cfg_x.lon)
    ).astype(np.float32))

    want_u, want_s = pangu.forward(params, upper, surface, constants, cfg_x)
    assert pangu.wm_core_supported(params, cfg_e)
    with pltpu.force_tpu_interpret_mode():
        got_u, got_s = pangu.forward(params, upper, surface, constants,
                                     cfg_e)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u),
                               atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               atol=5e-4, rtol=1e-4)
