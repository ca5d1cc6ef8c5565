"""Autoregressive multi-day rollout as a compiled ``lax.scan``.

Replaces the reference's host-side ONNX-runtime feedback loop
(/root/reference/inference/inference_singleOutput.py:92-105), where every
24 h step round-trips the full state through host numpy. Here the whole
rollout is one XLA program: the state stays on device, buffers are donated
so the output of step t is written in place as the input of step t+1, and
de-normalisation + re-normalisation between steps fuse into the model.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pangu_tpu.config import ModelConfig
from pangu_tpu.data.constants import denorm_data
from pangu_tpu.models import pangu


def single_step(params, upper, surface, constants, cfg: ModelConfig,
                precision=None):
    """One 24 h forecast in *physical* units: forward (normalises inside)
    then de-normalise the prediction (models/pangu_sample.py:200-205)."""
    out_u, out_s = pangu.forward(params, upper, surface, constants, cfg,
                                 deterministic=True, precision=precision)
    return denorm_data(out_u, out_s, constants)


def _embed_per_sample(embed, upper, surface):
    """Run the patch embed one sample at a time (lax.map): at batch 4 the
    conv input concat picks a 21x-padded TPU layout (12.9 GB for 618 MB
    of data) and OOMs the chip; the embed runs once per rollout so the
    sequentialisation is free."""
    if upper.shape[0] == 1:
        return embed(upper, surface)

    def one(p):
        u, s = p
        return embed(u[None], s[None])[0]

    return jax.lax.map(one, (upper, surface))


def _recover_per_sample(recover, x_cat):
    """Apply ``recover`` one batch sample at a time (lax.map): the patch
    recovery's (B, V, ZP, pz, HT, ph, WT, pw) interleave intermediate is
    ~4.7 GB *per sample* in bf16 — batched it OOMs the chip at B>=4, and
    it runs once per rollout so sequentialising it costs nothing."""
    leaves = jax.tree.leaves(x_cat)
    if leaves[0].shape[0] == 1:
        return recover(x_cat)

    def one(p):
        out = recover(jax.tree.map(lambda t: t[None], p))
        return jax.tree.map(lambda a: a[0], out)

    return jax.lax.map(one, x_cat)


def make_rollout(cfg: ModelConfig, constants, steps: int, *,
                 return_trajectory: bool = False, precision=None,
                 token_space: bool = False):
    """Build a jitted rollout fn: (params, upper, surface) -> final state
    [, stacked per-step trajectory]. ``steps`` = horizon // 24
    (inference_singleOutput.py:92). State buffers are donated.

    ``token_space=True`` chains intermediate steps through the composed
    recovery->embed transition (engine/transition.py): the canonical
    physical-unit state is only materialised where an output is due (every
    step with ``return_trajectory``, else just the last), which removes
    the patch-recovery interleave + de/re-norm + patch-embed conv from
    every chained step. Identical math (the de-norm/re-norm cancel
    exactly); tested against the canonical loop in
    tests/test_transition.py."""
    from pangu_tpu.engine.transition import apply_transition, build_transition
    from pangu_tpu.models import layers as L
    from pangu_tpu.parallel.sharding import shard_tokens

    def rollout(params, upper, surface, constants):
        def body(carry, _):
            u, s = single_step(params, carry[0], carry[1], constants, cfg,
                               precision)
            return (u, s), ((u, s) if return_trajectory else None)

        (u, s), traj = jax.lax.scan(body, (upper, surface), None,
                                    length=steps)
        return ((u, s), traj) if return_trajectory else (u, s)

    def rollout_tokens(params, upper, surface, constants):
        tp = build_transition(params, constants, cfg)
        cdt = jnp.dtype(cfg.compute_dtype)
        x = shard_tokens(_embed_per_sample(
            lambda u, s: L.patch_embed(params["patch_embed"], u, s,
                                       constants, cfg, precision),
            upper.astype(cdt), surface.astype(cdt)))

        def recover(x_cat):
            out_u, out_s = L.patch_recovery(params["patch_recovery"], x_cat,
                                            cfg, precision)
            return denorm_data(out_u, out_s, constants)

        def body(x, _):
            x_cat = pangu.forward_core(params, x, cfg, deterministic=True,
                                       precision=precision)
            nxt = shard_tokens(apply_transition(tp, x_cat))
            return nxt, (recover(x_cat) if return_trajectory else None)

        if return_trajectory:
            _, traj = jax.lax.scan(body, x, None, length=steps)
            final = jax.tree.map(lambda a: a[-1], traj)
            return final, traj
        x, _ = jax.lax.scan(body, x, None, length=steps - 1)
        x_cat = pangu.forward_core(params, x, cfg, deterministic=True,
                                   precision=precision)
        return _recover_per_sample(recover, x_cat)

    def rollout_tokens_wm(params, upper, surface, constants):
        """All-window-major chained rollout: the token state never exists
        in canonical layout between steps — stage chains, down/up and the
        recovery->embed transition all read/write wm storage directly
        (pangu.forward_core_wm + engine/transition_wm)."""
        from pangu_tpu.engine.transition_wm import (apply_transition_wm,
                                                    build_transition_wm)
        from pangu_tpu.ops.earth_block_wm import (from_window_major,
                                                  to_window_major)
        from pangu_tpu.ops.embed_wm import embed_supported, embed_wm
        from pangu_tpu.ops.recovery_wm import (recovery_supported,
                                               recovery_wm)

        geom = cfg.stage(0)
        edge = (cfg.edge_kernels and embed_supported(cfg)
                and recovery_supported(cfg))
        tp = build_transition_wm(params, constants, cfg)
        cdt = jnp.dtype(cfg.compute_dtype)
        if edge:
            # edge kernels write/read wm storage directly AND batch over
            # the pallas grid, so neither the embed conv's padded-concat
            # OOM nor the recovery interleave OOM applies at batch > 1
            xs = embed_wm(params["patch_embed"], upper, surface, constants,
                          cfg)
        else:
            x = _embed_per_sample(
                lambda u, s: L.patch_embed(params["patch_embed"], u, s,
                                           constants, cfg, precision),
                upper.astype(cdt), surface.astype(cdt))
            xs = to_window_major(
                jnp.pad(x, ((0, 0), (0, 0), (0, geom.h_padded - x.shape[2]),
                            (0, 0), (0, 0))), geom.window)

        def recover(x_cat):
            out_u, out_s = L.patch_recovery(params["patch_recovery"], x_cat,
                                            cfg, precision)
            return denorm_data(out_u, out_s, constants)

        def canon(t, off):
            t = from_window_major(t, geom.window)
            return jnp.roll(t, off, axis=(1, 2, 3))[:, :, :geom.h]

        def recover_wm_final(skip, dec, off):
            if edge:
                out_u, out_s = recovery_wm(params["patch_recovery"], skip,
                                           dec, off, cfg)
                return denorm_data(out_u, out_s, constants)
            return _recover_per_sample(recover, (canon(skip, off),
                                                 canon(dec, off)))

        def body(xs, _):
            skip, dec, off = pangu.forward_core_wm(params, xs, cfg)
            nxt = apply_transition_wm(tp, skip, dec, geom, off)
            if return_trajectory:
                out = recover((canon(skip, off), canon(dec, off)))
            return nxt, (out if return_trajectory else None)

        if return_trajectory:
            _, traj = jax.lax.scan(body, xs, None, length=steps)
            final = jax.tree.map(lambda a: a[-1], traj)
            return final, traj
        xs, _ = jax.lax.scan(body, xs, None, length=steps - 1)
        skip, dec, off = pangu.forward_core_wm(params, xs, cfg)
        return recover_wm_final(skip, dec, off)

    def rollout_tokens_wm_sharded(params, upper, surface, constants, mesh):
        """The all-wm chained rollout per (dp, sp, tp) shard: ONE
        shard_map wraps the whole scan, so the carried wm state stays
        resident per shard across steps and the only cross-shard traffic
        is the shifted blocks' lon/z halo ppermutes (VERDICT round-2
        item 6; tp z-window sharding — with the z-type-major bias tables,
        ~87% of the weights, staying sharded on the serving path — is
        round 5)."""
        from jax.sharding import PartitionSpec as P

        from pangu_tpu.engine.transition_wm import (apply_transition_wm,
                                                    build_transition_wm)
        from pangu_tpu.ops.earth_block_wm import (from_window_major,
                                                  to_window_major)

        geom = cfg.stage(0)
        sp_size = dict(mesh.shape)["sp"]
        tp_size = dict(mesh.shape).get("tp", 1)
        tp_ax = "tp" if tp_size > 1 else None
        cdt = jnp.dtype(cfg.compute_dtype)
        tp = build_transition_wm(params, constants, cfg)
        tpd = {k: tp[k] for k in ("bias_field_wm", "M_s", "M_sh", "M_u",
                                  "M_uh", "M_uz", "M_uzh")}
        tpd_specs = {k: (P(None, tp_ax, None, "sp", None, None)
                         if k == "bias_field_wm" else P())
                     for k in tpd}

        from pangu_tpu.parallel.sharding import constrain
        tok = P("dp", tp_ax, None, "sp", None)
        x = constrain(_embed_per_sample(
            lambda u, s: L.patch_embed(params["patch_embed"], u, s,
                                       constants, cfg, precision),
            upper.astype(cdt), surface.astype(cdt)), tok)

        nzg = geom.z // geom.window[0]   # global z windows (z % wz == 0
        # is a wm_core_mesh precondition whenever tp > 1)

        def scan_trunk(p, tpl, xc):
            xs = to_window_major(
                jnp.pad(xc, ((0, 0), (0, 0),
                             (0, geom.h_padded - xc.shape[2]),
                             (0, 0), (0, 0))), geom.window)
            z_base = (jax.lax.axis_index("tp") * (nzg // tp_size)
                      if tp_size > 1 else None)

            def body(xs, _):
                skip, dec, off = pangu.forward_core_wm(
                    p, xs, cfg, sp_axis="sp", sp_size=sp_size,
                    tp_axis=tp_ax, tp_size=tp_size)
                return apply_transition_wm(
                    tpl, skip, dec, geom, off, z_base=z_base,
                    nz_global=nzg if tp_size > 1 else None), None

            xs, _ = jax.lax.scan(body, xs, None, length=steps - 1)
            skip, dec, off = pangu.forward_core_wm(
                p, xs, cfg, sp_axis="sp", sp_size=sp_size,
                tp_axis=tp_ax, tp_size=tp_size)

            def canon_l(t):
                t = from_window_major(t, geom.window)
                # per-shard roll: z is 0 under tp>1 and lon is 0 under
                # sp>1 (storage-resolved); the local components must
                # still be applied (the trunk's canon_l bug, NOTES r5)
                return jnp.roll(t, off, axis=(1, 2, 3))[:, :, :geom.h]

            return canon_l(skip), canon_l(dec)

        from pangu_tpu.models.pangu import _wm_param_specs
        skip, dec = jax.shard_map(
            scan_trunk, mesh=mesh,
            in_specs=(_wm_param_specs(params, tp_size), tpd_specs, tok),
            out_specs=(tok, tok), check_vma=False)(params, tpd, x)

        def recover(x_cat):
            out_u, out_s = L.patch_recovery(params["patch_recovery"], x_cat,
                                            cfg, precision)
            return denorm_data(out_u, out_s, constants)

        return _recover_per_sample(recover, (skip, dec))

    def rollout_tokens_dispatch(params, upper, surface, constants):
        # structural, trace-time choice: all-wm chain when supported
        if pangu.wm_core_supported(params, cfg):
            mesh = pangu.wm_core_mesh(cfg)
            if mesh is None:
                return rollout_tokens_wm(params, upper, surface, constants)
            if (not return_trajectory
                    and upper.shape[0] % dict(mesh.shape)["dp"] == 0):
                return rollout_tokens_wm_sharded(params, upper, surface,
                                                 constants, mesh)
        return rollout_tokens(params, upper, surface, constants)

    # constants enter the jit as a traced ARGUMENT: closing over the
    # device arrays would inline the ~67 MB const_h/mask fields as
    # literals into the compiled program (134 MB MLIR, enough to OOM the
    # TPU compile helper)
    jitted = jax.jit(rollout_tokens_dispatch if token_space else rollout,
                     donate_argnums=(1, 2))
    return lambda params, upper, surface: jitted(params, upper, surface,
                                                 constants)


# ---------------------------------------------------------------------------
# Hierarchical multi-model rollout (1h/3h/6h/24h greedy scheduling)
# ---------------------------------------------------------------------------

def greedy_schedule(horizon: int,
                    available: Tuple[int, ...] = (24, 6, 3, 1)) -> list[int]:
    """Decompose a forecast horizon into the fewest model steps, largest
    horizon first — the strategy of the original Pangu-Weather paper for
    its 1/3/6/24-hour model hierarchy (the reference ships the four ONNX
    checkpoints, era5_data/config.py:67-70, but only wires the 24 h one;
    inference_singleOutput.py:92 hard-codes horizon // 24)."""
    if horizon <= 0:
        raise ValueError("horizon must be positive")
    steps: list[int] = []
    remaining = horizon
    for h in sorted(available, reverse=True):
        while remaining >= h:
            steps.append(h)
            remaining -= h
    if remaining:
        raise ValueError(
            f"horizon {horizon} h not representable with models {available}")
    return steps


def make_hierarchical_rollout(cfg: ModelConfig, constants,
                              horizon: int, model_horizons: Tuple[int, ...],
                              *, precision=None, token_space: bool = False):
    """Build a jitted rollout over a model *hierarchy*: params_by_horizon is
    a dict {horizon_hours: params pytree}; the greedy schedule chains the
    largest usable model at each step. Steps with the same horizon are
    grouped into scans so each distinct model traces exactly once.

    ``token_space=True`` chains the whole hierarchy in token space:
    within-group steps use each model's own recovery->embed transition,
    and the handoff between two different-horizon models composes model
    A's recovery with model B's embed (build_transition(embed_params=B))
    — the physical-unit state never materialises until the final
    recovery. Exact by the same de/re-norm cancellation as the
    single-model path (shared ERA5 statistics)."""
    from pangu_tpu.engine.transition import apply_transition, build_transition
    from pangu_tpu.models import layers as L
    from pangu_tpu.parallel.sharding import shard_tokens

    schedule = greedy_schedule(horizon, model_horizons)
    # group consecutive equal horizons: [24,24,6,3] -> [(24,2),(6,1),(3,1)]
    groups: list[tuple[int, int]] = []
    for h in schedule:
        if groups and groups[-1][0] == h:
            groups[-1] = (h, groups[-1][1] + 1)
        else:
            groups.append((h, 1))

    def rollout(params_by_horizon, upper, surface, constants):
        carry = (upper, surface)
        for h, count in groups:
            params = params_by_horizon[h]

            def body(c, _, params=params):
                u, s = single_step(params, c[0], c[1], constants, cfg,
                                   precision)
                return (u, s), None

            carry, _ = jax.lax.scan(body, carry, None, length=count)
        return carry

    def rollout_tokens(params_by_horizon, upper, surface, constants):
        cdt = jnp.dtype(cfg.compute_dtype)
        p0 = params_by_horizon[groups[0][0]]
        # all-window-major when every model in the chain supports it
        # (single-device only here: the hierarchy chain is not
        # shard_mapped — under a mesh the canonical branch below runs,
        # whose per-stage dispatch still uses the sharded wm kernels)
        from pangu_tpu.parallel.sharding import multi_device_mesh_active
        use_wm = (not multi_device_mesh_active()
                  and all(pangu.wm_core_supported(params_by_horizon[h], cfg)
                          for h, _ in groups))
        if use_wm:
            from pangu_tpu.engine.transition_wm import (apply_transition_wm,
                                                        build_transition_wm)
            from pangu_tpu.ops.earth_block_wm import (from_window_major,
                                                      to_window_major)
            geom = cfg.stage(0)
        # on the canonical-layout branch, pin the carried token grid's
        # sharding at every chain point (embed output + each transition
        # result), exactly like make_rollout.rollout_tokens — without it
        # GSPMD may replicate the full token state per device under a
        # dp/sp mesh. The wm layout has its own per-kernel sharding story.
        from pangu_tpu.ops.embed_wm import embed_supported, embed_wm
        from pangu_tpu.ops.recovery_wm import (recovery_supported,
                                               recovery_wm)
        edge = (use_wm and cfg.edge_kernels and embed_supported(cfg)
                and recovery_supported(cfg))
        st = (lambda t: t) if use_wm else shard_tokens
        if edge:
            x = embed_wm(p0["patch_embed"], upper, surface, constants, cfg)
        else:
            x = st(_embed_per_sample(
                lambda u, s: L.patch_embed(p0["patch_embed"], u, s,
                                           constants, cfg, precision),
                upper.astype(cdt), surface.astype(cdt)))
            if use_wm:
                x = to_window_major(
                    jnp.pad(x, ((0, 0), (0, 0),
                                (0, geom.h_padded - x.shape[2]),
                                (0, 0), (0, 0))), geom.window)

        def core(params, xx):
            if use_wm:
                return pangu.forward_core_wm(params, xx, cfg)
            return pangu.forward_core(params, xx, cfg, deterministic=True,
                                      precision=precision)

        def trans(tp, x_cat):
            if use_wm:
                skip, dec, off = x_cat
                return apply_transition_wm(tp, skip, dec, geom, off)
            return apply_transition(tp, x_cat)

        for gi, (h, count) in enumerate(groups):
            params = params_by_horizon[h]
            build = (build_transition_wm if use_wm else build_transition)
            if count > 1:
                tp_self = build(params, constants, cfg)

                def body(xx, _, params=params, tp=tp_self):
                    return st(trans(tp, core(params, xx))), None

                x, _ = jax.lax.scan(body, x, None, length=count - 1)
            x_cat = core(params, x)
            if gi < len(groups) - 1:
                nxt = params_by_horizon[groups[gi + 1][0]]
                tp_cross = build(params, constants, cfg, embed_params=nxt)
                x = st(trans(tp_cross, x_cat))
            else:
                def recover(xc, params=params):
                    out_u, out_s = L.patch_recovery(
                        params["patch_recovery"], xc, cfg, precision)
                    return denorm_data(out_u, out_s, constants)

                if use_wm:
                    skip, dec, off = x_cat
                    if edge:
                        out_u, out_s = recovery_wm(
                            params["patch_recovery"], skip, dec, off, cfg)
                        return denorm_data(out_u, out_s, constants)

                    def canon(t):
                        t = from_window_major(t, geom.window)
                        return jnp.roll(t, off,
                                        axis=(1, 2, 3))[:, :, :geom.h]

                    x_cat = (canon(skip), canon(dec))
                return _recover_per_sample(recover, x_cat)

    jitted = jax.jit(rollout_tokens if token_space else rollout,
                     donate_argnums=(1, 2))  # constants as arg
    return (lambda pbh, upper, surface: jitted(pbh, upper, surface,
                                               constants)), schedule
