"""Autoregressive multi-day forecast inference.

Replaces /root/reference/inference/inference_singleOutput.py: where the
reference feeds the state back through ONNX Runtime on the host every 24 h
(inference_singleOutput.py:97-105), this compiles the whole horizon into
one ``lax.scan`` with donated on-device state, then scores the final frame
with the same lat-weighted RMSE / anomaly-ACC CSVs.

Usage:
  python -m pangu_tpu.cli.inference --horizon 168 \
      --pretrained /path/pangu_weather_24_torch.pth     # 7-day forecast
  python -m pangu_tpu.cli.inference --tiny --synthetic --horizon 48
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from pangu_tpu.cli import common
from pangu_tpu.engine import evaluate as E
from pangu_tpu.engine import rollout as R
from pangu_tpu.metrics.score import (weighted_acc_channels,
                                     weighted_rmse_channels)
from pangu_tpu.parallel import mesh as M
from pangu_tpu.parallel import sharding as S


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--horizon", type=int, default=None,
                   help="total forecast horizon in hours")
    p.add_argument("--models", type=str, default=None,
                   help="model hierarchy 'H=weights_path,...' e.g. "
                        "'24=w24,6=w6,3=w3,1=w1'; horizons are chained "
                        "greedily (largest first). Default: the single "
                        "--pretrained 24 h model")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--onnx-baseline", default=None, metavar="ONNX_PATH",
                   help="run the official .onnx through ONNX Runtime "
                        "instead of the TPU model (the reference's golden "
                        "engine, inference_singleOutput.py:30-41) — same "
                        "rollout, same CSVs, for side-by-side tables. "
                        "Requires onnxruntime (optional dependency)")
    p.add_argument("--ort-providers", default="cpu",
                   help="comma list for --onnx-baseline: cpu and/or cuda")
    p.add_argument("--token-space", action="store_true",
                   help="chain rollout steps in token space (fuse "
                        "recovery->embed between steps; identical math, "
                        "see engine/transition.py)")
    args = p.parse_args(argv)

    M.initialize_distributed()
    cfg = common.build_config(args)
    if args.horizon:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, horizon=args.horizon))
    hierarchy = None
    if args.models:
        hierarchy = {}
        for item in args.models.split(","):
            h, _, path = item.partition("=")
            hierarchy[int(h)] = path
        R.greedy_schedule(cfg.data.horizon, tuple(hierarchy))  # validate
    else:
        if cfg.data.horizon < 24 or cfg.data.horizon % 24 != 0:
            raise SystemExit("--horizon must be a positive multiple of 24 "
                             "(or pass a --models hierarchy)")

    out, logger = common.run_dirs(cfg, args.type_net)

    mcfg = cfg.mesh if cfg.mesh.size > 1 else M.auto_mesh_config(
        jax.device_count(),
        lon_windows=cfg.model.stage(1).num_lon_windows,
        max_heads=min(cfg.model.heads), batch=1)
    mesh = M.build_mesh(mcfg)

    constants = common.load_constants_device(cfg, args.synthetic)
    if args.onnx_baseline:
        from pangu_tpu.engine import onnx_baseline as OB
        prov = {"cpu": "CPUExecutionProvider",
                "cuda": "CUDAExecutionProvider"}
        session = OB.make_session(
            args.onnx_baseline,
            providers=[prov[p.strip()] for p in
                       args.ort_providers.split(",")])
        params = None
    elif hierarchy is not None:
        import argparse as _ap
        models = {}
        for h, path in hierarchy.items():
            sub = _ap.Namespace(**{**vars(args), "pretrained": path or None})
            m = common.load_params(sub, cfg)
            models[h] = jax.device_put(m, S.param_shardings(mesh, m))
        params = None
    else:
        params = common.load_params(args, cfg)
        params = jax.device_put(params, S.param_shardings(mesh, params))
    _, loaders = common.make_loaders(cfg, args.synthetic, mesh)

    names = [f"{e}_upper_{v}" for e in ("rmse", "acc") for v in "zqtuv"] \
        + ["rmse_surface", "acc_surface"]
    tables = {n: {} for n in names}

    with jax.set_mesh(mesh):
        if args.onnx_baseline:
            from pangu_tpu.engine import onnx_baseline as OB
            steps = cfg.data.horizon // 24

            def roll(p, u, s):
                out_u, out_s = OB.rollout(session, np.asarray(u)[0],
                                          np.asarray(s)[0], steps)
                return jnp.asarray(out_u)[None], jnp.asarray(out_s)[None]
        elif hierarchy is not None:
            hroll, schedule = R.make_hierarchical_rollout(
                cfg.model, constants, cfg.data.horizon, tuple(hierarchy))
            roll = lambda p, u, s: hroll(models, u, s)  # noqa: E731
            steps = len(schedule)
        else:
            steps = cfg.data.horizon // 24
            roll = R.make_rollout(cfg.model, constants, steps,
                                  token_space=args.token_space)

        @jax.jit
        def score(pu, ps, tu, ts):
            pu, ps, tu, ts = pu[0], ps[0], tu[0], ts[0]
            um, sm = constants["upper_mean"], constants["surface_mean"]
            res = {}
            for i, v in enumerate("zqtuv"):
                res[f"rmse_upper_{v}"] = weighted_rmse_channels(pu[i], tu[i])
                res[f"acc_upper_{v}"] = weighted_acc_channels(
                    pu[i] - um[i], tu[i] - um[i])
            res["rmse_surface"] = weighted_rmse_channels(ps, ts)
            res["acc_surface"] = weighted_acc_channels(ps - sm, ts - sm)
            return res

        for i, b in enumerate(loaders["test"].epoch(0)):
            if args.limit and i >= args.limit:
                break
            target_time = b["times"][1][0]
            logger.info(f"rollout {steps}x24h -> {target_time}")
            pu, ps = roll(params, jnp.asarray(b["upper"]),
                          jnp.asarray(b["surface"]))
            res = score(pu, ps, b["target_upper"], b["target_surface"])
            for n in names:
                tables[n][target_time] = np.asarray(res[n])

    E.save_error_scores(os.path.join(out, "csv"), tables,
                        levels=cfg.data.levels_hpa[:cfg.model.levels],
                        surface_vars=cfg.data.surface_variables)
    logger.info(f"wrote {os.path.join(out, 'csv')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
