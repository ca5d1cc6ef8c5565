"""Single-step evaluation sweep (rebuilt-model eval).

Replaces /root/reference/inference/test_main.py (and test_lora.py when
pointed at a merged LoRA export): loads weights, sweeps the test window,
writes the 12 RMSE/ACC CSVs + 4-panel PNGs.

Usage:
  python -m pangu_tpu.cli.evaluate --type_net eval24 \
      --pretrained /path/pangu_weather_24_torch.pth
  python -m pangu_tpu.cli.evaluate --tiny --synthetic
"""

from __future__ import annotations

import os

import jax

from pangu_tpu.cli import common
from pangu_tpu.engine import evaluate as E
from pangu_tpu.parallel import mesh as M
from pangu_tpu.parallel import sharding as S


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--no-viz", action="store_true")
    p.add_argument("--limit", type=int, default=0,
                   help="score at most N samples (0 = all)")
    args = p.parse_args(argv)

    M.initialize_distributed()
    cfg = common.build_config(args)
    out, logger = common.run_dirs(cfg, args.type_net)

    mcfg = cfg.mesh if cfg.mesh.size > 1 else M.auto_mesh_config(
        jax.device_count(),
        lon_windows=cfg.model.stage(1).num_lon_windows,
        max_heads=min(cfg.model.heads), batch=1)
    mesh = M.build_mesh(mcfg)

    constants = common.load_constants_device(cfg, args.synthetic)
    params = common.load_params(args, cfg)
    params = jax.device_put(params, S.param_shardings(mesh, params))

    _, loaders = common.make_loaders(cfg, args.synthetic, mesh)

    def batches():
        for i, b in enumerate(loaders["test"].epoch(0)):
            if args.limit and i >= args.limit:
                break
            starts, targets = b["times"]
            # always per-sample target lists so CSV row keys stay in one
            # format across the sweep (a trailing 1-sample batch under
            # drop_last=False must not flip representation mid-run)
            b["times"] = (list(starts), list(targets))
            yield b

    with jax.set_mesh(mesh):
        tables = E.evaluate(params, batches(), cfg, constants,
                            res_path=out, visualize=not args.no_viz,
                            logger=logger)
    n = len(next(iter(tables.values())))
    logger.info(f"scored {n} samples -> {os.path.join(out, 'csv')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
