"""LoRA (parameter-efficient) fine-tuning entry point.

Replaces /root/reference/finetune/lora_tune.py: attaches r=16/alpha=16
LoRA factors to every linear site, freezes the base via a compiled
multi-transform mask (the peft wrapper's role), trains with the standard
loop, prints the updated-vs-frozen audit (lora_tune.py:158-175), exports
both the adapter and a merged-weight snapshot, then evaluates.

Usage:
  python -m pangu_tpu.cli.lora_tune --type_net loratuner_normout \
      --pretrained /path/pangu_weather_24_torch.pth
  python -m pangu_tpu.cli.lora_tune --tiny --synthetic --smoke
"""

from __future__ import annotations

import dataclasses
import os

import jax

from pangu_tpu.cli import common
from pangu_tpu.engine import evaluate as E
from pangu_tpu.engine import train as T
from pangu_tpu.models import lora
from pangu_tpu.parallel import mesh as M
from pangu_tpu.parallel import sharding as S
from pangu_tpu.utils.checkpoint import Checkpointer, save_params
from pangu_tpu.utils.logging import get_writer


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--rank", type=int, default=None,
                   help="LoRA rank (default from config)")
    args = p.parse_args(argv)

    M.initialize_distributed()
    cfg = common.build_config(args)
    if args.smoke:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, epochs=2))
    rank = args.rank or cfg.train.lora_rank

    out, logger = common.run_dirs(cfg, args.type_net)
    writer = get_writer(os.path.join(out, "writer"))

    mcfg = cfg.mesh if cfg.mesh.size > 1 else M.auto_mesh_config(
        jax.device_count(),
        lon_windows=cfg.model.stage(1).num_lon_windows,
        max_heads=min(cfg.model.heads), batch=cfg.train.batch_size)
    mesh = M.build_mesh(mcfg)

    constants = common.load_constants_device(cfg, args.synthetic)
    base = common.load_params(args, cfg)
    import numpy as np
    params = lora.init_lora(jax.random.PRNGKey(cfg.train.seed), base,
                            rank=rank, alpha=cfg.train.lora_alpha,
                            dropout=cfg.train.lora_dropout,
                            dropout_mode=cfg.train.lora_dropout_mode)
    # host snapshot for the post-train audit (device buffers get donated)
    init_snapshot = jax.tree.map(np.asarray, params)
    params = jax.device_put(params, S.param_shardings(mesh, params))
    logger.info(f"LoRA attached: rank={rank} alpha={cfg.train.lora_alpha} "
                f"dropout={cfg.train.lora_dropout} "
                f"mode={cfg.train.lora_dropout_mode}")
    # Say which compute path the step will take — the cost difference is
    # large and depends on lora_dropout/mode (pangu.forward:522-541).
    if cfg.model.attn_impl == "pallas" and cfg.model.lora_fused:
        if (cfg.train.lora_dropout > 0
                and cfg.train.lora_dropout_mode == "element"):
            logger.warning(
                "lora_dropout=%.3g mode=element (peft-exact per-token "
                "masks) keeps TRAINING on the UNMERGED XLA path — the "
                "token-varying mask has no merged-weight form, so the "
                "fused kernels cannot run it: expect ~3-4x the full-tune "
                "step cost. Options: --set train.lora_dropout_mode="
                "feature (token-constant feature mask, folds into the "
                "per-step merge EXACTLY, keeps the fused fast path at "
                "~1.0x full-tune) or --set train.lora_dropout=0. "
                "Evaluation always uses the merged fast path.",
                cfg.train.lora_dropout)
        elif cfg.train.lora_dropout > 0:
            logger.info(
                "lora_dropout=%.3g mode=feature: the per-step feature "
                "mask folds into the merge exactly — training runs "
                "MERGED through the fused kernels (~1.0x the full-tune "
                "step)", cfg.train.lora_dropout)
        else:
            logger.info(
                "lora_dropout=0: training runs MERGED through the fused "
                "kernels (~1.0x the full-tune step)")

    _, loaders = common.make_loaders(cfg, args.synthetic, mesh)
    tx = T.make_optimizer(cfg.train, max(len(loaders["train"]), 1),
                          trainable_mask=lora.trainable_mask(params))
    state = T.create_train_state(params, tx)
    ckpt = Checkpointer(out)

    with jax.set_mesh(mesh):
        train_step = T.make_train_step(cfg.model, cfg.train, constants, tx,
                                       donate=True)
        eval_step = T.make_eval_step(cfg.model, cfg.train, constants)

        def limit(it, n):
            for i, b in enumerate(it):
                if args.smoke and i >= n:
                    break
                b.pop("times", None)
                yield b

        state, history = T.train_loop(
            cfg, state, train_step, eval_step,
            lambda e: limit(loaders["train"].epoch(e), 2),
            lambda: limit(loaders["val"].epoch(0), 2),
            rng=jax.random.PRNGKey(cfg.train.seed),
            checkpointer=ckpt, logger=logger, writer=writer)

        # updated-vs-frozen audit (the reference's post-train sanity check)
        report = lora.audit(init_snapshot, state.params)
        for name in report["updated"][:20]:
            logger.info(f"parameter {name} | updated")
        logger.info(f"updated={len(report['updated'])} "
                    f"frozen={len(report['frozen'])}")

        # export adapter + merged weights
        save_params(os.path.join(out, "models", "lora_adapter"),
                    state.params)
        merged = lora.merge_lora(state.params)
        save_params(os.path.join(out, "models", "merged"), merged)

        E.evaluate(merged, loaders["test"].epoch(0), cfg, constants,
                   res_path=os.path.join(out, "test"),
                   visualize=not args.smoke, logger=logger)
    ckpt.close()
    logger.info("done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
