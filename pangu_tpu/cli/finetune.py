"""Full fine-tuning entry point.

Replaces /root/reference/finetune/finetune_fully.py: loads pretrained
weights, fine-tunes every parameter with Adam + MultiStep LR over the
(dp, sp, tp) mesh, validates with early stopping, then evaluates the best
model on the test window. Unlike the reference, gradient synchronisation
over data-parallel devices actually happens (compiled psum; SURVEY.md §2.4
documents the reference's missing DDP wrap).

Usage:
  python -m pangu_tpu.cli.finetune --type_net finetune_fully \
      --pretrained /path/pangu_weather_24_torch.pth
  python -m pangu_tpu.cli.finetune --tiny --synthetic --smoke   # smoke run
"""

from __future__ import annotations

import dataclasses
import os

import jax

from pangu_tpu.cli import common
from pangu_tpu.config import MeshConfig
from pangu_tpu.engine import evaluate as E
from pangu_tpu.engine import train as T
from pangu_tpu.parallel import mesh as M
from pangu_tpu.parallel import sharding as S
from pangu_tpu.utils.checkpoint import Checkpointer
from pangu_tpu.utils.logging import get_writer


def main(argv=None):
    p = common.base_parser(__doc__)
    p.add_argument("--smoke", action="store_true",
                   help="2 epochs x 2 steps for pipeline validation")
    args = p.parse_args(argv)

    M.initialize_distributed()
    cfg = common.build_config(args)
    if args.smoke:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, epochs=2))

    out, logger = common.run_dirs(cfg, args.type_net)
    writer = get_writer(os.path.join(out, "writer"))

    mcfg = cfg.mesh if cfg.mesh.size > 1 else M.auto_mesh_config(
        jax.device_count(),
        lon_windows=cfg.model.stage(1).num_lon_windows,
        max_heads=min(cfg.model.heads), batch=cfg.train.batch_size)
    mesh = M.build_mesh(mcfg)
    logger.info(f"devices={jax.device_count()} mesh={mcfg}")

    constants = common.load_constants_device(cfg, args.synthetic)
    params = common.load_params(args, cfg)
    params = jax.device_put(params, S.param_shardings(mesh, params))
    logger.info(f"params loaded ({'pretrained' if args.pretrained else 'init'})")

    _, loaders = common.make_loaders(cfg, args.synthetic, mesh)
    steps_per_epoch = max(len(loaders["train"]), 1)
    tx = T.make_optimizer(cfg.train, steps_per_epoch)
    state = T.create_train_state(params, tx)

    ckpt = Checkpointer(out)
    state, start_epoch, start_batch = _maybe_resume(ckpt, state, logger)

    with jax.set_mesh(mesh):
        train_step = T.make_train_step(cfg.model, cfg.train, constants, tx,
                                       donate=True)
        eval_step = T.make_eval_step(cfg.model, cfg.train, constants)

        def train_batches(epoch):
            it = loaders["train"].epoch(epoch)
            for i, b in enumerate(it):
                if args.smoke and i >= 2:
                    break
                b.pop("times", None)
                yield b

        def val_batches():
            for i, b in enumerate(loaders["val"].epoch(0)):
                if args.smoke and i >= 2:
                    break
                b.pop("times", None)
                yield b

        state, history = T.train_loop(
            cfg, state, train_step, eval_step, train_batches, val_batches,
            rng=jax.random.PRNGKey(cfg.train.seed),
            start_epoch=start_epoch, start_batch=start_batch,
            checkpointer=ckpt, logger=logger, writer=writer)

        logger.info("Begin testing...")
        test_out = os.path.join(out, "test")
        E.evaluate(state.params, loaders["test"].epoch(0), cfg, constants,
                   res_path=test_out, visualize=not args.smoke,
                   logger=logger)
    ckpt.close()
    logger.info(f"done; best val loss {history['best_val_loss']:.6f}")
    return 0


def _maybe_resume(ckpt: Checkpointer, state, logger):
    """Resume at the exact (epoch, batch) the latest checkpoint recorded —
    step-granular, unlike the reference's epoch-only resume
    (finetune/lora_tune.py:143-148)."""
    template = jax.tree.map(lambda x: x, state)
    restored, step, progress = ckpt.restore_latest(template)
    if step is None:
        return state, 1, 0
    logger.info(f"resumed from checkpoint at step {step} "
                f"(epoch {progress['epoch']}, batch {progress['batch']})")
    return restored, progress["epoch"], progress["batch"]


if __name__ == "__main__":
    raise SystemExit(main())
