"""Profiling harness: time and trace the forward / train step.

The reference has no profiling story (SURVEY.md §5.1 — wall-clock stamps
that are never printed). Here: per-step wall-clock statistics plus an
optional jax.profiler trace viewable in TensorBoard / Perfetto.

Usage:
  python -m pangu_tpu.cli.profile_step --bf16 --pallas          # forward
  python -m pangu_tpu.cli.profile_step --train --trace /tmp/tb  # train step
  python -m pangu_tpu.cli.profile_step --tiny                   # smoke
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np

from pangu_tpu.utils.logging import StepTimer, profile_trace


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--pallas", action="store_true")
    p.add_argument("--fast-math", action="store_true")
    p.add_argument("--train", action="store_true",
                   help="profile the train step (fwd+bwd+update)")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--trace", type=str, default=None,
                   help="write a jax.profiler trace to this directory")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pangu_tpu.config import PANGU_24, TINY, TrainConfig
    from pangu_tpu.data.constants import synthetic_constants
    from pangu_tpu.engine import train as T
    from pangu_tpu.models import pangu

    cfg = TINY if args.tiny else PANGU_24
    cfg = dataclasses.replace(
        cfg,
        param_dtype="bfloat16" if args.bf16 else cfg.param_dtype,
        compute_dtype="bfloat16" if args.bf16 else cfg.compute_dtype,
        attn_impl="pallas" if args.pallas else cfg.attn_impl,
        fast_math=args.fast_math,
        remat=args.train)

    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    consts = {k: jnp.asarray(v) for k, v in synthetic_constants(cfg).items()}
    rng = np.random.default_rng(0)
    batch = {
        "upper": jnp.asarray(rng.normal(
            size=(args.batch, cfg.upper_vars, cfg.levels, cfg.lat, cfg.lon)
        ).astype(np.float32)),
        "surface": jnp.asarray(rng.normal(
            size=(args.batch, cfg.surface_vars, cfg.lat, cfg.lon)
        ).astype(np.float32)),
    }
    print(pangu.summarize(params, cfg))

    if args.train:
        tcfg = TrainConfig()
        batch["target_upper"] = batch["upper"]
        batch["target_surface"] = batch["surface"]
        tx = T.make_optimizer(tcfg, steps_per_epoch=100)
        state = T.create_train_state(params, tx)
        step = T.make_train_step(cfg, tcfg, consts, tx, donate=True)

        def run():
            nonlocal state
            state, m = step(state, batch, jax.random.PRNGKey(1))
            return m["loss"]
    else:
        # constants as a jit argument, not a closure (avoids inlining the
        # large constant fields into the program)
        fwd = jax.jit(lambda p, u, s, c: pangu.forward(p, u, s, c, cfg))

        def run():
            return fwd(params, batch["upper"], batch["surface"], consts)

    jax.block_until_ready(run())   # compile
    timer = StepTimer()
    with profile_trace(args.trace):
        for _ in range(args.steps):
            timer.start()
            out = run()
            jax.block_until_ready(out)
            timer.stop()
    kind = "train" if args.train else "forward"
    print(f"{kind} step: mean {timer.mean_ms:.1f} ms over {args.steps} steps "
          f"(min {1e3*min(timer.times):.1f}, max {1e3*max(timer.times):.1f})")
    if args.trace:
        print(f"trace written to {args.trace}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
