"""Shared CLI plumbing: argument parsing, run-directory layout, constants
and parameter loading. Replaces the per-script boilerplate of the
reference entry points (/root/reference/finetune/finetune_fully.py:20-65,
inference/test_main.py:24-45)."""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pangu_tpu.config import Config, load_config
from pangu_tpu.data.constants import get_constants
from pangu_tpu.models import convert, pangu
from pangu_tpu.utils.logging import setup_logger


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--type_net", type=str, default="pangu_tpu",
                   help="run name (output subdirectory)")
    p.add_argument("--config", type=str, default=None,
                   help="JSON config file")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="a.b.c=v", help="config override (repeatable)")
    p.add_argument("--pretrained", type=str, default=None,
                   help="pretrained weights: .pth (torch), .onnx, or an "
                        "orbax params dir")
    p.add_argument("--keys_csv", type=str, default=None,
                   help="torch->onnx name CSV (for .onnx pretrained)")
    p.add_argument("--synthetic", action="store_true",
                   help="synthetic data/constants (smoke runs without ERA5)")
    p.add_argument("--tiny", action="store_true",
                   help="use the TINY model geometry (smoke runs)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 params/activations")
    p.add_argument("--pallas", action="store_true",
                   help="fused Pallas kernels (TPU only)")
    return p


def build_config(args) -> Config:
    cfg = load_config(args.config, args.overrides)
    if args.tiny:
        from pangu_tpu.config import TINY
        cfg = dataclasses.replace(cfg, model=TINY)
    if args.bf16:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           param_dtype="bfloat16",
                                           compute_dtype="bfloat16"))
    if getattr(args, "pallas", False):
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, attn_impl="pallas"))
    return cfg


def run_dirs(cfg: Config, type_net: str) -> Tuple[str, object]:
    """<out>/<type_net>/<horizon>/ with a file+stream logger, mirroring the
    reference layout (finetune_fully.py:51-63)."""
    out = os.path.join(cfg.output_path, type_net, str(cfg.data.horizon))
    os.makedirs(out, exist_ok=True)
    logger = setup_logger(f"{type_net}{cfg.data.horizon}",
                          os.path.join(out, f"{type_net}.log"))
    return out, logger


def load_constants_device(cfg: Config, synthetic: bool):
    aux = None if synthetic else cfg.data.resolved_aux_path()
    return {k: jnp.asarray(v)
            for k, v in get_constants(aux, cfg.model).items()}


def load_params(args, cfg: Config):
    """Pretrained params from .pth / .onnx / orbax dir, or fresh init."""
    dtype = cfg.model.param_dtype
    path = args.pretrained
    if path is None:
        return pangu.init_params(jax.random.PRNGKey(cfg.train.seed),
                                 cfg.model)
    if path.endswith(".pth"):
        import numpy as np
        params = convert.load_torch_checkpoint(path, cfg.model,
                                               dtype=np.dtype(dtype))
        return jax.tree.map(jnp.asarray, params)
    if path.endswith(".onnx"):
        import numpy as np
        if not args.keys_csv:
            raise SystemExit("--keys_csv is required with an .onnx file")
        params = convert.convert_onnx(path, args.keys_csv, cfg.model,
                                      dtype=np.dtype(dtype))
        return jax.tree.map(jnp.asarray, params)
    from pangu_tpu.utils.checkpoint import load_params as orbax_load
    template = jax.eval_shape(
        lambda: pangu.init_params(jax.random.PRNGKey(0), cfg.model))
    return orbax_load(path, template)


def make_loaders(cfg: Config, synthetic: bool, mesh=None):
    from pangu_tpu.data import era5
    shard_fn = era5.device_put_fn(mesh)
    dsets = {s: era5.make_dataset(cfg.data, s, cfg.model,
                                  synthetic=synthetic or None)
             for s in ("train", "val", "test")}
    loaders = {
        "train": era5.Loader(dsets["train"], cfg.train.batch_size,
                             shuffle=True, seed=cfg.train.seed,
                             num_workers=cfg.data.num_workers,
                             prefetch=cfg.data.prefetch, shard_fn=shard_fn,
                             process_index=jax.process_index(),
                             process_count=jax.process_count()),
        "val": era5.Loader(dsets["val"], 1, num_workers=cfg.data.num_workers,
                           shard_fn=shard_fn),
        "test": era5.Loader(dsets["test"], cfg.train.eval_batch_size,
                            num_workers=cfg.data.num_workers,
                            shard_fn=shard_fn, drop_last=False),
    }
    return dsets, loaders
