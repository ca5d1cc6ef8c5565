"""Evaluation harness: per-timestamp lat-weighted RMSE/ACC sweep + CSVs.

Replaces the reference test() loop (/root/reference/models/pangu_sample.py:
179-276) and its CSV writer (era5_data/utils.py:169-194). The whole scoring
block — forward, de-normalisation, per-variable/per-level RMSE, anomaly ACC
— is one jitted program per sample; only the final scalar table comes back
to the host. Emits the same 12 CSVs ({rmse,acc}_upper_{z,q,t,u,v},
{rmse,acc}_surface) with timestamps as the index so results are directly
comparable with the reference's published tables (fig/tab1.png, tab2.png).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pangu_tpu.config import Config, ModelConfig
from pangu_tpu.data.constants import denorm_data
from pangu_tpu.metrics.score import (weighted_acc_channels,
                                     weighted_rmse_channels)
from pangu_tpu.models import pangu
from pangu_tpu.utils import viz


def make_score_step(cfg: ModelConfig, constants,
                    forward_fn: Callable = pangu.forward) -> Callable:
    """(params, batch) -> dict of per-variable score vectors, fully on
    device. Matches models/pangu_sample.py:229-270: RMSE on physical
    fields, ACC on anomalies (climatological mean subtracted)."""

    @jax.jit
    def score_step(params, upper, surface, target_upper, target_surface,
                   constants):
        out_u, out_s = forward_fn(params, upper, surface, constants, cfg,
                                  deterministic=True)
        out_u, out_s = denorm_data(out_u, out_s, constants)

        um = constants["upper_mean"]
        sm = constants["surface_mean"]

        def one_sample(pu, ps, tu, ts):
            # per-sample scoring (matches the reference's batch-1 loop,
            # models/pangu_sample.py:229-270); vmapped over the batch so
            # eval batch > 1 yields per-sample rows
            scores = {}
            names = ("z", "q", "t", "u", "v")[:cfg.upper_vars]
            for i, var in enumerate(names):
                scores[f"rmse_upper_{var}"] = weighted_rmse_channels(
                    pu[i], tu[i])
            scores["rmse_surface"] = weighted_rmse_channels(ps, ts)
            pu_a, tu_a = pu - um, tu - um
            ps_a, ts_a = ps - sm, ts - sm
            for i, var in enumerate(names):
                scores[f"acc_upper_{var}"] = weighted_acc_channels(
                    pu_a[i], tu_a[i])
            scores["acc_surface"] = weighted_acc_channels(ps_a, ts_a)
            return scores

        scores = jax.vmap(one_sample)(out_u, out_s, target_upper,
                                      target_surface)
        return scores, (out_u, out_s)

    # bind constants as a per-call jit argument (closures would inline the
    # large constant fields into the program as literals)
    return lambda params, u, s, tu, ts: score_step(params, u, s, tu, ts,
                                                   constants)


def save_error_scores(csv_path: str, tables: Dict[str, Dict[str, np.ndarray]],
                      levels: Iterable[str], surface_vars: Iterable[str]):
    """Write the 12 {rmse,acc}_* CSVs (era5_data/utils.py:169-194):
    rows = target timestamps, columns = pressure levels (upper) or surface
    variable names."""
    import pandas as pd
    os.makedirs(csv_path, exist_ok=True)
    for name, table in tables.items():
        cols = list(surface_vars) if name.endswith("surface") else list(levels)
        df = pd.DataFrame.from_dict(table, orient="index", columns=cols)
        df.to_csv(os.path.join(csv_path, f"{name}.csv"))


def evaluate(params, batches: Iterable, cfg: Config, constants, *,
             res_path: str,
             forward_fn: Callable = pangu.forward,
             visualize: bool = True,
             logger=None) -> Dict[str, Dict[str, np.ndarray]]:
    """Full test sweep. ``batches`` yields dicts with upper/surface/
    target_upper/target_surface (+ "times": (input_str, target_str)).
    Returns {score_name: {target_time: vector}} and writes CSVs/PNGs."""
    score_step = make_score_step(cfg.model, constants, forward_fn)

    names = ([f"{e}_upper_{v}" for e in ("rmse", "acc")
              for v in ("z", "q", "t", "u", "v")[:cfg.model.upper_vars]]
             + ["rmse_surface", "acc_surface"])
    tables: Dict[str, Dict[str, np.ndarray]] = {n: {} for n in names}

    png_path = os.path.join(res_path, "png")
    traced_b: Optional[int] = None   # leading shape score_step compiled for
    for i, batch in enumerate(batches):
        B = int(np.asarray(batch["surface"]).shape[0])
        if traced_b is None:
            traced_b = B
        if B < traced_b:
            # final partial batch (drop_last=False): pad by repeating the
            # last sample up to the traced batch size instead of retracing
            # + recompiling the whole forward for one batch (minutes at
            # full geometry); padded rows are sliced away below via B
            pad = traced_b - B

            def _pad(a):
                a = np.asarray(a)
                return np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])

            fields = tuple(_pad(batch[k]) for k in
                           ("upper", "surface", "target_upper",
                            "target_surface"))
        else:
            fields = (batch["upper"], batch["surface"],
                      batch["target_upper"], batch["target_surface"])
        scores, (out_u, out_s) = score_step(params, *fields)
        target_time = batch.get("times", (str(i), str(i)))[1]
        # per-sample CSV rows: "times" may carry one timestamp per sample
        # (batch > 1) or a single string (batch 1, the reference setup)
        if isinstance(target_time, (tuple, list)):
            row_keys = [str(t) for t in target_time]
        else:
            row_keys = [str(target_time)]
        if len(row_keys) != B:
            raise ValueError(
                f"batch {i} carries {B} samples but {len(row_keys)} target "
                f"timestamps — refusing to synthesize CSV row keys (rows "
                f"would be silently mislabelled)")
        if logger is not None:
            logger.info(f"predict on {i} -> {row_keys[0]}")
        for name in names:
            arr = np.asarray(scores[name])          # (B, ...) per sample
            for b, key in enumerate(row_keys):
                tables[name][key] = arr[b]
        target_time = row_keys[0]

        if visualize:
            viz.mkdirs(png_path)
            viz.plot_upper(np.asarray(out_u)[0],
                           np.asarray(batch["target_upper"])[0],
                           np.asarray(batch["upper"])[0],
                           var="t", level_idx=min(2, cfg.model.levels - 1),
                           step=target_time, path=png_path)
            viz.plot_surface(np.asarray(out_s)[0],
                             np.asarray(batch["target_surface"])[0],
                             np.asarray(batch["surface"])[0],
                             var="u10", step=target_time, path=png_path)

    save_error_scores(os.path.join(res_path, "csv"), tables,
                      levels=cfg.data.levels_hpa[:cfg.model.levels],
                      surface_vars=cfg.data.surface_variables)
    return tables
