"""Visualisation: 4-panel input/gt/pred/bias maps per variable.

Replaces /root/reference/era5_data/utils.py:63-120 (same panel layout and
file naming so downstream tooling keyed on the reference's PNG names keeps
working)."""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _four_panel(fields, titles, fname):
    fig = plt.figure(figsize=(16, 2))
    order = [3, 2, 1, 4]  # reference panel order: input, gt, pred, bias
    for data, title, slot in zip(fields, titles, order):
        ax = fig.add_subplot(1, 4, slot)
        im = ax.imshow(data, cmap="RdBu")
        plt.colorbar(im, ax=ax, fraction=0.05, pad=0.05)
        ax.title.set_text(title)
    plt.tight_layout()
    plt.savefig(fname=fname)
    plt.close(fig)


def plot_upper(pred, target, inp, var: str, level_idx: int, step, path: str,
               variables: Sequence[str] = ("z", "q", "t", "u", "v")):
    """pred/target/inp: (vars, levels, lat, lon)."""
    v = list(variables).index(var)
    _four_panel(
        [pred[v, level_idx], target[v, level_idx], inp[v, level_idx],
         pred[v, level_idx] - target[v, level_idx]],
        ["pred", "gt", "input", "bias"],
        os.path.join(path, f"{step}_{var}_Z{level_idx}"))


def plot_surface(pred, target, inp, var: str, step, path: str,
                 variables: Sequence[str] = ("msl", "u10", "v10", "t2m")):
    """pred/target/inp: (vars, lat, lon)."""
    v = list(variables).index(var)
    _four_panel(
        [pred[v], target[v], inp[v], pred[v] - target[v]],
        ["pred", "gt", "input", "bias"],
        os.path.join(path, f"{step}_{var}"))


def mkdirs(paths):
    """era5_data/utils.py:123-133."""
    if isinstance(paths, str):
        paths = [paths]
    for p in paths:
        os.makedirs(p, exist_ok=True)
