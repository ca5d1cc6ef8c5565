"""Latitude-weighted RMSE / ACC scoring, jitted for on-device evaluation.

Replaces /root/reference/era5_data/score.py (TorchScript kernels) with
jax.jit functions. Numerics are matched exactly, including the reference's
use of 3.1416 (not math.pi) in the latitude weighting factor
(score.py:89,98) so scores are comparable digit-for-digit with the
published tables (fig/tab1.png, fig/tab2.png).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_REF_PI = 3.1416  # the reference's constant (era5_data/score.py:89)


def _lat_deg(num_lat: int):
    j = jnp.arange(num_lat, dtype=jnp.float32)
    return 90.0 - j * 180.0 / (num_lat - 1)


def latitude_weights(num_lat: int):
    """w_j = num_lat * cos(lat_j) / sum(cos)  (era5_data/score.py:88-89)."""
    cos = jnp.cos(_REF_PI / 180.0 * _lat_deg(num_lat))
    return num_lat * cos / jnp.sum(cos)


@functools.partial(jax.jit, static_argnames=())
def weighted_rmse_channels(pred, target):
    """Latitude-weighted RMSE per leading channel.

    pred/target: (..., C, lat, lon) — matches
    weighted_rmse_torch_channels for both its 3-D (per-level upper) and 4-D
    call shapes (era5_data/score.py:92-105).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    w = latitude_weights(pred.shape[-2])[..., :, None]
    return jnp.sqrt(jnp.mean(w * (pred - target) ** 2, axis=(-1, -2)))


@functools.partial(jax.jit, static_argnames=())
def weighted_acc_channels(pred, target):
    """Latitude-weighted anomaly correlation per channel; expects *anomaly*
    inputs (climatological mean subtracted by the caller, exactly like
    models/pangu_sample.py:252-256; era5_data/score.py:123-135)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    w = latitude_weights(pred.shape[-2])[..., :, None]
    num = jnp.sum(w * pred * target, axis=(-1, -2))
    den = jnp.sqrt(jnp.sum(w * pred * pred, axis=(-1, -2))
                   * jnp.sum(w * target * target, axis=(-1, -2)))
    return num / den


@functools.partial(jax.jit, static_argnames=())
def unweighted_acc_channels(pred, target):
    """era5_data/score.py:143-146."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    num = jnp.sum(pred * target, axis=(-1, -2))
    den = jnp.sqrt(jnp.sum(pred * pred, axis=(-1, -2))
                   * jnp.sum(target * target, axis=(-1, -2)))
    return num / den


def unlog_tp(x, eps: float = 1e-5):
    """Inverse log-transform for total precipitation (era5_data/score.py:5-11)."""
    return eps * (jnp.exp(x) - 1.0)


def top_quantiles_error(pred, target, qs: int = 100, qlim: int = 3,
                        qcut: float = 0.1):
    """Mean error over the top quantiles (era5_data/score.py:153-162)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    n, c = pred.shape[0], pred.shape[1]
    qtile = 1.0 - jnp.logspace(-qlim, -qcut, num=qs)
    p_tar = jnp.quantile(target.reshape(n, c, -1), qtile, axis=-1)
    p_pred = jnp.quantile(pred.reshape(n, c, -1), qtile, axis=-1)
    # mean over the quantile axis (axis 0 of the (qs, n, c) stack) ->
    # (n, c), matching top_quantiles_error_torch (era5_data/score.py:162)
    return jnp.mean(p_pred - p_tar, axis=0)


@functools.partial(jax.jit, static_argnames=())
def weighted_acc_masked_channels(pred, target, mask):
    """Masked latitude-weighted ACC (era5_data/score.py:113-120): `mask` is
    a {0,1} field broadcastable against (..., lat, lon)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    w = latitude_weights(pred.shape[-2])[..., :, None]
    num = jnp.sum(mask * w * pred * target, axis=(-1, -2))
    den = jnp.sqrt(jnp.sum(mask * w * pred * pred, axis=(-1, -2))
                   * jnp.sum(mask * w * target * target, axis=(-1, -2)))
    return num / den
