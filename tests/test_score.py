"""Scoring parity: jitted lat-weighted RMSE/ACC vs literal numpy
translations of the reference TorchScript kernels
(/root/reference/era5_data/score.py:83-135)."""

import numpy as np

from pangu_tpu.metrics import score
import pytest

# sub-second unit tests: the <3-min driver smoke tier (pytest -m quick)
pytestmark = pytest.mark.quick


RNG = np.random.default_rng(0)


def _np_lat(j, num_lat):
    return 90.0 - j * 180.0 / (num_lat - 1)


def _np_weight(num_lat):
    j = np.arange(num_lat, dtype=np.float32)
    cos = np.cos(3.1416 / 180.0 * _np_lat(j, num_lat))
    return num_lat * cos / cos.sum()


def _np_rmse_channels(pred, target):
    w = _np_weight(pred.shape[-2])
    shape = (1, -1, 1) if pred.ndim == 3 else (1, 1, -1, 1)
    w = w.reshape(shape)
    return np.sqrt(np.mean(w * (pred - target) ** 2, axis=(-1, -2)))


def _np_acc_channels(pred, target):
    w = _np_weight(pred.shape[-2])
    shape = (1, -1, 1) if pred.ndim == 3 else (1, 1, -1, 1)
    w = w.reshape(shape)
    num = np.sum(w * pred * target, axis=(-1, -2))
    den = np.sqrt(np.sum(w * pred * pred, axis=(-1, -2))
                  * np.sum(w * target * target, axis=(-1, -2)))
    return num / den


def test_rmse_3d_and_4d():
    for shape in [(13, 33, 64), (1, 4, 33, 64)]:
        pred = RNG.normal(size=shape).astype(np.float32)
        target = RNG.normal(size=shape).astype(np.float32)
        got = np.asarray(score.weighted_rmse_channels(pred, target))
        np.testing.assert_allclose(got, _np_rmse_channels(pred, target),
                                   rtol=1e-5)


def test_acc():
    for shape in [(13, 33, 64), (1, 4, 33, 64)]:
        pred = RNG.normal(size=shape).astype(np.float32)
        target = pred + 0.1 * RNG.normal(size=shape).astype(np.float32)
        got = np.asarray(score.weighted_acc_channels(pred, target))
        np.testing.assert_allclose(got, _np_acc_channels(pred, target),
                                   rtol=1e-4)


def test_perfect_prediction():
    x = RNG.normal(size=(5, 33, 64)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(score.weighted_rmse_channels(x, x)), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(score.weighted_acc_channels(x, x)), 1.0, atol=1e-5)


def test_weights_normalised():
    w = np.asarray(score.latitude_weights(721))
    np.testing.assert_allclose(w.mean(), 1.0, rtol=1e-6)
    assert w[360] == w.max()          # equator heaviest
    assert w[0] < 1e-4                # poles ~ 0


def test_unlog_tp():
    x = np.asarray([0.0, 1.0], dtype=np.float32)
    got = np.asarray(score.unlog_tp(x))
    np.testing.assert_allclose(got, 1e-5 * (np.exp(x) - 1.0), rtol=1e-6)


def test_top_quantiles_error_matches_torch():
    """Golden vs the reference TorchScript kernel
    (era5_data/score.py:153-162): result is the mean over the quantile
    axis, shape (n, c)."""
    import torch

    pred = RNG.normal(size=(2, 3, 8, 16)).astype(np.float32)
    target = RNG.normal(size=(2, 3, 8, 16)).astype(np.float32)

    n, c, h, w = pred.shape
    qtile = 1.0 - torch.logspace(-3, -0.1, steps=100)
    p_tar = torch.quantile(torch.from_numpy(target).view(n, c, h * w),
                           q=qtile, dim=-1)
    p_pred = torch.quantile(torch.from_numpy(pred).view(n, c, h * w),
                            q=qtile, dim=-1)
    want = torch.mean(p_pred - p_tar, dim=0).numpy()

    got = np.asarray(score.top_quantiles_error(pred, target))
    assert got.shape == (n, c)
    np.testing.assert_allclose(got, want, atol=1e-5)
