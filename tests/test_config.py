"""Geometry invariants of the config against the reference's recorded shapes
(SURVEY.md §2.1; /root/reference/models/layers.py)."""

import numpy as np
import pytest

from pangu_tpu.config import PANGU_24, TINY, ModelConfig, load_config

# sub-second unit tests: the <3-min driver smoke tier (pytest -m quick)
pytestmark = pytest.mark.quick


def test_full_geometry():
    cfg = PANGU_24
    assert cfg.lat_padded == 724          # layers.py:27 (pad H by 3)
    assert cfg.levels_padded == 14        # layers.py:36 (pad Z by 1)
    assert cfg.z_tokens == 8
    assert cfg.h_tokens == 181
    assert cfg.w_tokens == 360
    assert cfg.upper_patch_features == 192   # 6*2*4*4, layers.py:17
    assert cfg.surface_patch_features == 112  # 7*4*4, layers.py:18


def test_stage_geometry():
    cfg = PANGU_24
    s0 = cfg.stage(0)
    assert (s0.z, s0.h, s0.w) == (8, 181, 360)
    assert s0.h_padded == 186             # layers.py:148
    assert s0.num_window_types == 124     # layers.py:151
    assert s0.num_lon_windows == 30
    assert s0.window_tokens == 144
    assert s0.tokens == 521280            # pangu_model.py:55

    s1 = cfg.stage(1)
    assert (s1.z, s1.h, s1.w) == (8, 91, 180)
    assert s1.h_padded == 96
    assert s1.num_window_types == 64      # layers.py:151
    assert s1.num_lon_windows == 15
    assert s1.tokens == 131040            # layers.py:457


def test_drop_path_schedule():
    # linspace(0, 0.2, 16) like pangu_model.py:19
    rates = PANGU_24.drop_path_rates()
    assert len(rates) == 16
    np.testing.assert_allclose(rates, np.linspace(0.0, 0.2, 16), atol=1e-9)


def test_tiny_keeps_structural_quirks():
    cfg = TINY
    assert cfg.lat_padded > cfg.lat           # nonzero lat padding
    assert cfg.levels_padded > cfg.levels     # nonzero Z padding
    s0, s1 = cfg.stage(0), cfg.stage(1)
    assert s0.h_padded > s0.h                 # window padding on lat
    assert s1.h_padded > s1.h
    assert s0.num_lon_windows >= 2            # shardable over lon
    assert s1.num_lon_windows >= 2
    assert s0.h % 2 == 1                      # odd half-res latitude


def test_invalid_geometry_rejected():
    with pytest.raises(ValueError):
        ModelConfig(lon=1441)


def test_overrides():
    cfg = load_config(overrides=["train.lr=1e-4", "model.levels=7",
                                 "mesh.dp=2"])
    assert cfg.train.lr == 1e-4
    assert cfg.model.levels == 7
    assert cfg.mesh.dp == 2
    with pytest.raises(KeyError):
        load_config(overrides=["model.bogus=1"])
