"""Data-pipeline tests: date math, level-flip stacking, the built-in h5py
netCDF reader (CF packing + expver + time decode) against files we
synthesise on the fly, loader batching/sharding/prefetch, and
normalisation roundtrips."""

import os
from datetime import datetime

import numpy as np
import pytest

from pangu_tpu.config import DataConfig, ModelConfig, TINY
from pangu_tpu.data import era5
from pangu_tpu.data.constants import (denorm_data, norm_data,
                                      synthetic_constants)

# sub-second unit tests: the <3-min driver smoke tier (pytest -m quick)
pytestmark = pytest.mark.quick


def test_date_keys_and_length():
    dcfg = DataConfig(train_start="20150101", train_end="20150110",
                      train_freq="12h", horizon=24)
    ds = era5.SyntheticEra5Dataset(dcfg, "train", mcfg=TINY)
    assert len(ds.keys) == 19                  # 12-hourly inclusive range
    # horizon 24h at 12h stride drops 2 trailing keys (utils_data.py:96)
    assert len(ds) == 17
    s = ds[0]
    assert s.times == ("2015010100", "2015010200")


def test_stack_state_flips_levels():
    lat, lon, L = 4, 6, 3
    upper_fields = {v: np.stack([np.full((lat, lon), 10 * i + l,
                                         dtype=np.float32)
                                 for l in range(L)])
                    for i, v in enumerate(era5.UPPER_VARS)}
    surface_fields = {v: np.full((lat, lon), float(i), np.float32)
                      for i, v in enumerate(era5.SURFACE_VARS)}
    upper, surface = era5.stack_state(upper_fields, surface_fields)
    assert upper.shape == (5, L, lat, lon)
    # level axis reversed: index 0 must be the *last* file level
    assert upper[1, 0, 0, 0] == 12.0
    assert upper[1, -1, 0, 0] == 10.0
    assert surface[2, 0, 0] == 2.0


def _write_fake_nc(path, varnames, shape, when: datetime, *, packed: bool,
                   expver: bool, rng):
    """Create a netCDF4-flavoured HDF5 file like ERA5 downloads."""
    import h5py
    truth = {}
    hours = int((np.datetime64(when, "s")
                 - np.datetime64("1900-01-01", "s")) / np.timedelta64(1, "h"))
    with h5py.File(path, "w") as f:
        t = f.create_dataset("time", data=np.asarray([hours - 6, hours],
                                                     dtype=np.int32))
        t.attrs["units"] = "hours since 1900-01-01 00:00:00.0"
        if expver:
            f.create_dataset("expver", data=np.asarray([1, 5], np.int32))
        for v in varnames:
            data = rng.normal(size=shape).astype(np.float32) * 10 + 100
            full = np.stack([data * 0 - 999, data])     # 2 timesteps
            if expver:
                full = np.stack([full * 0, full], axis=1)  # expver axis
            if packed:
                scale, offset = 0.01, 100.0
                ints = np.round((full - offset) / scale).astype(np.int16)
                d = f.create_dataset(v, data=ints)
                d.attrs["scale_factor"] = np.float64(scale)
                d.attrs["add_offset"] = np.float64(offset)
                truth[v] = ints[tuple([1, 1] if expver else [1])].astype(
                    np.float64) * scale + offset
            else:
                f.create_dataset(v, data=full)
                truth[v] = full[tuple([1, 1] if expver else [1])]
    return truth


@pytest.mark.parametrize("packed,expver", [(False, False), (True, True)])
def test_h5py_netcdf_reader(tmp_path, packed, expver):
    when = datetime(2018, 1, 3, 12)
    rng = np.random.default_rng(0)
    path = str(tmp_path / "surface_201801.nc")
    truth = _write_fake_nc(path, ["msl", "u10"], (5, 8), when,
                           packed=packed, expver=expver, rng=rng)
    got = era5.read_netcdf_fields(path, ["msl", "u10"], when)
    for v in ("msl", "u10"):
        np.testing.assert_allclose(got[v], truth[v], rtol=1e-6)


def test_h5py_reader_missing_time(tmp_path):
    when = datetime(2018, 1, 3, 12)
    path = str(tmp_path / "surface_201801.nc")
    _write_fake_nc(path, ["msl"], (3, 4), when, packed=False, expver=False,
                   rng=np.random.default_rng(0))
    with pytest.raises(KeyError):
        era5.read_netcdf_fields(path, ["msl"], datetime(2019, 1, 1))


def test_file_backed_dataset_roundtrip(tmp_path):
    """End-to-end: write fake monthly/daily nc files, read a sample through
    the real (non-synthetic) dataset path."""
    cfg = ModelConfig(levels=3, lat=12, lon=48, depths=(2, 2, 2, 2),
                      heads=(2, 2, 2, 2), dims=(8, 16, 16, 8))
    root = tmp_path
    (root / "surface").mkdir()
    (root / "upper").mkdir()
    rng = np.random.default_rng(1)
    for day in (1, 2):
        when = datetime(2018, 1, day, 0)
        _write_fake_nc(str(root / "upper" / f"upper_201801{day:02d}.nc"),
                       list(era5.UPPER_VARS), (cfg.levels, cfg.lat, cfg.lon),
                       when, packed=False, expver=False, rng=rng)
    _write_fake_nc(str(root / "surface" / "surface_201801.nc"),
                   list(era5.SURFACE_VARS), (cfg.lat, cfg.lon),
                   datetime(2018, 1, 1, 0), packed=False, expver=False,
                   rng=rng)
    # surface file needs both timestamps; rewrite with both days
    import h5py
    with h5py.File(root / "surface" / "surface_201801.nc", "a") as f:
        hours0 = np.asarray(f["time"])[1]
        del f["time"]
        t = f.create_dataset("time", data=np.asarray(
            [hours0, hours0 + 24], np.int32))
        t.attrs["units"] = "hours since 1900-01-01 00:00:00.0"
        for v in era5.SURFACE_VARS:
            data = np.asarray(f[v])
            del f[v]
            f.create_dataset(v, data=np.concatenate([data, data[1:]], axis=0))

    dcfg = DataConfig(nc_path=str(root), horizon=24,
                      test_start="20180101", test_end="20180102",
                      test_freq="24h")
    ds = era5.make_dataset(dcfg, "test", mcfg=cfg)
    assert not isinstance(ds, era5.SyntheticEra5Dataset)
    assert len(ds) == 1
    s = ds[0]
    assert s.upper.shape == (5, cfg.levels, cfg.lat, cfg.lon)
    assert s.target_surface.shape == (4, cfg.lat, cfg.lon)
    assert s.times == ("2018010100", "2018010200")
    assert np.isfinite(s.upper).all()


def test_loader_batching_and_process_sharding():
    dcfg = DataConfig(train_start="20150101", train_end="20150120",
                      train_freq="12h", horizon=24)
    ds = era5.SyntheticEra5Dataset(dcfg, "train", mcfg=TINY)

    loader = era5.Loader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(loader.epoch(0))
    assert len(batches) == len(loader)
    b = batches[0]
    assert b["upper"].shape == (2, 5, TINY.levels, TINY.lat, TINY.lon)
    assert len(b["times"][0]) == 2

    # shuffle is epoch-deterministic
    again = list(era5.Loader(ds, batch_size=2, shuffle=True,
                             num_workers=2).epoch(0))
    np.testing.assert_array_equal(b["upper"], again[0]["upper"])
    # different epoch -> different order
    other = list(era5.Loader(ds, batch_size=2, shuffle=True,
                             num_workers=2).epoch(1))
    assert not np.array_equal(b["upper"], other[0]["upper"])

    # 2-process split covers disjoint work
    l0 = era5.Loader(ds, batch_size=1, process_index=0, process_count=2)
    l1 = era5.Loader(ds, batch_size=1, process_index=1, process_count=2)
    t0 = [b["times"][0][0] for b in l0.epoch(0)]
    t1 = [b["times"][0][0] for b in l1.epoch(0)]
    assert not set(t0) & set(t1)
    assert len(t0) + len(t1) == len(ds)


def test_norm_roundtrip():
    cfg = TINY
    c = synthetic_constants(cfg)
    rng = np.random.default_rng(2)
    u = rng.normal(size=(1, 5, cfg.levels, 4, 6)).astype(np.float32)
    s = rng.normal(size=(1, 4, 4, 6)).astype(np.float32)
    nu, ns = norm_data(u, s, c)
    bu, bs = denorm_data(nu, ns, c)
    np.testing.assert_allclose(bu, u, atol=1e-5)
    np.testing.assert_allclose(bs, s, atol=1e-5)


def test_fastpack_native_kernels():
    """Native data-plane kernels vs numpy reference (falls back to numpy
    automatically when the toolchain is unavailable)."""
    from pangu_tpu.data import fastpack as fp
    rng = np.random.default_rng(0)

    raw = rng.integers(-30000, 30000, size=(13, 40, 50), dtype=np.int16)
    got = fp.unpack_i16(raw, 0.01, 5.0, fill=-30000)
    want = np.where(raw == -30000, np.nan,
                    raw.astype(np.float32) * 0.01 + 5.0)
    np.testing.assert_allclose(got, want, atol=1e-4)

    fields = [rng.normal(size=(13, 30, 20)).astype(np.float32)
              for _ in range(5)]
    np.testing.assert_array_equal(fp.stack_flip(fields),
                                  np.stack(fields)[:, ::-1])

    x = rng.normal(size=(5, 13, 30, 20)).astype(np.float32)
    m = rng.normal(size=(5, 13)).astype(np.float32)
    s = rng.uniform(0.5, 2, size=(5, 13)).astype(np.float32)
    np.testing.assert_allclose(fp.normalize(x, m, s),
                               (x - m[..., None, None]) / s[..., None, None],
                               atol=1e-5)


def test_loader_bounded_in_flight_decodes():
    """A slow consumer must backpressure the DECODERS, not just the queue:
    with an up-front submit of every index, the worker pool keeps
    completing futures whose results (~0.5 GB each at full size) pile up
    in host RAM — O(dataset). The bounded in-flight window keeps retained
    decoded-but-unconsumed samples at O(num_workers + prefetch·batch)."""
    import threading
    import time as _time

    dcfg = DataConfig(train_start="20150101", train_end="20150420",
                      train_freq="24h", horizon=24)  # ~105 samples
    base = era5.SyntheticEra5Dataset(dcfg, "train", mcfg=TINY)
    assert len(base) >= 100

    lock = threading.Lock()
    state = {"decoded": 0, "consumed": 0, "peak": 0}

    class Tracking:
        def __len__(self):
            return len(base)

        def __getitem__(self, i):
            s = base[i]
            with lock:
                state["decoded"] += 1
                state["peak"] = max(state["peak"],
                                    state["decoded"] - state["consumed"])
            return s

    loader = era5.Loader(Tracking(), batch_size=1, num_workers=4, prefetch=2)
    for _ in loader.epoch(0):
        _time.sleep(0.01)  # slow consumer: decoders outrun it ~100x
        with lock:
            state["consumed"] += 1
    assert state["decoded"] == len(base)
    # window (workers + prefetch·batch) + queued batches + one in assembly,
    # plus slack for samples counted decoded before their future is drained
    bound = (4 + 2 * 1) + 2 + 1 + 4
    assert state["peak"] <= bound, (
        f"peak in-flight decoded samples {state['peak']} > {bound}: "
        f"decoder backpressure is broken (O(dataset) host RSS)")


def test_loader_early_abandon_reaps_producer():
    """Abandoning an epoch iterator mid-way (--limit/--smoke) must not
    leak the producer thread: the bounded q_put re-checks the stop event
    and the worker pool cancels queued decodes."""
    import threading
    import time as _time

    dcfg = DataConfig(train_start="20150101", train_end="20150130",
                      train_freq="12h", horizon=24)
    ds = era5.SyntheticEra5Dataset(dcfg, "train", mcfg=TINY)
    loader = era5.Loader(ds, batch_size=1, num_workers=2, prefetch=1)

    before = {t.ident for t in threading.enumerate()}
    it = loader.epoch(0)
    next(it)          # consume one batch, then abandon
    it.close()

    deadline = _time.time() + 10.0
    while _time.time() < deadline:
        extra = [t for t in threading.enumerate()
                 if t.ident not in before and t.is_alive()]
        if not extra:
            break
        _time.sleep(0.05)
    assert not extra, f"leaked threads: {extra}"
