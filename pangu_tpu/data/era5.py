"""Host-side ERA5 data pipeline.

Replaces the reference's ``NetCDFDataset`` (/root/reference/era5_data/
utils_data.py:54-211) with a TPU-first loader:

  * same on-disk contract — monthly ``surface_YYYYMM.nc`` and daily
    ``upper_YYYYMMDD.nc`` files, variables z/q/t/u/v (13 levels) and
    msl/u10/v10/t2m on the 721x1440 grid, ERA5T ``expver`` handling, level
    axis flipped so index 0 is 1000 hPa (utils_data.py:117,153-156);
  * backend chain: xarray when installed, otherwise a built-in h5py
    netCDF4 reader (applies CF scale_factor/add_offset packing), otherwise
    synthetic fields — so every pipeline stage is testable without data;
  * asynchronous prefetch: a worker pool decodes + assembles samples and a
    device feeder overlaps host->device transfer with the train step (the
    role the reference's unused ``DataPrefetcher`` was meant to play,
    utils_data.py:16-51, but host-agnostic and actually wired in).
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
import dataclasses
import itertools
import os
import queue
import threading
from datetime import datetime, timedelta
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from pangu_tpu.config import DataConfig, ModelConfig

UPPER_VARS = ("z", "q", "t", "u", "v")
SURFACE_VARS = ("msl", "u10", "v10", "t2m")


# ---------------------------------------------------------------------------
# Low-level file readers
# ---------------------------------------------------------------------------

def _decode_nc_time(raw: np.ndarray, units: str) -> np.ndarray:
    """Decode CF time ('<unit> since <epoch>') to numpy datetime64[s]."""
    unit, _, epoch = units.partition(" since ")
    epoch = epoch.strip().split(".")[0]
    base = np.datetime64(epoch.replace(" ", "T"), "s")
    scale = {"seconds": 1, "minutes": 60, "hours": 3600,
             "days": 86400}[unit.strip()]
    return base + (raw.astype("int64") * scale).astype("timedelta64[s]")


def _read_h5_var(ds, time_idx: int, expver_idx: Optional[int]) -> np.ndarray:
    """Read one timestep of a variable, undoing CF int16 packing (native
    fastpack kernel when built, numpy otherwise)."""
    if expver_idx is not None and ds.ndim >= 3:
        raw = ds[time_idx, expver_idx]
    else:
        raw = ds[time_idx]
    raw = np.asarray(raw)
    attrs = ds.attrs
    fill = attrs.get("_FillValue", attrs.get("missing_value"))
    fill = None if fill is None else int(np.asarray(fill).item())
    scale = attrs.get("scale_factor")
    offset = attrs.get("add_offset")
    scale = 1.0 if scale is None else float(np.asarray(scale).item())
    offset = 0.0 if offset is None else float(np.asarray(offset).item())

    if raw.dtype == np.int16:
        from pangu_tpu.data import fastpack
        return fastpack.unpack_i16(raw, scale, offset, fill)
    data = raw.astype(np.float32)
    if fill is not None:
        data = np.where(raw == fill, np.nan, data)
    return (data * np.float32(scale) + np.float32(offset)).astype(np.float32)


def read_netcdf_fields(path: str, variables: Sequence[str],
                       when: datetime) -> Dict[str, np.ndarray]:
    """Read ``variables`` at timestamp ``when`` from a netCDF file.

    Prefers xarray (reference-identical decoding); falls back to h5py.
    ERA5T files carry an ``expver`` axis — like the reference we take
    expver=5 when present (utils_data.py:153-156).
    """
    try:
        import xarray as xr
        ds = xr.open_dataset(path)
        try:
            sel = (ds.sel(time=when, expver=5) if "expver" in ds
                   else ds.sel(time=when))
            return {v: sel[v].values.astype(np.float32) for v in variables}
        finally:
            ds.close()
    except ImportError:
        pass

    import h5py
    with h5py.File(path, "r") as f:
        tname = "time" if "time" in f else "valid_time"
        times = _decode_nc_time(np.asarray(f[tname]),
                                f[tname].attrs["units"].decode()
                                if isinstance(f[tname].attrs["units"], bytes)
                                else f[tname].attrs["units"])
        want = np.datetime64(when, "s")
        idx = np.where(times == want)[0]
        if idx.size == 0:
            raise KeyError(f"{when} not found in {path}")
        ti = int(idx[0])
        expver_idx = None
        if "expver" in f:
            ev = np.asarray(f["expver"])
            hit = np.where(ev == 5)[0]
            expver_idx = int(hit[0]) if hit.size else 0
        return {v: _read_h5_var(f[v], ti, expver_idx) for v in variables}


def stack_state(upper_fields: Dict[str, np.ndarray],
                surface_fields: Dict[str, np.ndarray]
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Stack per-variable fields into the canonical arrays
    (5, levels, lat, lon) / (4, lat, lon), with the level axis flipped to
    descending pressure — index 0 == 1000 hPa (utils_data.py:113-125)."""
    from pangu_tpu.data import fastpack
    upper = fastpack.stack_flip([upper_fields[v] for v in UPPER_VARS])
    surface = np.stack([surface_fields[v] for v in SURFACE_VARS])
    return upper.astype(np.float32), surface.astype(np.float32)


# ---------------------------------------------------------------------------
# Dataset over a date range
# ---------------------------------------------------------------------------

def date_keys(start: str, end: str, freq: str) -> List[datetime]:
    """Init-time keys over [start, end] at the given pandas frequency
    (utils_data.py:81-96)."""
    import pandas as pd
    return [ts.to_pydatetime()
            for ts in pd.date_range(start=start, end=end, freq=freq)]


@dataclasses.dataclass
class Era5Sample:
    upper: np.ndarray
    surface: np.ndarray
    target_upper: np.ndarray
    target_surface: np.ndarray
    times: Tuple[str, str]       # (input 'YYYYMMDDHH', target 'YYYYMMDDHH')

    def as_batch(self) -> Dict[str, np.ndarray]:
        return {
            "upper": self.upper[None], "surface": self.surface[None],
            "target_upper": self.target_upper[None],
            "target_surface": self.target_surface[None],
            "times": self.times,
        }


class Era5Dataset:
    """Map-style dataset of (state_t, state_{t+horizon}) pairs."""

    def __init__(self, dcfg: DataConfig, split: str = "train",
                 mcfg: Optional[ModelConfig] = None):
        self.dcfg = dcfg
        start, end, freq = {
            "train": (dcfg.train_start, dcfg.train_end, dcfg.train_freq),
            "val": (dcfg.val_start, dcfg.val_end, dcfg.val_freq),
            "test": (dcfg.test_start, dcfg.test_end, dcfg.test_freq),
        }[split]
        self.keys = date_keys(start, end, freq)
        self.horizon = dcfg.horizon
        # keep headroom so key + horizon stays inside the range
        step_h = max(1, int((self.keys[1] - self.keys[0]).total_seconds()
                            // 3600)) if len(self.keys) > 1 else 1
        drop = -(-self.horizon // step_h)
        self.length = max(len(self.keys) - drop, 0)

    def __len__(self) -> int:
        return self.length

    def _state_at(self, when: datetime) -> Tuple[np.ndarray, np.ndarray]:
        root = self.dcfg.nc_path
        sfc_path = os.path.join(root, "surface",
                                f"surface_{when:%Y%m}.nc")
        up_path = os.path.join(root, "upper", f"upper_{when:%Y%m%d}.nc")
        surface = read_netcdf_fields(sfc_path, SURFACE_VARS, when)
        upper = read_netcdf_fields(up_path, UPPER_VARS, when)
        return stack_state(upper, surface)

    def __getitem__(self, index: int) -> Era5Sample:
        t0 = self.keys[index]
        t1 = t0 + timedelta(hours=self.horizon)
        upper, surface = self._state_at(t0)
        tgt_upper, tgt_surface = self._state_at(t1)
        return Era5Sample(upper, surface, tgt_upper, tgt_surface,
                          (f"{t0:%Y%m%d%H}", f"{t1:%Y%m%d%H}"))


class SyntheticEra5Dataset(Era5Dataset):
    """Deterministic synthetic fields keyed by timestamp — drop-in for
    tests/benches with no data volume attached."""

    def __init__(self, dcfg: DataConfig, split: str = "train",
                 mcfg: Optional[ModelConfig] = None):
        super().__init__(dcfg, split)
        self.mcfg = mcfg or ModelConfig()

    def _state_at(self, when: datetime):
        m = self.mcfg
        seed = int(when.timestamp()) % (2 ** 31)
        r = np.random.default_rng(seed)
        upper = r.normal(size=(m.upper_vars, m.levels, m.lat, m.lon)
                         ).astype(np.float32)
        surface = r.normal(size=(m.surface_vars, m.lat, m.lon)
                           ).astype(np.float32)
        return upper, surface


def make_dataset(dcfg: DataConfig, split: str,
                 mcfg: Optional[ModelConfig] = None,
                 synthetic: Optional[bool] = None) -> Era5Dataset:
    if synthetic is None:
        synthetic = not os.path.isdir(os.path.join(dcfg.nc_path, "surface"))
    cls = SyntheticEra5Dataset if synthetic else Era5Dataset
    return cls(dcfg, split, mcfg=mcfg)


# ---------------------------------------------------------------------------
# Async loading + device prefetch
# ---------------------------------------------------------------------------

def batch_samples(samples: Sequence[Era5Sample]) -> Dict[str, np.ndarray]:
    return {
        "upper": np.stack([s.upper for s in samples]),
        "surface": np.stack([s.surface for s in samples]),
        "target_upper": np.stack([s.target_upper for s in samples]),
        "target_surface": np.stack([s.target_surface for s in samples]),
        "times": tuple(zip(*[s.times for s in samples])),
    }


class Loader:
    """Threaded loader: decodes samples with a worker pool, assembles
    batches, optionally shards/puts them on device ahead of consumption.

    ``shard_fn(host_batch) -> device_batch`` lets the trainer inject
    jax.device_put with NamedShardings; prefetch depth bounds in-flight
    device memory.
    """

    def __init__(self, dataset: Era5Dataset, batch_size: int, *,
                 shuffle: bool = False, seed: int = 0, drop_last: bool = True,
                 num_workers: int = 4, prefetch: int = 2,
                 shard_fn=None,
                 process_index: int = 0, process_count: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.shard_fn = shard_fn
        # per-host sharding of the sample index space (the role of
        # DistributedSampler, finetune/finetune_fully.py:75, without the
        # reference's broken gradient story)
        self.process_index = process_index
        self.process_count = process_count

    def _indices(self, epoch: int) -> List[int]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(idx)
        return list(idx[self.process_index::self.process_count])

    def __len__(self) -> int:
        n = len(self._indices(0))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._indices(epoch)
        if self.drop_last:
            indices = indices[:len(indices) - len(indices) % self.batch_size]
        if not indices:
            return
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def q_put(item) -> bool:
            # bounded put that re-checks stop: when the consumer abandons
            # the epoch early (--limit/--smoke), a plain put() would block
            # forever and leak this thread + its worker pool
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            pool = cf.ThreadPoolExecutor(self.num_workers)
            try:
                # Bounded in-flight window. Submitting every index up front
                # would let the pool keep completing futures whose results
                # (~0.5 GB per full-size sample pair) accumulate inside the
                # Future objects while the consumer is slow — O(dataset)
                # host RSS over a multi-year epoch. Cap outstanding work at
                # the pool width plus the output queue's worth of batches.
                window = self.num_workers + self.prefetch * self.batch_size
                index_iter = iter(indices)
                pending = collections.deque(
                    pool.submit(self.dataset.__getitem__, i)
                    for i in itertools.islice(index_iter, window))
                group = []
                while pending:
                    if stop.is_set():
                        return
                    fut = pending.popleft()
                    result = fut.result()
                    nxt = next(index_iter, None)
                    if nxt is not None:
                        pending.append(
                            pool.submit(self.dataset.__getitem__, nxt))
                    group.append(result)
                    if len(group) == self.batch_size:
                        batch = batch_samples(group)
                        if self.shard_fn is not None:
                            batch = self.shard_fn(batch)
                        if not q_put(batch):
                            return
                        group = []
                if group and not self.drop_last:
                    batch = batch_samples(group)
                    if self.shard_fn is not None:
                        batch = self.shard_fn(batch)
                    q_put(batch)
            except BaseException as e:  # surface loader errors to consumer
                q_put(e)
            finally:
                pool.shutdown(wait=False, cancel_futures=True)
                q_put(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def device_put_fn(mesh=None):
    """Build a shard_fn placing batch arrays on device (sharded over the
    mesh when given)."""
    import jax

    if mesh is None:
        def put(batch):
            return {k: (jax.device_put(v) if isinstance(v, np.ndarray) else v)
                    for k, v in batch.items()}
        return put

    from jax.sharding import NamedSharding, PartitionSpec as P
    from pangu_tpu.parallel.sharding import batch_shardings
    bsh = batch_shardings(mesh)
    dp = mesh.shape.get("dp", 1)
    # eval batches (batch 1) may not divide the dp axis: replicate batch
    bsh_nodp = {k: NamedSharding(mesh, P(None, *s.spec[1:]))
                for k, s in bsh.items()}

    multi_host = jax.process_count() > 1

    def put(batch):
        out = {}
        for k, v in batch.items():
            if k not in bsh:
                out[k] = v
            elif multi_host:
                # each process holds only ITS shard of the global batch
                # (Loader slices indices by process_index) — assemble the
                # global array from per-process local data, the role of
                # the reference's DistributedSampler (finetune_fully.py:75)
                out[k] = jax.make_array_from_process_local_data(bsh[k], v)
            elif v.shape[0] % dp == 0:
                out[k] = jax.device_put(v, bsh[k])
            else:
                out[k] = jax.device_put(v, bsh_nodp[k])
        return out
    return put


def compute_statistics(loader: "Loader", epoch: int = 0):
    """Offline per-variable mean/std over a loader — the reference's
    computeStatistics tool (era5_data/utils_data.py:274-288), averaging
    per-batch spatial moments."""
    sums = None
    n = 0
    for batch in loader.epoch(epoch):
        u, s = np.asarray(batch["upper"]), np.asarray(batch["surface"])
        cur = {
            "upper_mean": u.mean(axis=(0, -1, -2)),
            "upper_std": u.std(axis=(0, -1, -2)),
            "surface_mean": s.mean(axis=(0, -1, -2)),
            "surface_std": s.std(axis=(0, -1, -2)),
        }
        sums = cur if sums is None else {k: sums[k] + cur[k] for k in sums}
        n += 1
    if not n:
        raise ValueError("empty loader")
    stats = {k: (v / n).astype(np.float32) for k, v in sums.items()}
    # broadcast-ready canonical shapes
    stats["upper_mean"] = stats["upper_mean"][..., None, None]
    stats["upper_std"] = stats["upper_std"][..., None, None]
    stats["surface_mean"] = stats["surface_mean"][..., None, None]
    stats["surface_std"] = stats["surface_std"][..., None, None]
    return stats
