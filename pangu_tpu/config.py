"""Typed configuration tree for the pangu-tpu framework.

Replaces the reference's hard-coded ``OrderedEasyDict`` singleton
(``era5_data/config.py:7-79`` in zhaoshan2/pangu-pytorch) with frozen
dataclasses, JSON-file / environment overrides and *derived static geometry*.
Everything the model needs at trace time (token grids, window counts,
padding amounts) is computed here once, so the jitted programs see only
static Python ints.

Reference parity notes (file:line cite into /root/reference):
  * grid 721x1440, 13 pressure levels, 5 upper + 4 surface variables
    (era5_data/config.py:27-29)
  * patch size (2,4,4), window (2,6,12), depths [2,6,6,2],
    heads [6,12,12,6], dims [192,384,384,192] (models/pangu_model.py:9)
  * train hyperparameters LR 5e-6, weight decay 3e-6, batch 2, 100 epochs,
    MultiStep LR x0.5 at epochs [25,50] (era5_data/config.py:38-47,
    finetune/finetune_fully.py:121,133)
  * per-variable loss weights (era5_data/config.py:45-46)
  * train/val/test windows (era5_data/config.py:41-63)
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
from typing import Any, Mapping, Sequence, Tuple


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


@dataclasses.dataclass(frozen=True)
class StageGeometry:
    """Static token-grid geometry of one encoder/decoder stage."""

    z: int            # token planes (surface plane + upper planes)
    h: int            # latitude tokens
    w: int            # longitude tokens
    h_padded: int     # latitude tokens padded to a window multiple
    dim: int
    heads: int
    depth: int
    window: Tuple[int, int, int]

    @property
    def num_lon_windows(self) -> int:
        return self.w // self.window[2]

    @property
    def num_window_types(self) -> int:
        # "type_of_windows" in the reference (models/layers.py:151): one
        # earth-specific bias slice per (Z, lat) window position, shared
        # across longitude.
        return (self.z // self.window[0]) * (self.h_padded // self.window[1])

    @property
    def window_tokens(self) -> int:
        wz, wh, ww = self.window
        return wz * wh * ww

    @property
    def tokens(self) -> int:
        return self.z * self.h * self.w


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Geometry + architecture of the Earth-specific 3D Swin transformer."""

    upper_vars: int = 5
    surface_vars: int = 4
    const_masks: int = 3        # land/soil/topography planes appended to surface
    levels: int = 13
    lat: int = 721
    lon: int = 1440
    patch: Tuple[int, int, int] = (2, 4, 4)     # (Z, H, W)
    window: Tuple[int, int, int] = (2, 6, 12)   # (Z, H, W)
    depths: Tuple[int, ...] = (2, 6, 6, 2)
    heads: Tuple[int, ...] = (6, 12, 12, 6)
    dims: Tuple[int, ...] = (192, 384, 384, 192)
    drop_path_max: float = 0.2
    mlp_ratio: int = 4
    param_dtype: str = "float32"
    compute_dtype: str = "float32"
    remat: bool = True          # jax.checkpoint each block during training
    attn_impl: str = "xla"      # "xla" | "pallas"
    fast_math: bool = False     # bf16 LayerNorm stats + tanh-approx GELU
                                # (perf mode; parity mode keeps fp32/erf)
    # ---- kernel tuning (measured defaults, scripts/chunk_sweep.py /
    # scripts/gbwd_ab.py / scripts/train_fused_ab.py) -------------------
    train_fused: bool = True    # training fwd through whole-block kernels
                                # with per-block custom_vjp remat backward
    lon_chunk: int = 10         # lon windows per attention dot_general
                                # batch dim inside the block kernels
    lat_group: int = 2          # lat windows per program in interior
                                # wm->wm block kernels (largest divisor
                                # of nlat <= this is used; 1 disables).
                                # Hardware-verified 2026-08-18
                                # (scripts/latgroup_ab.py on v5e: gh=2
                                # exact match, 81.1 -> 79.4 ms per 12
                                # stage-1 blocks; gh=4 exceeds the 128 MB
                                # VMEM budget — real Mosaic rejects it).
                                # Stages with prime nlat (0/3 at full
                                # geometry) auto-fall back to gh=1
    lora_fused: bool = True     # LoRA on the fast path: merge W + s·A@B
                                # as traced ops INSIDE the step (a few
                                # rank-16 matmuls) so the fused
                                # whole-block kernels run on the merged
                                # weights; grads reach A/B through the
                                # merge by autodiff. Exact vs the
                                # unmerged form when the LoRA-branch
                                # dropout is off (always in eval) or in
                                # feature mode (token-constant mask,
                                # folded into the merge exactly); only
                                # ELEMENT-mode lora_dropout > 0 training
                                # falls back to the unmerged XLA path
    gelu: str = "erf"           # "erf" (exact, torch nn.GELU parity) |
                                # "tanh" (approximate GELU, max |err|
                                # 4.7e-4 — 8x below a bf16 ulp at 1.0;
                                # drops the erf polynomial's divide+exp
                                # chain from every block tail: stage-1
                                # block 7.35 -> 6.70 ms on v5e). The
                                # perf config (bench.py) ships "tanh";
                                # fp32 parity keeps "erf"
    attn_unroll: bool = False   # fully unroll the kernels' lon loop
    grid_bwd: str = "pallas"    # grid-attention backward: "pallas" (one
                                # fused kernel) | "xla" (vjp composition)
    block_layout: str = "wm"    # inter-block storage: "wm" (window-major
                                # between blocks; stage end-point kernels
                                # read/write the canonical token grid and
                                # relayout in VMEM, interior blocks are
                                # zero-relayout) | "v2" (token grid,
                                # rolled-coordinate kernels)
    edge_kernels: bool = True   # Pallas patch-embed -> wm entry storage
                                # (ops/embed_wm.py) and rolled wm ->
                                # physical-field recovery
                                # (ops/recovery_wm.py) on the all-wm
                                # single-device inference path.
                                # Hardware-verified 2026-08-19
                                # (scripts/edge_ab.py on v5e: embed
                                # 36.9 -> 23.0 ms, recovery 50.1 ->
                                # 11.3 ms, full cold 24 h step
                                # 258.9 -> 151.9 ms, maxdiff 0.031 bf16
                                # units end to end)

    def __post_init__(self):
        pz, ph, pw = self.patch
        if self.lon % pw != 0:
            raise ValueError("lon must be a multiple of the W patch size")
        if (self.lon // pw) % self.window[2] != 0:
            raise ValueError("lon tokens must be a multiple of the W window")
        if len(self.depths) != 4:
            raise ValueError("expect 4 stages (enc, enc, dec, dec)")

    @property
    def kernel_fast_math(self):
        """The ``fast_math`` value threaded to every kernel/tail:
        False (erf GELU + fp32 LN), "tanh" (tanh GELU + fp32 LN — the
        perf mode; gelu="tanh"), True (bf16 LN too — fast_math=True,
        CPU/interpret only: bf16 rsqrt aborts real Mosaic)."""
        if self.fast_math:
            return True
        return "tanh" if self.gelu == "tanh" else False

    # ---- derived embedding geometry -------------------------------------
    @property
    def lat_padded(self) -> int:
        # 721 -> 724 (models/layers.py:27 pads H by 3 before patching)
        return _round_up(self.lat, self.patch[1])

    @property
    def levels_padded(self) -> int:
        # 13 -> 14 (models/layers.py:36 pads Z by 1 before patching)
        return _round_up(self.levels, self.patch[0])

    @property
    def upper_planes(self) -> int:
        return self.levels_padded // self.patch[0]

    @property
    def z_tokens(self) -> int:
        # +1: the surface plane is stacked under the upper planes
        # (models/layers.py:89)
        return self.upper_planes + 1

    @property
    def h_tokens(self) -> int:
        return self.lat_padded // self.patch[1]

    @property
    def w_tokens(self) -> int:
        return self.lon // self.patch[2]

    @property
    def upper_patch_features(self) -> int:
        pz, ph, pw = self.patch
        return (self.upper_vars + 1) * pz * ph * pw  # +1: const_h plane

    @property
    def surface_patch_features(self) -> int:
        _, ph, pw = self.patch
        return (self.surface_vars + self.const_masks) * ph * pw

    # ---- stage geometry --------------------------------------------------
    def stage(self, i: int) -> StageGeometry:
        """Token geometry of stage i (0/3 full res, 1/2 half res)."""
        if i in (0, 3):
            z, h, w = self.z_tokens, self.h_tokens, self.w_tokens
        else:
            z = self.z_tokens
            h = _cdiv(self.h_tokens, 2)
            w = self.w_tokens // 2
        return StageGeometry(
            z=z, h=h, w=w,
            h_padded=_round_up(h, self.window[1]),
            dim=self.dims[i], heads=self.heads[i], depth=self.depths[i],
            window=self.window,
        )

    @property
    def total_blocks(self) -> int:
        return sum(self.depths)

    def drop_path_rates(self) -> Tuple[float, ...]:
        """Linearly scheduled stochastic-depth rates over all blocks
        (models/pangu_model.py:19)."""
        n = self.total_blocks
        if n == 1:
            return (0.0,)
        return tuple(self.drop_path_max * i / (n - 1) for i in range(n))


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Host-side ERA5 pipeline configuration (era5_data/config.py:21,41-63)."""

    nc_path: str = os.environ.get("PANGU_DATA", "/data/pangu")
    aux_path: str = ""           # defaults to <nc_path>/aux_data
    horizon: int = 24            # forecast horizon in hours (PG.HORIZON)
    train_start: str = "20150101"
    train_end: str = "20171231"
    train_freq: str = "12h"
    val_start: str = "20190101"
    val_end: str = "20191231"
    val_freq: str = "12h"
    test_start: str = "20180103"
    test_end: str = "20180117"
    test_freq: str = "12h"
    prefetch: int = 2            # async host->device prefetch depth
    num_workers: int = 4         # loader threads (reference used 0: sync I/O)

    upper_variables: Tuple[str, ...] = ("z", "q", "t", "u", "v")
    surface_variables: Tuple[str, ...] = ("msl", "u10", "v10", "t2m")
    # pressure levels, canonical order = index 0 is 1000 hPa
    # (era5_data/config.py:27)
    levels_hpa: Tuple[str, ...] = (
        "1000", "925", "850", "700", "600", "500", "400",
        "300", "250", "200", "150", "100", "50",
    )

    def resolved_aux_path(self) -> str:
        return self.aux_path or os.path.join(self.nc_path, "aux_data")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    epochs: int = 100
    lr: float = 5e-6
    weight_decay: float = 3e-6   # torch-Adam style L2-into-grad
    batch_size: int = 2
    eval_batch_size: int = 1   # reference evaluates at batch 1; >1 packs
                               # several target frames per device dispatch
                               # (per-sample CSV rows preserved)
    lr_milestones: Tuple[int, ...] = (25, 50)   # epochs
    lr_gamma: float = 0.5
    upper_weights: Tuple[float, ...] = (3.00, 0.60, 1.50, 0.77, 0.54)
    surface_weights: Tuple[float, ...] = (1.50, 0.77, 0.66, 3.00)
    surface_loss_weight: float = 0.25           # models/pangu_sample.py:67
    save_interval: int = 1                      # epochs between checkpoints
    save_steps: int = 0        # >0: also checkpoint every N optimizer steps
                               # (step-granular resume; 0 = epoch-only,
                               # the reference's granularity)
    val_interval: int = 1
    early_stop_patience: int = 5                # models/pangu_sample.py:170
    seed: int = 99
    # LoRA (finetune/lora_tune.py:129-135)
    lora_rank: int = 16
    lora_alpha: float = 16.0
    lora_dropout: float = 0.1
    lora_dropout_mode: str = "element"  # "element": peft-exact per-token
                                # masks (nn.Dropout on the branch input,
                                # lora_tune.py:133) — no merged-weight
                                # form, so fused training falls back to
                                # the unmerged XLA path.  "feature": one
                                # token-constant mask over the branch's
                                # input features per step — merges
                                # exactly, so training keeps the fused
                                # fast path at ~1.0x the full-tune step
                                # (models/lora.py::init_lora)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. Axes: dp = batch data parallel, sp = longitude
    (sequence/spatial) parallel, tp = attention-head / MLP tensor parallel."""

    dp: int = 1
    sp: int = 1
    tp: int = 1

    @property
    def size(self) -> int:
        return self.dp * self.sp * self.tp


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    output_path: str = os.environ.get("PANGU_OUT", "result")


# ---------------------------------------------------------------------------
# Presets
# ---------------------------------------------------------------------------

PANGU_24 = ModelConfig()

# Miniature geometry with the same structural quirks as the real grid
# (odd latitude -> nonzero lat padding, odd half-res latitude, Z padding),
# used by unit tests and the multi-chip dry run.
TINY = ModelConfig(
    levels=5,
    lat=49,
    lon=192,
    depths=(2, 2, 2, 2),
    heads=(2, 4, 4, 2),
    dims=(16, 32, 32, 16),
    remat=False,
)

# Mid-size geometry (~1/3 linear of the full grid, full level count, real
# depth asymmetry): the multi-chip dry run exercises this in addition to
# TINY so the sharding story is validated beyond toy extents.
MID = ModelConfig(
    levels=13,
    lat=241,
    lon=480,
    depths=(2, 2, 2, 2),   # enough blocks per stage to exercise the
                           # shifted/unshifted alternation; keeps the
                           # driver's CPU dry-run compile bounded
    heads=(4, 8, 8, 4),
    dims=(48, 96, 96, 48),
    remat=False,
)


# ---------------------------------------------------------------------------
# Overrides: nested-dict merge from JSON file / env / CLI ("a.b.c=v")
# ---------------------------------------------------------------------------

def _replace_nested(obj, updates: Mapping[str, Any]):
    own = {}
    for k, v in updates.items():
        field = next((f for f in dataclasses.fields(obj) if f.name == k), None)
        if field is None:
            raise KeyError(f"unknown config field {k!r} on {type(obj).__name__}")
        cur = getattr(obj, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, Mapping):
            own[k] = _replace_nested(cur, v)
        elif isinstance(cur, tuple) and isinstance(v, Sequence) and not isinstance(v, str):
            own[k] = tuple(v)
        elif isinstance(cur, str):
            # keep string-typed fields strings (date windows like
            # "20180103" would otherwise JSON-parse to ints)
            own[k] = str(v)
        else:
            own[k] = v
    return dataclasses.replace(obj, **own)


def load_config(path: str | None = None,
                overrides: Sequence[str] = ()) -> Config:
    """Build a Config from an optional JSON file plus `a.b.c=value` overrides."""
    cfg = Config()
    if path:
        with open(path) as f:
            cfg = _replace_nested(cfg, json.load(f))
    nested: dict = {}
    for item in overrides:
        key, _, raw = item.partition("=")
        try:
            val = json.loads(raw)
        except json.JSONDecodeError:
            val = raw
        node = nested
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    if nested:
        cfg = _replace_nested(cfg, nested)
    return cfg
