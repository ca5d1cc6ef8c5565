"""Pretrained-weight conversion into the pangu-tpu params pytree.

Replaces /root/reference/models/onnx2torch.py (+ keys_all.csv). Three
sources are supported:

  * ``convert_torch_state_dict`` — the reference's converted checkpoint
    (``pangu_weather_24_torch.pth``, era5_data/config.py:74); torch (cpu)
    loads it, and the reference's parameter names are *systematic*, so the
    name map is generated programmatically rather than read from a CSV.
  * ``convert_onnx`` — the official ``pangu_weather_24.onnx`` directly,
    using a torch-name -> onnx-name lookup CSV with the reference's
    ``keys_all.csv`` schema (onnx2torch.py:5-6).
  * round-trip: ``export_torch_state_dict`` emits a reference-layout state
    dict from a params pytree (for cross-checking against torch).

Layout rules (the inverse of onnx2torch.py:36-52, because our dense kernels
use the ONNX MatMul (in, out) layout):
  torch Linear weight (out, in)     -> transpose -> kernel (in, out)
  torch Conv1d weight (out, in, 1)  -> squeeze+transpose -> kernel (in, out)
  ONNX MatMul weight (in, out)      -> copy as-is
  earth_specific_bias (1, ntype, heads, N, N) -> squeeze -> (ntype, ...)
  LayerNorm weight/bias             -> scale/bias
"""

from __future__ import annotations

import csv
from typing import Any, Callable, Dict, Iterator, List, Tuple

import numpy as np

from pangu_tpu.config import ModelConfig


Path = Tuple[Any, ...]


def _block_entries(i: int, j: int) -> List[Tuple[str, Path, str]]:
    t = f"layers.EarthSpecificLayer{i}.blocks.EarthSpecificBlock{j}"
    p: Path = ("stages", i, "blocks", j)
    return [
        (f"{t}.norm1.weight", p + ("norm1", "scale"), "copy"),
        (f"{t}.norm1.bias", p + ("norm1", "bias"), "copy"),
        (f"{t}.norm2.weight", p + ("norm2", "scale"), "copy"),
        (f"{t}.norm2.bias", p + ("norm2", "bias"), "copy"),
        (f"{t}.attention.linear1.weight", p + ("attn", "qkv", "kernel"),
         "linear"),
        (f"{t}.attention.linear1.bias", p + ("attn", "qkv", "bias"), "copy"),
        (f"{t}.attention.linear2.weight", p + ("attn", "proj", "kernel"),
         "linear"),
        (f"{t}.attention.linear2.bias", p + ("attn", "proj", "bias"), "copy"),
        (f"{t}.attention.earth_specific_bias",
         p + ("attn", "bias_table"), "bias_table"),
        (f"{t}.linear.linear1.weight", p + ("mlp", "fc1", "kernel"), "linear"),
        (f"{t}.linear.linear1.bias", p + ("mlp", "fc1", "bias"), "copy"),
        (f"{t}.linear.linear2.weight", p + ("mlp", "fc2", "kernel"), "linear"),
        (f"{t}.linear.linear2.bias", p + ("mlp", "fc2", "bias"), "copy"),
    ]


def name_map(cfg: ModelConfig) -> List[Tuple[str, Path, str]]:
    """(torch_name, pytree_path, transform) for every parameter. Ordering
    follows the reference's named_parameters traversal."""
    entries: List[Tuple[str, Path, str]] = [
        ("_input_layer.conv.weight",
         ("patch_embed", "upper", "kernel"), "conv1d"),
        ("_input_layer.conv.bias",
         ("patch_embed", "upper", "bias"), "copy"),
        ("_input_layer.conv_surface.weight",
         ("patch_embed", "surface", "kernel"), "conv1d"),
        ("_input_layer.conv_surface.bias",
         ("patch_embed", "surface", "bias"), "copy"),
    ]
    for i, depth in enumerate(cfg.depths):
        for j in range(depth):
            entries.extend(_block_entries(i, j))
    entries += [
        ("downsample.linear.weight",
         ("downsample", "reduce", "kernel"), "linear"),
        ("downsample.norm.weight", ("downsample", "norm", "scale"), "copy"),
        ("downsample.norm.bias", ("downsample", "norm", "bias"), "copy"),
        ("upsample.linear1.weight", ("upsample", "expand", "kernel"),
         "linear"),
        ("upsample.linear2.weight", ("upsample", "mix", "kernel"), "linear"),
        ("upsample.norm.weight", ("upsample", "norm", "scale"), "copy"),
        ("upsample.norm.bias", ("upsample", "norm", "bias"), "copy"),
        ("_output_layer.conv.weight",
         ("patch_recovery", "upper", "kernel"), "conv1d"),
        ("_output_layer.conv.bias",
         ("patch_recovery", "upper", "bias"), "copy"),
        ("_output_layer.conv_surface.weight",
         ("patch_recovery", "surface", "kernel"), "conv1d"),
        ("_output_layer.conv_surface.bias",
         ("patch_recovery", "surface", "bias"), "copy"),
    ]
    return entries


# transforms: torch layout -> pytree layout
_FROM_TORCH: Dict[str, Callable[[np.ndarray], np.ndarray]] = {
    "copy": lambda w: w,
    "linear": lambda w: np.ascontiguousarray(w.T),
    "conv1d": lambda w: np.ascontiguousarray(w[:, :, 0].T),
    "bias_table": lambda w: w.reshape(w.shape[-4:]),
}
# transforms: onnx layout -> pytree layout (MatMul weights are already (in, out))
_FROM_ONNX: Dict[str, Callable[[np.ndarray], np.ndarray]] = {
    **_FROM_TORCH,
    "linear": lambda w: w,
}


def _set_path(tree: Any, path: Path, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def _get_path(tree: Any, path: Path):
    node = tree
    for k in path:
        node = node[k]
    return node


def _empty_tree(cfg: ModelConfig) -> Dict:
    tree: Dict = {"patch_embed": {"upper": {}, "surface": {}},
                  "stages": [{"blocks": [{"norm1": {}, "norm2": {},
                                          "attn": {"qkv": {}, "proj": {}},
                                          "mlp": {"fc1": {}, "fc2": {}}}
                                         for _ in range(d)]}
                             for d in cfg.depths],
                  "downsample": {"norm": {}, "reduce": {}},
                  "upsample": {"expand": {}, "norm": {}, "mix": {}},
                  "patch_recovery": {"upper": {}, "surface": {}}}
    return tree


def convert_torch_state_dict(state_dict: Dict[str, Any],
                             cfg: ModelConfig,
                             dtype=np.float32) -> Dict:
    """Reference torch checkpoint -> params pytree. Accepts tensors or
    numpy arrays; strips a leading 'module.' (DDP) prefix if present."""
    sd = {}
    for k, v in state_dict.items():
        k = k.removeprefix("module.")
        sd[k] = np.asarray(getattr(v, "numpy", lambda: v)(), dtype=np.float32)

    params = _empty_tree(cfg)
    missing = []
    for torch_name, path, tf in name_map(cfg):
        if torch_name not in sd:
            missing.append(torch_name)
            continue
        _set_path(params, path, _FROM_TORCH[tf](sd[torch_name]).astype(dtype))
    if missing:
        raise KeyError(f"{len(missing)} parameters missing from checkpoint, "
                       f"e.g. {missing[:5]}")
    return params


def load_torch_checkpoint(path: str, cfg: ModelConfig,
                          dtype=np.float32) -> Dict:
    """Load pangu_weather_24_torch.pth (either a bare state dict or the
    train-loop's {'model': ...} wrapper, models/pangu_sample.py:94)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj:
        obj = obj["model"]
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return convert_torch_state_dict(obj, cfg, dtype)


def read_key_csv(csv_path: str) -> Dict[str, str]:
    """torch_name -> onnx_name lookup with the keys_all.csv schema."""
    out = {}
    with open(csv_path, newline="") as f:
        for row in csv.DictReader(f):
            tn = (row.get("torch_name") or "").strip()
            on = (row.get("onnx_name") or "").strip()
            if tn and on:
                out[tn] = on
    return out


def convert_onnx(onnx_path: str, csv_path: str, cfg: ModelConfig,
                 dtype=np.float32) -> Dict:
    """Official ONNX weights -> params pytree (requires the onnx package)."""
    try:
        import onnx
        from onnx import numpy_helper
    except ImportError as e:
        raise ImportError(
            "the 'onnx' package is not installed in this environment; use "
            "load_torch_checkpoint on the converted .pth instead") from e

    model = onnx.load(onnx_path)
    weights = {init.name: numpy_helper.to_array(init)
               for init in model.graph.initializer}
    lookup = read_key_csv(csv_path)

    params = _empty_tree(cfg)
    for torch_name, path, tf in name_map(cfg):
        onnx_name = lookup.get(torch_name)
        if onnx_name is None or onnx_name not in weights:
            raise KeyError(f"no ONNX initializer for {torch_name} "
                           f"({onnx_name})")
        w = np.asarray(weights[onnx_name], dtype=np.float32)
        _set_path(params, path, _FROM_ONNX[tf](w).astype(dtype))
    return params


def export_torch_state_dict(params: Dict, cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """params pytree -> reference-layout numpy state dict (inverse
    transforms), for golden cross-checks against torch."""
    inverse: Dict[str, Callable[[np.ndarray], np.ndarray]] = {
        "copy": lambda w: w,
        "linear": lambda w: np.ascontiguousarray(w.T),
        "conv1d": lambda w: np.ascontiguousarray(w.T)[:, :, None],
        "bias_table": lambda w: w[None],
    }
    out = {}
    for torch_name, path, tf in name_map(cfg):
        out[torch_name] = inverse[tf](np.asarray(_get_path(params, path),
                                                 dtype=np.float32))
    return out
