"""Weight-converter tests: complete coverage of the parameter inventory,
transform roundtrips, and golden micro-parity of each converted op against
its torch counterpart (torch cpu is available; this pins the layout rules
the reference encodes in onnx2torch.py:36-52 without needing the actual
pretrained file)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pangu_tpu.config import PANGU_24, TINY
from pangu_tpu.models import convert as C
from pangu_tpu.models import layers as L
from pangu_tpu.models import pangu

# sub-second unit tests: the <3-min driver smoke tier (pytest -m quick)
pytestmark = pytest.mark.quick

RNG = np.random.default_rng(0)


def test_name_map_complete():
    entries = C.name_map(PANGU_24)
    assert len(entries) == 223          # keys_all.csv has 223 mappings
    names = [e[0] for e in entries]
    assert len(set(names)) == 223
    # every leaf of the real params tree is covered exactly once
    params = pangu.init_params(jax.random.PRNGKey(0), TINY)
    tiny_entries = C.name_map(TINY)
    leaf_paths = set()
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    for path, _leaf in flat:
        leaf_paths.add(tuple(getattr(p, "key", getattr(p, "idx", None))
                             for p in path))
    mapped = {e[1] for e in tiny_entries}
    assert mapped == leaf_paths


def test_roundtrip_export_import():
    params = pangu.init_params(jax.random.PRNGKey(1), TINY)
    sd = C.export_torch_state_dict(params, TINY)
    back = C.convert_torch_state_dict(sd, TINY)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params, jax.tree.map(jnp.asarray, back))


def test_missing_params_raise():
    params = pangu.init_params(jax.random.PRNGKey(1), TINY)
    sd = C.export_torch_state_dict(params, TINY)
    sd.pop("_input_layer.conv.weight")
    with pytest.raises(KeyError):
        C.convert_torch_state_dict(sd, TINY)


def test_ddp_prefix_stripped():
    params = pangu.init_params(jax.random.PRNGKey(1), TINY)
    sd = {f"module.{k}": v
          for k, v in C.export_torch_state_dict(params, TINY).items()}
    back = C.convert_torch_state_dict(sd, TINY)
    np.testing.assert_array_equal(
        np.asarray(back["downsample"]["reduce"]["kernel"]),
        np.asarray(params["downsample"]["reduce"]["kernel"]))


def test_torch_linear_golden():
    """converted Linear == torch.nn.Linear on the same weights."""
    import torch
    lin = torch.nn.Linear(6, 10)
    x = RNG.normal(size=(3, 6)).astype(np.float32)
    want = lin(torch.from_numpy(x)).detach().numpy()

    kernel = C._FROM_TORCH["linear"](lin.weight.detach().numpy())
    p = {"kernel": jnp.asarray(kernel),
         "bias": jnp.asarray(lin.bias.detach().numpy())}
    got = np.asarray(L.dense(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_torch_conv1d_k1_golden():
    """converted Conv1d(k=1) == dense over the channel axis — the identity
    the patch embed/recovery conversion relies on (models/layers.py:17-18)."""
    import torch
    conv = torch.nn.Conv1d(8, 5, kernel_size=1)
    x = RNG.normal(size=(1, 8, 7)).astype(np.float32)   # (B, C_in, T)
    want = conv(torch.from_numpy(x)).detach().numpy()   # (B, 5, T)

    kernel = C._FROM_TORCH["conv1d"](conv.weight.detach().numpy())
    p = {"kernel": jnp.asarray(kernel),
         "bias": jnp.asarray(conv.bias.detach().numpy())}
    got = np.asarray(L.dense(p, jnp.asarray(x.transpose(0, 2, 1))))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=1e-5)


def test_torch_layernorm_golden():
    import torch
    ln = torch.nn.LayerNorm(9)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(
            RNG.normal(size=9).astype(np.float32)))
        ln.bias.copy_(torch.from_numpy(
            RNG.normal(size=9).astype(np.float32)))
    x = RNG.normal(size=(4, 9)).astype(np.float32)
    want = ln(torch.from_numpy(x)).detach().numpy()
    p = {"scale": jnp.asarray(ln.weight.detach().numpy()),
         "bias": jnp.asarray(ln.bias.detach().numpy())}
    got = np.asarray(L.layer_norm(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_torch_gelu_golden():
    import torch
    x = RNG.normal(size=(64,)).astype(np.float32)
    want = torch.nn.GELU()(torch.from_numpy(x)).numpy()
    got = np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=False))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_onnx_transform_rules():
    """ONNX MatMul weights land untransposed; conv/bias rules shared."""
    w = RNG.normal(size=(4, 8)).astype(np.float32)
    np.testing.assert_array_equal(C._FROM_ONNX["linear"](w), w)
    np.testing.assert_array_equal(C._FROM_TORCH["linear"](w), w.T)
    wb = RNG.normal(size=(1, 3, 2, 5, 5)).astype(np.float32)
    np.testing.assert_array_equal(C._FROM_ONNX["bias_table"](wb), wb[0])


def test_read_key_csv(tmp_path):
    p = tmp_path / "keys.csv"
    p.write_text("torch_name,onnx_name\n"
                 "_input_layer.conv.weight,b1.a1.weight\n"
                 "orphan,\n")
    m = C.read_key_csv(str(p))
    assert m == {"_input_layer.conv.weight": "b1.a1.weight"}


def test_convert_onnx_gated():
    with pytest.raises((ImportError, FileNotFoundError)):
        C.convert_onnx("/nonexistent.onnx", "/nonexistent.csv", TINY)


def test_load_torch_checkpoint_wrapper(tmp_path):
    """Accepts the train-loop's {'model': state_dict, ...} wrapper
    (models/pangu_sample.py:94)."""
    import torch
    params = pangu.init_params(jax.random.PRNGKey(2), TINY)
    sd = {k: torch.from_numpy(v)
          for k, v in C.export_torch_state_dict(params, TINY).items()}
    path = str(tmp_path / "ckpt.pth")
    torch.save({"model": sd, "epoch": 7}, path)
    back = C.load_torch_checkpoint(path, TINY)
    np.testing.assert_allclose(
        np.asarray(back["stages"][0]["blocks"][0]["attn"]["bias_table"]),
        np.asarray(params["stages"][0]["blocks"][0]["attn"]["bias_table"]),
        atol=1e-7)
