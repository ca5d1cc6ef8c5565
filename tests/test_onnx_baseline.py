"""ONNX-Runtime baseline engine: import gating and the autoregressive
feedback loop (reference inference_singleOutput.py:30-41, 92-105).

onnxruntime is not installed in this image, so the engine is exercised
through a fake module injected into sys.modules — this smoke-tests the
real code path (session options, provider list, name introspection, state
feedback) while proving the ImportError gate stays clean when ORT is
absent."""

import sys
import types

import numpy as np
import pytest

from pangu_tpu.engine import onnx_baseline as OB


def test_gated_cleanly_when_ort_absent():
    assert "onnxruntime" not in sys.modules
    with pytest.raises(SystemExit, match="onnxruntime"):
        OB.make_session("whatever.onnx")


class _FakeTensor:
    def __init__(self, name):
        self.name = name


class _FakeSession:
    """Linear map u' = 2u, s' = s + 1 — enough to detect how many times
    the loop fed the state back."""

    def __init__(self, path, sess_options=None, providers=None):
        self.path = path
        self.sess_options = sess_options
        self.providers = providers

    def get_inputs(self):
        return [_FakeTensor("input"), _FakeTensor("input_surface")]

    def get_outputs(self):
        return [_FakeTensor("output"), _FakeTensor("output_surface")]

    def run(self, out_names, feeds):
        assert out_names == ["output", "output_surface"]
        u = feeds["input"]
        s = feeds["input_surface"]
        assert u.dtype == np.float32 and s.dtype == np.float32
        return [u * 2.0, s + 1.0]


class _FakeOptions:
    pass


@pytest.fixture
def fake_ort(monkeypatch):
    mod = types.ModuleType("onnxruntime")
    mod.SessionOptions = _FakeOptions
    mod.InferenceSession = _FakeSession
    monkeypatch.setitem(sys.modules, "onnxruntime", mod)
    return mod


def test_session_options_match_reference(fake_ort):
    """mem arena/pattern off + 16 intra-op threads + CPU EP
    (inference_singleOutput.py:33-38)."""
    sess = OB.make_session("model.onnx")
    assert sess.path == "model.onnx"
    assert sess.providers == ["CPUExecutionProvider"]
    o = sess.sess_options
    assert o.enable_cpu_mem_arena is False
    assert o.enable_mem_pattern is False
    assert o.intra_op_num_threads == 16


def test_rollout_feeds_state_back(fake_ort):
    """spaces = horizon // 24 chained runs, output -> next input
    (inference_singleOutput.py:92-105)."""
    sess = OB.make_session("model.onnx")
    u0 = np.ones((5, 3, 8, 16), np.float32)
    s0 = np.zeros((4, 8, 16), np.float32)
    u, s = OB.rollout(sess, u0, s0, steps=3)
    np.testing.assert_allclose(u, u0 * 8.0)      # 2^3
    np.testing.assert_allclose(s, s0 + 3.0)      # +1 x3


def test_io_name_introspection(fake_ort):
    sess = OB.make_session("model.onnx")
    assert OB._io_names(sess) == ("input", "input_surface",
                                  "output", "output_surface")
