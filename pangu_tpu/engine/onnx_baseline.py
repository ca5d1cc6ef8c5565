"""ONNX-Runtime baseline engine (optional dependency).

The reference's only trusted oracle is the official ``pangu_weather_24.onnx``
run through ONNX Runtime (/root/reference/inference/inference_singleOutput.py:
30-41: tuned session options, CUDA/CPU execution provider, host-side
autoregressive feedback loop :92-105). This module reproduces that engine so
a user holding the official weights can produce the golden row of the parity
tables side by side with the TPU model — same CSVs, same scoring.

onnxruntime is NOT part of this image; everything here import-gates it with
an actionable error, and the CLI wiring (cli/inference.py --onnx-baseline)
degrades cleanly when it is absent.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def _require_ort():
    try:
        import onnxruntime as ort
    except ImportError:
        raise SystemExit(
            "the --onnx-baseline path runs the official .onnx through "
            "ONNX Runtime, which is not installed in this environment; "
            "`pip install onnxruntime` (CPU) or onnxruntime-gpu, then "
            "re-run. The TPU-native path does not need it.") from None
    return ort


def make_session(onnx_path: str,
                 providers: Optional[Sequence[str]] = None,
                 intra_op_threads: int = 16):
    """ORT session with the reference's tuned options
    (inference_singleOutput.py:30-41): memory arena and memory pattern OFF
    (the 1.1 GB activations thrash the arena allocator), 16 intra-op
    threads, CPU provider by default (the reference prefers CUDA EP when
    present — pass providers explicitly to opt in)."""
    ort = _require_ort()
    opts = ort.SessionOptions()
    opts.enable_cpu_mem_arena = False
    opts.enable_mem_pattern = False
    opts.enable_mem_reuse = False
    opts.intra_op_num_threads = intra_op_threads
    providers = list(providers or ["CPUExecutionProvider"])
    return ort.InferenceSession(onnx_path, sess_options=opts,
                                providers=providers)


def _io_names(session) -> Tuple[str, str, str, str]:
    """Input/output binding names. The official export uses
    input/input_surface -> output/output_surface; introspect instead of
    hard-coding so re-exports keep working."""
    ins = [i.name for i in session.get_inputs()]
    outs = [o.name for o in session.get_outputs()]
    in_u = next((n for n in ins if "surface" not in n), ins[0])
    in_s = next((n for n in ins if "surface" in n), ins[-1])
    out_u = next((n for n in outs if "surface" not in n), outs[0])
    out_s = next((n for n in outs if "surface" in n), outs[-1])
    return in_u, in_s, out_u, out_s


def rollout(session, upper: np.ndarray, surface: np.ndarray,
            steps: int) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side autoregressive rollout, exactly the reference loop
    (inference_singleOutput.py:92-105): each 24 h output feeds back as the
    next input through host numpy. upper (5, levels, lat, lon) /
    surface (4, lat, lon), physical units, float32, no batch dim (the
    official ONNX graph is batchless)."""
    in_u, in_s, out_u, out_s = _io_names(session)
    u = np.ascontiguousarray(upper, np.float32)
    s = np.ascontiguousarray(surface, np.float32)
    for _ in range(steps):
        u, s = session.run([out_u, out_s], {in_u: u, in_s: s})
    return np.asarray(u), np.asarray(s)
