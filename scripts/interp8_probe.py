"""Probe: interpret-mode pallas across N forced CPU devices.

Reproduces (and tests workarounds for) the 8-device deadlock documented
in NOTES.md: interpret_pallas_call's cross-device threading.Barrier
needs all N device programs' io_callbacks concurrently in flight.

Usage: python scripts/interp8_probe.py [n_devices=8] [mode=plain]
Run under `timeout 120` — a deadlock is the failure signal.
"""

import os as _os
import sys as _sys

_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

n = int(_sys.argv[1]) if len(_sys.argv) > 1 else 8
mode = _sys.argv[2] if len(_sys.argv) > 2 else "plain"

_os.environ["JAX_PLATFORMS"] = "cpu"
_os.environ["JAX_PLATFORM_NAME"] = "cpu"
_os.environ.pop("PALLAS_AXON_POOL_IPS", None)
_os.environ["XLA_FLAGS"] = (_os.environ.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count={n}")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P
def kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0


def pcall(x):
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)


def main():
    devs = jax.devices()
    print(f"devices: {len(devs)}", flush=True)
    mesh = Mesh(np.array(devs).reshape(n), ("d",))

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=P("d"),
                       out_specs=P("d"), check_vma=False)
    def f(x):
        if mode == "plain":
            return pcall(x)
        # scan mode: chained pallas calls + ppermute halos inside a scan
        # — the structure of the sharded wm rollout that deadlocked.
        def body(c, _):
            c = pcall(c)
            c = jax.lax.ppermute(
                c, "d", [(i, (i + 1) % n) for i in range(n)])
            c = pcall(c)
            return c, ()
        y, _ = jax.lax.scan(body, x, None, length=3)
        return y

    x = jnp.arange(n * 8 * 128, dtype=jnp.float32).reshape(n, 8, 128)
    with pltpu.force_tpu_interpret_mode():
        y = jax.jit(f)(x)
        y.block_until_ready()
    if mode == "plain":
        assert np.allclose(np.asarray(y), np.asarray(x) * 2.0)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
