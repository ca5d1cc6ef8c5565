"""Probe Mosaic support for the 2x2 interleave patterns on the real TPU.

Each candidate is compiled (tiny shapes) and reported OK/FAIL.
"""

import os as _os
import sys as _sys
_REPO_ROOT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import functools
import traceback


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import numpy as np

    g, w, c = 4, 16, 128
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2 * g, 2 * w, c)).astype(np.float32))

    def run(name, kernel, out_shape, scratch):
        try:
            y = pl.pallas_call(
                kernel, out_shape=out_shape, scratch_shapes=scratch,
            )(x)
            jax.block_until_ready(y)
            print(f"OK   {name}", flush=True)
            return True
        except Exception as e:
            msg = str(e).split("\n")[0][:120]
            print(f"FAIL {name}: {msg}", flush=True)
            return False

    f32 = jnp.float32
    S = jax.ShapeDtypeStruct

    # 1. read with mid-dim int indices (down-kernel pattern)
    def k1(x_ref, o_ref, s):
        xx = x_ref[...].reshape(g, 2, w, 2, c)
        for ho in range(2):
            for wo in range(2):
                s[:, :, (ho * 2 + wo) * c:(ho * 2 + wo + 1) * c] = \
                    xx[:, ho, :, wo, :]
        o_ref[...] = s[...]

    run("read-mid-int + lane-offset store", k1, S((g, w, 4 * c), f32),
        [pltpu.VMEM((g, w, 4 * c), f32)])

    # 2. leading-index store into (2,2,...) scratch + transpose + merge
    def k2(x_ref, o_ref, s):
        xx = x_ref[...].reshape(g, 2, w, 2, c)
        for ho in range(2):
            for wo in range(2):
                s[ho, wo] = xx[:, ho, :, wo, :]
        y = s[...].transpose(2, 0, 3, 1, 4)     # (g, 2, w, 2, c)
        o_ref[...] = y.reshape(2 * g, 2 * w, c)

    run("leading store + transpose + merge", k2, S((2 * g, 2 * w, c), f32),
        [pltpu.VMEM((2, 2, g, w, c), f32)])

    # 3. value-side stack + transpose + merge (no scratch indexing)
    def k3(x_ref, o_ref):
        xx = x_ref[...].reshape(g, 2, w, 2, c)
        parts = [xx[:, ho, :, wo, :] for ho in range(2) for wo in range(2)]
        y = jnp.stack(parts, axis=0).reshape(2, 2, g, w, c)
        y = y.transpose(2, 0, 3, 1, 4).reshape(2 * g, 2 * w, c)
        o_ref[...] = y

    run("stack + transpose + merge", k3, S((2 * g, 2 * w, c), f32), [])

    # 4. pure reshape round-trip (split + re-merge, no reorder)
    def k4(x_ref, o_ref):
        xx = x_ref[...].reshape(g, 2, w, 2, c)
        o_ref[...] = xx.reshape(2 * g, 2 * w, c)

    run("reshape split+merge", k4, S((2 * g, 2 * w, c), f32), [])

    # 5. transpose (g,2,w,2,c) -> (2,2,g,w,c) on the value side
    def k5(x_ref, o_ref):
        xx = x_ref[...].reshape(g, 2, w, 2, c)
        y = xx.transpose(1, 3, 0, 2, 4)
        o_ref[...] = y.reshape(4 * g, w, c)

    run("transpose to-leading + merge", k5, S((4 * g, w, c), f32), [])


if __name__ == "__main__":
    main()
