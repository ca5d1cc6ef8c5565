"""Full-model parity against the literal numpy transcription of the
reference forward (tests/reference_literal.py). Three tiers:

  1. TINY, fp32, in-process — every structural/permutation choice in the
     whole pipeline pinned end to end;
  2. TINY, fp64, subprocess — JAX_ENABLE_X64 must be set before jax
     initialises, so the zero-fp-noise check runs in its own interpreter;
     at 1e-9 tolerance any semantic divergence is loud;
  3. full 721x1440 geometry, fp32 (slow-marked) — the padding/cropping/
     window arithmetic at the real odd-sized grid.

With these green, the only step between this repo and the reference that
is not machine-checked is the pretrained weight file itself
(cli/parity_check.py covers that when the user supplies it).
"""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

import reference_literal as R
from pangu_tpu.config import TINY, PANGU_24
from pangu_tpu.data.constants import synthetic_constants
from pangu_tpu.models import pangu

import jax.numpy as jnp


def _problem(cfg, seed=7):
    params = pangu.init_params(jax.random.PRNGKey(0), cfg)
    consts = {k: jnp.asarray(v) for k, v in synthetic_constants(cfg).items()}
    rng = np.random.default_rng(seed)
    upper = rng.normal(size=(1, cfg.upper_vars, cfg.levels, cfg.lat,
                             cfg.lon)).astype(np.float32)
    surface = rng.normal(size=(1, cfg.surface_vars, cfg.lat,
                               cfg.lon)).astype(np.float32)
    return params, consts, upper, surface


def test_full_model_matches_literal_tiny_fp32():
    cfg = TINY
    params, consts, upper, surface = _problem(cfg)
    got_u, got_s = (np.asarray(a) for a in pangu.forward(
        params, jnp.asarray(upper), jnp.asarray(surface), consts, cfg))
    np_consts = {k: np.asarray(v) for k, v in consts.items()}
    want_u, want_s = R.forward(params, upper, surface, np_consts, cfg,
                               dtype=np.float64)
    np.testing.assert_allclose(got_u, want_u, atol=5e-4)
    np.testing.assert_allclose(got_s, want_s, atol=5e-4)


def test_full_model_matches_literal_tiny_fp64_subprocess():
    """fp64 on both sides: any residual difference is semantic, not fp
    noise. x64 must be enabled before jax initialises -> subprocess."""
    script = r"""
import os
os.environ["JAX_ENABLE_X64"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import sys
sys.path.insert(0, os.getcwd())
sys.path.insert(0, os.path.join(os.getcwd(), "tests"))
import numpy as np
import jax.numpy as jnp
import dataclasses
import reference_literal as R
from pangu_tpu.config import TINY
from pangu_tpu.data.constants import synthetic_constants
from pangu_tpu.models import pangu

cfg = dataclasses.replace(TINY, param_dtype="float64",
                          compute_dtype="float64")
params = pangu.init_params(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
consts = {k: jnp.asarray(np.asarray(v, np.float64))
          for k, v in synthetic_constants(cfg).items()}
rng = np.random.default_rng(7)
upper = rng.normal(size=(1, cfg.upper_vars, cfg.levels, cfg.lat,
                         cfg.lon))
surface = rng.normal(size=(1, cfg.surface_vars, cfg.lat, cfg.lon))

got_u, got_s = (np.asarray(a) for a in pangu.forward(
    params, jnp.asarray(upper), jnp.asarray(surface), consts, cfg))
np_consts = {k: np.asarray(v) for k, v in consts.items()}
want_u, want_s = R.forward(params, upper, surface, np_consts, cfg,
                           dtype=np.float64)
np.testing.assert_allclose(got_u, want_u, atol=1e-9)
np.testing.assert_allclose(got_s, want_s, atol=1e-9)
print("FP64 LITERAL PARITY OK")
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # no need for the 8-device mesh here
    proc = subprocess.run([sys.executable, "-c", script], env=env,
                          cwd=os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))),
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-4000:]
    assert "FP64 LITERAL PARITY OK" in proc.stdout


@pytest.mark.slow
def test_full_model_matches_literal_full_geometry():
    """The real 721x1440x13 grid: exercises the 181-lat window padding,
    Z 13->14 padding and the half-resolution odd latitudes that TINY can
    only imitate (SURVEY.md 'hard parts' (a)/(d))."""
    cfg = PANGU_24
    params, consts, upper, surface = _problem(cfg, seed=13)
    got_u, got_s = (np.asarray(a) for a in jax.jit(
        lambda p, u, s: pangu.forward(p, u, s, consts, cfg)
    )(params, jnp.asarray(upper), jnp.asarray(surface)))
    np_consts = {k: np.asarray(v) for k, v in consts.items()}
    want_u, want_s = R.forward(params, upper, surface, np_consts, cfg,
                               dtype=np.float32)
    np.testing.assert_allclose(got_u, want_u, atol=3e-3)
    np.testing.assert_allclose(got_s, want_s, atol=3e-3)
