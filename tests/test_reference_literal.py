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


def test_weighted_l1_gradient_matches_literal_fd_fp64_subprocess():
    """fp64 gradient oracle (VERDICT r4 item 7): the weighted-L1 loss
    gradient of the FULL model (remat path) is checked against central
    finite differences of the loss computed THROUGH THE LITERAL numpy
    oracle — a reference-independent ground truth for the whole backward
    (loss: models/pangu_sample.py:61-67; target norm: utils_data.py:315).

    Method: directional derivatives. For random unit direction trees v,
        <grad L_jax(theta), v>  ==  (L_lit(theta+eps v) - L_lit(theta-eps v)) / (2 eps)
    in fp64 at eps=1e-6. Any systematic bwd-kernel / remat / custom_vjp
    bug shows up as a mismatch far above the ~1e-9 fp64 FD noise floor."""
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
from pangu_tpu.config import TINY, TrainConfig
from pangu_tpu.data.constants import synthetic_constants
from pangu_tpu.models import pangu

cfg = dataclasses.replace(TINY, param_dtype="float64",
                          compute_dtype="float64", remat=True)
tcfg = TrainConfig()
params = pangu.init_params(jax.random.PRNGKey(0), cfg)
params = jax.tree.map(lambda a: a.astype(jnp.float64), params)
np_consts = {k: np.asarray(v, np.float64)
             for k, v in synthetic_constants(cfg).items()}
consts = {k: jnp.asarray(v) for k, v in np_consts.items()}
rng = np.random.default_rng(7)
upper = rng.normal(size=(1, cfg.upper_vars, cfg.levels, cfg.lat, cfg.lon))
surface = rng.normal(size=(1, cfg.surface_vars, cfg.lat, cfg.lon))
tgt_u_raw = rng.normal(size=upper.shape)
tgt_s_raw = rng.normal(size=surface.shape)

# fp64 weighted-L1 in NATIVE dtype on both sides (engine.train's
# weighted_l1_loss casts to f32, which would drown the fp64 FD signal);
# targets normalised exactly like norm_data (utils_data.py:315).
wu = np.asarray(tcfg.upper_weights, np.float64).reshape(1, -1, 1, 1, 1)
ws = np.asarray(tcfg.surface_weights, np.float64).reshape(1, -1, 1, 1)
tgt_u = (tgt_u_raw - np_consts["upper_mean"][None]) \
    / np_consts["upper_std"][None]
tgt_s = (tgt_s_raw - np_consts["surface_mean"][None]) \
    / np_consts["surface_std"][None]

def loss_jax(p):
    ou, osf = pangu.forward(p, jnp.asarray(upper), jnp.asarray(surface),
                            consts, cfg, deterministic=True)
    lu = jnp.mean(jnp.abs(ou - jnp.asarray(tgt_u)) * jnp.asarray(wu))
    ls = jnp.mean(jnp.abs(osf - jnp.asarray(tgt_s)) * jnp.asarray(ws))
    return lu + tcfg.surface_loss_weight * ls

def loss_lit(p_np):
    ou, osf = R.forward(p_np, upper, surface, np_consts, cfg,
                        dtype=np.float64)
    lu = np.mean(np.abs(ou - tgt_u) * wu)
    ls = np.mean(np.abs(osf - tgt_s) * ws)
    return lu + tcfg.surface_loss_weight * ls

loss0, grads = jax.jit(jax.value_and_grad(loss_jax))(params)
loss0 = float(loss0)
# sanity: the two losses agree at theta before we trust their FD
l_lit0 = loss_lit(R.jax_tree_to_numpy(params, np.float64))
assert abs(loss0 - l_lit0) < 1e-9, (loss0, l_lit0)

leaves, treedef = jax.tree.flatten(params)
eps = 1e-6
dir_rng = np.random.default_rng(3)
for trial in range(2):
    vs = [dir_rng.normal(size=l.shape) for l in leaves]
    vnorm = np.sqrt(sum(float((v ** 2).sum()) for v in vs))
    vs = [v / vnorm for v in vs]
    got = sum(float(np.vdot(np.asarray(g), v))
              for g, v in zip(jax.tree.leaves(grads), vs))
    plus = jax.tree.unflatten(
        treedef, [np.asarray(l, np.float64) + eps * v
                  for l, v in zip(leaves, vs)])
    minus = jax.tree.unflatten(
        treedef, [np.asarray(l, np.float64) - eps * v
                  for l, v in zip(leaves, vs)])
    want = (loss_lit(plus) - loss_lit(minus)) / (2 * eps)
    print(f"dir {trial}: jax <grad,v>={got:.12e}  literal FD={want:.12e}")
    assert abs(got - want) <= 1e-6 * max(1.0, abs(want)), (got, want)
print("FP64 GRAD ORACLE OK")
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run([sys.executable, "-c", script], env=env,
                          cwd=os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))),
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-4000:]
    assert "FP64 GRAD ORACLE OK" in proc.stdout


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
