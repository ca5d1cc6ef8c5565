"""LoRA fine-tuning as a pure pytree transform.

Replaces the reference's peft integration (/root/reference/finetune/
lora_tune.py:124-175) TPU-natively: LoRA factors are extra leaves on each
dense parameter dict, the low-rank path is evaluated unmerged inside
``layers.dense`` (two skinny MXU matmuls), and base-weight freezing is an
``optax.masked`` trainable mask compiled into the update — no module
wrapping, no runtime dispatch.

Matches the reference configuration: r=16, alpha=16, targets = every
Linear layer (qkv/proj/mlp/down/up-sample — the reference enumerates
``nn.Linear`` modules, lora_tune.py:124-128, which excludes the Conv1d
patch embed/recovery), and the output-layer convs trained fully
(``modules_to_save``, lora_tune.py:134).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# dense-param dicts that correspond to reference nn.Linear modules
LINEAR_SITES: Tuple[str, ...] = ("qkv", "proj", "fc1", "fc2",
                                 "reduce", "expand", "mix")
# fully-trained extra modules (peft modules_to_save, lora_tune.py:134)
MODULES_TO_SAVE: Tuple[str, ...] = ("patch_recovery",)

LORA_KEYS = ("lora_a", "lora_b", "lora_scale", "lora_drop",
             "lora_drop_feat")

# fold_in tag deriving the per-step feature-dropout key from the forward
# rng (distinct from the drop-path streams, which use split())
_FEAT_DROP_TAG = 0x10A


def _is_dense(node) -> bool:
    return isinstance(node, dict) and "kernel" in node


def _walk(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, path + (k,))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _walk(v, path + (i,))
    else:
        yield path, tree


def _dense_sites(params) -> List[Tuple[Any, ...]]:
    """Paths of dense-param dicts at LoRA target sites."""
    sites = []

    def rec(node, path):
        if _is_dense(node) and path and path[-1] in LINEAR_SITES:
            sites.append(path)
            return
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, path + (k,))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(v, path + (i,))

    rec(params, ())
    return sites


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def init_lora(rng, params, *, rank: int = 16, alpha: float = 16.0,
              dropout: float = 0.0,
              dropout_mode: str = "element") -> Dict:
    """Attach LoRA leaves to every target dense dict (in place on a copied
    tree). A ~ kaiming-uniform, B = 0 so the initial model is unchanged —
    the same init contract peft uses.

    ``dropout`` > 0 regularises the LoRA branch input during training.
    Two modes:

    * ``"element"`` — per-token, per-feature Bernoulli mask, bit-matching
      peft's ``LoraConfig(lora_dropout=...)`` (``nn.Dropout`` on the
      branch input, finetune/lora_tune.py:133).  The mask varies per
      token, so ``x@W + s·drop(x)@A@B`` has no merged-weight form — the
      fused whole-block kernels cannot run it and training falls back to
      the unmerged XLA path.  Stores a ``lora_drop`` rate leaf.
    * ``"feature"`` — one Bernoulli mask over the branch's INPUT FEATURES
      per step, shared across tokens (the spatial/1d-feature-dropout
      variant of the same regulariser).  Because the mask is constant
      over tokens it commutes into weight space exactly:
      ``drop(x)@A = x@(diag(m)/keep · A)``, so the per-step merge
      ``W + s·(diag(m)/keep·A)@B`` is EXACT and the fused fast path keeps
      running (see :func:`merge_lora` with ``rng``).  Stores a
      ``lora_drop_feat`` rate leaf."""
    if dropout_mode not in ("element", "feature"):
        raise ValueError(f"dropout_mode must be 'element' or 'feature', "
                         f"got {dropout_mode!r}")
    params = jax.tree.map(lambda x: x, params)  # shallow structural copy
    for path in _dense_sites(params):
        site = _get(params, path)
        d_in, d_out = site["kernel"].shape
        rng, sub = jax.random.split(rng)
        bound = float(np.sqrt(6.0 / d_in))
        site["lora_a"] = jax.random.uniform(
            sub, (d_in, rank), jnp.float32, -bound, bound
        ).astype(site["kernel"].dtype)
        site["lora_b"] = jnp.zeros((rank, d_out), site["kernel"].dtype)
        site["lora_scale"] = jnp.asarray(alpha / rank,
                                         site["kernel"].dtype)
        if dropout > 0.0:
            key = ("lora_drop" if dropout_mode == "element"
                   else "lora_drop_feat")
            site[key] = jnp.asarray(dropout, jnp.float32)
    return params


def has_lora(params) -> bool:
    """True when any dense site carries LoRA factors."""
    found = []

    def rec(node):
        if found:
            return
        if isinstance(node, dict):
            if "lora_a" in node:
                found.append(True)
                return
            for v in node.values():
                rec(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                rec(v)

    rec(params)
    return bool(found)


def has_lora_dropout(params, key: str = "lora_drop") -> bool:
    """True when any site stores the given dropout-rate leaf.  The default
    ``"lora_drop"`` (element mode) is the variant WITHOUT a merged-weight
    form — it forces training off the fused fast path.  Pass
    ``"lora_drop_feat"`` to detect the feature-mode rate, which merges
    exactly (:func:`merge_lora` with ``rng``)."""
    found = []

    def rec(node):
        if found:
            return
        if isinstance(node, dict):
            if key in node:
                found.append(True)
                return
            for v in node.values():
                rec(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                rec(v)

    rec(params)
    return bool(found)


def merge_lora(params, rng: Optional[jax.Array] = None) -> Dict:
    """Fold LoRA factors into the base kernels and strip the extra leaves
    (merged-weight export).

    Traced-safe: under jit this is a handful of rank-16 matmuls, so the
    TRAIN step can merge per-step and run the fused whole-block kernels
    on W + s·A@B — gradients reach lora_a/lora_b through the merge by
    autodiff (dA = dW_eff @ Bᵀ·s, dB = Aᵀ @ dW_eff·s) while the base
    kernels stay frozen by the optimizer mask.  Exact (mod rounding) vs
    the unmerged two-matmul form whenever the LoRA-branch dropout is off:
    y = x@(W + s·A@B) == x@W + s·(x@A)@B.

    ``rng``: when given AND a site stores a feature-mode dropout rate
    (``lora_drop_feat``, init_lora(dropout_mode="feature")), the per-step
    feature mask is drawn here and folded into the merge EXACTLY:
    drop(x)@A == x@(diag(m)/keep·A) because the mask is token-constant.
    Element-mode rates (``lora_drop``) have no merged form and are
    ignored by design — callers gate on :func:`has_lora_dropout` first.
    Export/inference callers omit ``rng`` (dropout off, plain merge)."""
    merged = jax.tree.map(lambda x: x, params)
    site_idx = [0]

    def rec(node):
        if _is_dense(node) and "lora_a" in node:
            a = node["lora_a"]
            if rng is not None and "lora_drop_feat" in node:
                keep = 1.0 - node["lora_drop_feat"]
                k = jax.random.fold_in(
                    jax.random.fold_in(rng, _FEAT_DROP_TAG), site_idx[0])
                m = jax.random.bernoulli(k, keep, (a.shape[0], 1))
                a = jnp.where(m, a / keep.astype(a.dtype),
                              jnp.zeros_like(a))
            site_idx[0] += 1
            node["kernel"] = (node["kernel"]
                              + (a @ node["lora_b"]) * node["lora_scale"])
            for k in LORA_KEYS:
                node.pop(k, None)   # drop leaves only exist when dropout>0
        elif isinstance(node, dict):
            for v in node.values():
                rec(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                rec(v)

    rec(merged)
    return merged


def strip_lora(params) -> Dict:
    """Remove LoRA leaves without merging (recover the frozen base)."""
    stripped = jax.tree.map(lambda x: x, params)

    def rec(node):
        if isinstance(node, dict):
            for k in LORA_KEYS:
                node.pop(k, None)
            for v in node.values():
                rec(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                rec(v)

    rec(stripped)
    return stripped


def trainable_mask(params) -> Any:
    """Bool pytree for optax.masked: True for LoRA leaves and everything
    under MODULES_TO_SAVE; False (frozen) elsewhere."""

    def rec(node, path):
        if isinstance(node, dict):
            return {k: rec(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [rec(v, path + (i,)) for i, v in enumerate(node)]
        names = [p for p in path if isinstance(p, str)]
        if any(n in MODULES_TO_SAVE for n in names):
            return True
        return path[-1] in ("lora_a", "lora_b")

    return rec(params, ())


def audit(before, after, atol: float = 0.0) -> Dict[str, List[str]]:
    """Updated-vs-frozen parameter report, the reference's post-training
    sanity check (lora_tune.py:158-175). Returns dotted-path lists."""
    report = {"updated": [], "frozen": []}
    b = dict(_walk(before))
    for path, leaf_after in _walk(after):
        leaf_before = b.get(path)
        name = ".".join(str(p) for p in path)
        if leaf_before is None:
            report["updated"].append(name)   # new (lora) leaf
            continue
        same = np.allclose(np.asarray(leaf_before), np.asarray(leaf_after),
                           atol=atol)
        report["frozen" if same else "updated"].append(name)
    return report
