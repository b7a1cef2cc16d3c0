"""Channel-padded level-1 lowering (``ModelConfig.c1_pad``).

The flagship's full-resolution stages run at ``base_c = 48`` channels
(reference default, ``attention_aspp_unet_pipeline_stage.py:545``), which
fills only 48 of the MXU's 128 lanes — probe r15 measured the dominant
3×3 conv at 512²×C48 at 9.5 % MFU while the same conv at C96 hit
71 TF/s.  This lowering runs every level-1 tensor (d1_0 / d1_1 / u1 and
the out_conv input) at a padded width ``P ∈ {64, 128}`` whose extra
channels are EXACTLY ZERO by construction:

- padded conv kernels carry zero rows at the padded *input* positions
  and zero columns at the padded *output* positions, so real outputs
  are untouched and padded outputs are exactly 0;
- padded BatchNorm entries carry γ = β = 0 (and running mean 0 / var 1),
  so a padded channel normalizes to exactly 0 in both train and eval
  mode (its batch mean/var over zeros are 0, and ×γ + β kills any
  1/√ε blow-up);
- ReLU / max-pool / dropout / concat preserve exact zeros, and u1 is
  never attention-gated in either reference wiring
  (``…stage.py:120-121``, ``test_ablation.py:199-202``), so no gate
  needs padding.

The padding is therefore **numerically the identity on the real
channels** (in exact arithmetic; fp accumulation order may differ —
tests pin f64 equality and tight f32 closeness), and it is also
TRAINING-transparent: padded weights receive exactly zero gradient
(their forward contribution is killed by γ = 0 downstream and zero
kernel rows), so SGD/AdamW (decay toward 0) keeps them at zero for the
whole run and ``unpad_variables_c1`` recovers a direct-layout
checkpoint exactly.

Whether the padded lowering is *faster* is a pure hardware question —
NOTES.md's round-2 measurement of a genuine base_c-64 net (1.78× FLOPs
at 1.14× time) predicts the pad loses ×0.88 at P=64; probe r42 settles
it (VERDICT r4 #1).  It ships as an exactness-tested opt-in either way.

Checkpoint compatibility: trees are always materialized by transforming
a direct-layout tree (``pad_variables_c1``); ``model.init`` under
``c1_pad`` does the same internally via the engine/train-state paths,
never by initializing padded channels with random values (that would be
a *different, wider* model).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _unfreeze(tree):
    """Fresh mutable nested-dict copy (leaves shared) — the transforms
    rebind nested entries and must never mutate the caller's tree."""
    try:
        from flax.core import unfreeze
        tree = unfreeze(tree)
    except Exception:  # plain dicts already
        pass
    return jax.tree_util.tree_map(lambda a: a, tree)


def _pad_to(a, axis: int, target: int, fill: float = 0.0):
    cur = a.shape[axis]
    if cur == target:
        return a
    if cur > target:
        raise ValueError(f"axis {axis} already {cur} > target {target}")
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, target - cur)
    if isinstance(a, np.ndarray):
        return np.pad(a, widths, constant_values=fill)
    return jnp.pad(a, widths, constant_values=fill)


def _slice_to(a, axis: int, target: int):
    if a.shape[axis] == target:
        return a
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(0, target)
    return a[tuple(sl)]


def _tree(d: Dict[str, Any], *path: str) -> Dict[str, Any]:
    for p in path:
        d = d[p]
    return d


def pad_variables_c1(variables: Dict[str, Any], base_c: int,
                     c1_pad: int) -> Dict[str, Any]:
    """Direct-layout (base_c) variables → c1_pad level-1 layout.

    Handles ``params`` and ``batch_stats``; any other collections pass
    through untouched (none of them touch level-1 widths — ``quant``
    scales are per-tensor scalars, but int8 lowering is refused at the
    model level anyway).
    """
    if c1_pad < base_c:
        raise ValueError(f"c1_pad {c1_pad} < base_c {base_c}")
    C, P = base_c, c1_pad
    v = {k: _unfreeze(val) for k, val in variables.items()}
    params = v["params"]
    bs = v.get("batch_stats")

    def pad_bn(*path):
        """γ/β/mean pad with 0, var with 1 → padded channels normalize
        to exactly 0 in eval mode, and ×γ=0 keeps them 0 in train mode."""
        for col, fills in ((params, {"scale": 0.0, "bias": 0.0}),
                           (bs, {"mean": 0.0, "var": 1.0})):
            if not col:
                continue
            bn = _tree(col, *path)["bn"]
            for key, fill in fills.items():
                if key in bn:
                    bn[key] = _pad_to(bn[key], 0, P, fill=fill)

    # d1_0: out 48→P
    k = _tree(params, "d1_0", "conv")
    k["kernel"] = _pad_to(k["kernel"], 3, P)
    pad_bn("d1_0")
    # d1_1: in 48→P (zero rows — upstream pads are exactly 0 anyway),
    # out 48→P
    k = _tree(params, "d1_1", "conv")
    k["kernel"] = _pad_to(_pad_to(k["kernel"], 2, P), 3, P)
    pad_bn("d1_1")
    # d2_0 consumes pooled x1: in 48→P
    k = _tree(params, "d2_0", "conv")
    k["kernel"] = _pad_to(k["kernel"], 2, P)
    # u1.up ConvTranspose (2,2,2C,48): out 48→P (+ bias)
    up = _tree(params, "u1", "up")
    up["kernel"] = _pad_to(up["kernel"], 3, P)
    if "bias" in up:
        up["bias"] = _pad_to(up["bias"], 0, P)
    # u1.conv0 consumes concat([x1, g]): (3,3,2C,C) → (3,3,2P,P) with the
    # real g rows moved from [C:2C] to [P:P+C]
    c0 = _tree(params, "u1", "conv0", "conv")
    old = np.asarray(c0["kernel"])
    new = np.zeros(old.shape[:2] + (2 * P, P), old.dtype)
    new[:, :, :C, :C] = old[:, :, :C, :]
    new[:, :, P:P + C, :C] = old[:, :, C:, :]
    c0["kernel"] = new
    pad_bn("u1", "conv0")
    # u1.conv1: in 48→P, out 48→P
    c1 = _tree(params, "u1", "conv1", "conv")
    c1["kernel"] = _pad_to(_pad_to(c1["kernel"], 2, P), 3, P)
    pad_bn("u1", "conv1")
    # out_conv: in 48→P
    oc = params["out_conv"]
    oc["kernel"] = _pad_to(oc["kernel"], 2, P)
    return v


def unpad_variables_c1(variables: Dict[str, Any], base_c: int,
                       c1_pad: int) -> Dict[str, Any]:
    """Inverse of :func:`pad_variables_c1` — exact when the padded
    channels are zero (always true for trees this module produced, and
    preserved by training: padded weights get zero gradient)."""
    C, P = base_c, c1_pad
    v = {k: _unfreeze(val) for k, val in variables.items()}
    params = v["params"]
    bs = v.get("batch_stats")

    def cut_bn(col, *path):
        if not col:
            return
        bn = _tree(col, *path)["bn"]
        for key in ("scale", "bias", "mean", "var"):
            if key in bn:
                bn[key] = _slice_to(bn[key], 0, C)

    k = _tree(params, "d1_0", "conv")
    k["kernel"] = _slice_to(k["kernel"], 3, C)
    cut_bn(params, "d1_0"), cut_bn(bs, "d1_0")
    k = _tree(params, "d1_1", "conv")
    k["kernel"] = _slice_to(_slice_to(k["kernel"], 2, C), 3, C)
    cut_bn(params, "d1_1"), cut_bn(bs, "d1_1")
    k = _tree(params, "d2_0", "conv")
    k["kernel"] = _slice_to(k["kernel"], 2, C)
    up = _tree(params, "u1", "up")
    up["kernel"] = _slice_to(up["kernel"], 3, C)
    if "bias" in up:
        up["bias"] = _slice_to(up["bias"], 0, C)
    c0 = _tree(params, "u1", "conv0", "conv")
    old = c0["kernel"]
    xp = np if isinstance(old, np.ndarray) else jnp
    c0["kernel"] = xp.concatenate(
        [old[:, :, :C, :C], old[:, :, P:P + C, :C]], axis=2)
    cut_bn(params, "u1", "conv0"), cut_bn(bs, "u1", "conv0")
    c1 = _tree(params, "u1", "conv1", "conv")
    c1["kernel"] = _slice_to(_slice_to(c1["kernel"], 2, C), 3, C)
    cut_bn(params, "u1", "conv1"), cut_bn(bs, "u1", "conv1")
    oc = params["out_conv"]
    oc["kernel"] = _slice_to(oc["kernel"], 2, C)
    return v
