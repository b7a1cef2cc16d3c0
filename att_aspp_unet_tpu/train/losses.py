"""Loss zoo — semantics of the reference criterion builder
(``attention_aspp_unet_pipeline_stage.py:173-232``), JAX-functional.

Inputs are NHWC: logits (B, H, W, 1), targets (B, H, W, 1) in {0, 1}.
Spatial reductions run per (sample, channel) then average — matching torch's
``.sum((2, 3))`` + ``.mean()``.  The positive-sample-only Dice/edge terms use
masked means instead of boolean gathering (static shapes under jit).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..config import LossConfig
from ..ops.image import sobel_gradients

_SPATIAL = (1, 2)


def _per_sample(x):
    """Sum over H, W keeping (B, C)."""
    return jnp.sum(x, axis=_SPATIAL)


def dice_loss(logits, targets, smooth: float = 1.0, sample_mask=None):
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    num = 2.0 * _per_sample(p * t) + smooth
    den = _per_sample(p) + _per_sample(t) + smooth
    per = 1.0 - num / den                                   # (B, C)
    return _masked_mean(per, sample_mask)


def tversky_loss(logits, targets, alpha: float = 0.7, beta: float = 0.3,
                 smooth: float = 1.0, sample_mask=None):
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    tp = _per_sample(p * t)
    fp = _per_sample(p * (1.0 - t))
    fn = _per_sample((1.0 - p) * t)
    tv = (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
    return _masked_mean(1.0 - tv, sample_mask)


def bce_with_logits(logits, targets, weight=None, sample_mask=None):
    l = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    per = jnp.maximum(l, 0) - l * t + jnp.log1p(jnp.exp(-jnp.abs(l)))
    if weight is not None:
        per = per * weight
    if sample_mask is None:
        return jnp.mean(per)
    w = sample_mask.astype(jnp.float32).reshape((-1,) + (1,) * (per.ndim - 1))
    tot = jnp.sum(per * w)
    cnt = jnp.sum(w) * float(np_prod(per.shape[1:]))
    return tot / jnp.maximum(cnt, 1.0)


def np_prod(shape):
    out = 1
    for s in shape:
        out *= int(s)
    return out


def combo_loss(logits, targets, smooth: float = 1.0, sample_mask=None):
    """Dice + BCE (``ComboLoss``)."""
    return dice_loss(logits, targets, smooth, sample_mask) + \
        bce_with_logits(logits, targets)


def edge_loss(logits, targets, sample_mask=None):
    """L1 between Sobel gradient magnitudes of sigmoid(pred) and target."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32))[..., 0]   # (B, H, W)
    t = targets.astype(jnp.float32)[..., 0]
    gxp, gyp = sobel_gradients(p)
    gxt, gyt = sobel_gradients(t)
    gp = jnp.sqrt(gxp ** 2 + gyp ** 2 + 1e-8)
    gt = jnp.sqrt(gxt ** 2 + gyt ** 2 + 1e-8)
    per_px = jnp.abs(gp - gt)
    if sample_mask is None:
        return jnp.mean(per_px)
    w = sample_mask.reshape((-1, 1, 1)).astype(jnp.float32)
    tot = jnp.sum(per_px * w)
    cnt = jnp.sum(w) * per_px.shape[1] * per_px.shape[2]
    return tot / jnp.maximum(cnt, 1.0)


def iou_score(logits, targets, thr: float = 0.5):
    p = (jax.nn.sigmoid(logits.astype(jnp.float32)) > thr).astype(jnp.float32)
    t = targets.astype(jnp.float32)
    inter = _per_sample(p * t)
    union = _per_sample(p) + _per_sample(t) - inter
    return jnp.mean(inter / (union + 1e-7))


def _masked_mean(per_sample_vals, sample_mask):
    """Mean over (B, C); with a (B,) mask, mean over selected samples only —
    the torch ``base(l[pos], t[pos])`` semantics with static shapes."""
    if sample_mask is None:
        return jnp.mean(per_sample_vals)
    w = sample_mask.astype(jnp.float32)[:, None]
    tot = jnp.sum(per_sample_vals * w)
    cnt = jnp.sum(w) * per_sample_vals.shape[1]
    return tot / jnp.maximum(cnt, 1.0)


def build_criterion(cfg: LossConfig, stage: str = "main") -> Callable:
    """criterion(logits, targets) → scalar.

    weighted BCE (empty-mask samples down-weighted by ``neg_bce_weight`` in
    the finetune stage) + Dice(or Tversky[+BCE]) and Sobel edge loss computed
    on positive samples only (``build_criterion``, ``…stage.py:219-232``).
    """

    if cfg.loss_type == "combo":
        # ComboLoss = Dice + BCE — applied to the positive subset on top of
        # the global weighted BCE, exactly like the reference wiring where
        # ``base_loss = ComboLoss()`` feeds ``build_criterion``
        # (``…stage.py:308-309`` + ``:219-231``: positives get BCE twice).
        def base(l, t, m):
            return dice_loss(l, t, cfg.dice_smooth, m) + \
                bce_with_logits(l, t, sample_mask=m)
    elif cfg.loss_type == "tversky":
        def base(l, t, m):
            return tversky_loss(l, t, cfg.tversky_alpha, cfg.tversky_beta,
                                cfg.dice_smooth, m)
    else:
        raise ValueError(f"unknown loss_type {cfg.loss_type!r}")

    def criterion(logits, targets):
        l = logits.astype(jnp.float32)
        t = targets.astype(jnp.float32)
        is_empty = (_per_sample(t)[:, 0] == 0)               # (B,)
        pos = ~is_empty

        if stage == "finetune":
            w = jnp.where(is_empty, cfg.neg_bce_weight, 1.0)
            weight = w[:, None, None, None]
        else:
            weight = None
        bce = bce_with_logits(l, t, weight)

        any_pos = jnp.any(pos)
        d = jnp.where(any_pos, base(l, t, pos), 0.0)
        e = jnp.where(any_pos & (cfg.edge_weight > 0),
                      edge_loss(l, t, pos) * cfg.edge_weight, 0.0)
        return d + bce + e

    return criterion
