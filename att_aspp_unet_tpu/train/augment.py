"""Device-side training augmentation.

The reference augments on the host with albumentations inside a
``num_workers=0`` DataLoader (``…stage.py:149-156`` — the CPU hot loop of
training, SURVEY.md §3.2).  Here the whole batch augments on device under the
same jit as the train step: geometric transforms compose into a single
inverse coordinate map (one bilinear gather for the image, one nearest gather
for the mask), intensity transforms are fused elementwise ops, and CLAHE +
median-3 reuse the batched preprocessing kernels.

Pipeline (train): resize → hflip(.5) → affine(scale .92–1.08, rot ±7°,
translate 0–2 %, p .7) → gamma(.3) → brightness/contrast(.3) → elastic(α 8,
σ 3, p .25) → CLAHE(1, 8×8) → median-3 → [0,1] float.
Val: resize → CLAHE → median-3 → float.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import AugmentConfig
from ..ops import clahe, median3x3
from ..ops.image import gaussian_kernel1d


def _sample_params(key, cfg: AugmentConfig):
    ks = jax.random.split(key, 12)
    u = lambda k, lo, hi: jax.random.uniform(k, (), minval=lo, maxval=hi)
    p = {
        "do_flip": jax.random.bernoulli(ks[0], float(cfg.hflip_p)),
        "do_affine": jax.random.bernoulli(ks[1], float(cfg.affine_p)),
        "scale": u(ks[2], cfg.scale_range[0], cfg.scale_range[1]),
        "angle": u(ks[3], -cfg.rotate_deg, cfg.rotate_deg) * math.pi / 180.0,
        # albumentations' Affine translate_percent is symmetric about zero
        "tx": u(ks[4], -cfg.translate_frac, cfg.translate_frac),
        "ty": u(ks[5], -cfg.translate_frac, cfg.translate_frac),
        "do_gamma": jax.random.bernoulli(ks[6], float(cfg.gamma_p)),
        "gamma": u(ks[7], cfg.gamma_range[0], cfg.gamma_range[1]),
        "do_bc": jax.random.bernoulli(ks[8], float(cfg.brightness_contrast_p)),
        "brightness": u(ks[9], -cfg.brightness_limit, cfg.brightness_limit),
        "contrast": u(ks[10], -cfg.contrast_limit, cfg.contrast_limit),
        "do_elastic": jax.random.bernoulli(ks[11], float(cfg.elastic_p)),
    }
    return p


def _inverse_affine(params, H, W):
    """dst→src map coefficients for center-anchored scale+rotation+translate
    (+ optional hflip).  Returns a 2×3 matrix."""
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    s = jnp.where(params["do_affine"], params["scale"], 1.0)
    a = jnp.where(params["do_affine"], params["angle"], 0.0)
    tx = jnp.where(params["do_affine"], params["tx"] * W, 0.0)
    ty = jnp.where(params["do_affine"], params["ty"] * H, 0.0)
    flip = jnp.where(params["do_flip"], -1.0, 1.0)

    cos, sin = jnp.cos(a), jnp.sin(a)
    # forward: p' = R S F (p - c) + c + t  → inverse: p = F⁻¹S⁻¹R⁻¹(p' - c - t) + c
    inv_s = 1.0 / s
    m00 = flip * inv_s * cos
    m01 = flip * inv_s * sin
    m10 = -inv_s * sin
    m11 = inv_s * cos
    ox = -(cx + tx)
    oy = -(cy + ty)
    b0 = m00 * ox + m01 * oy + cx
    b1 = m10 * ox + m11 * oy + cy
    return jnp.array([[m00, m01, b0], [m10, m11, b1]])


def _elastic_field(key, H, W, alpha: float, sigma: float):
    kx, ky = jax.random.split(key)
    radius = max(int(4.0 * sigma), 1)
    ksz = 2 * radius + 1
    k = jnp.asarray(gaussian_kernel1d(ksz, sigma))

    def smooth(f):
        fp = jnp.pad(f, radius, mode="reflect")
        rows = sum(k[i] * fp[i:i + H, :] for i in range(ksz))
        return sum(k[j] * rows[:, j:j + W] for j in range(ksz))

    dx = smooth(jax.random.uniform(kx, (H, W), minval=-1.0, maxval=1.0)) * alpha
    dy = smooth(jax.random.uniform(ky, (H, W), minval=-1.0, maxval=1.0)) * alpha
    return dx, dy


def _warp(img, coords_y, coords_x, order: int):
    return jax.scipy.ndimage.map_coordinates(
        img, [coords_y, coords_x], order=order, mode="constant", cval=0.0)


def _warp_pair_batch(img, mask, sy, sx):
    """Bilinear-warp ``img`` and nearest-warp ``mask`` in one pass.

    All inputs (B, H, W) f32.  Exactly ``map_coordinates(order=1/0,
    mode='constant', cval=0)`` — but as FOUR corner gathers of (img, mask)
    pairs from one flattened operand instead of five separate 2-D gathers:
    measured 0.064 s vs 0.163 s at (8, 512²) on v5e (probe r8c; the warp was
    53 % of the whole train step, probe r8).  The nearest-neighbour corner
    is one of the four bilinear corners, selected with round-half-away-from-
    zero semantics so mask parity with map_coordinates holds bit-exactly.
    """
    B, H, W = img.shape
    pair = jnp.stack([img, mask], axis=-1).reshape(B * H * W, 2)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = sy - y0
    fx = sx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    # order=0 rounds half away from zero (jax _round_half_away_from_zero),
    # NOT banker's rounding
    _r = lambda s: jnp.where(s >= 0, jnp.floor(s + 0.5),
                             jnp.ceil(s - 0.5)).astype(jnp.int32)
    yr = _r(sy)
    xr = _r(sx)
    b = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 0)

    def corner(dy, dx):
        yi = y0i + dy
        xi = x0i + dx
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        flat = (b * H + jnp.clip(yi, 0, H - 1)) * W + jnp.clip(xi, 0, W - 1)
        v = jnp.take(pair, flat, axis=0) * valid[..., None].astype(img.dtype)
        return v, (yi == yr) & (xi == xr)

    (c00, n00), (c01, n01) = corner(0, 0), corner(0, 1)
    (c10, n10), (c11, n11) = corner(1, 0), corner(1, 1)
    wy = fy[..., None]
    wx = fx[..., None]
    warped = (c00 * (1 - wy) * (1 - wx) + c01 * (1 - wy) * wx +
              c10 * wy * (1 - wx) + c11 * wy * wx)
    near = jnp.where(n00, c00[..., 1],
                     jnp.where(n01, c01[..., 1],
                               jnp.where(n10, c10[..., 1], c11[..., 1])))
    return warped[..., 0], near


def _coords_one(key, H, W, cfg: AugmentConfig):
    """Per-image warp coordinates + intensity parameters (vmapped)."""
    kp, ke = jax.random.split(key)
    params = _sample_params(kp, cfg)

    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    M = _inverse_affine(params, H, W)
    sx = M[0, 0] * xs + M[0, 1] * ys + M[0, 2]
    sy = M[1, 0] * xs + M[1, 1] * ys + M[1, 2]

    dx, dy = _elastic_field(ke, H, W, cfg.elastic_alpha, cfg.elastic_sigma)
    use_el = params["do_elastic"].astype(jnp.float32)
    sx = sx + use_el * dx
    sy = sy + use_el * dy

    g = jnp.where(params["do_gamma"], params["gamma"], 1.0)
    alpha = 1.0 + jnp.where(params["do_bc"], params["contrast"], 0.0)
    beta = jnp.where(params["do_bc"], params["brightness"], 0.0) * 255.0
    return sy, sx, g, alpha, beta


def _augment_one(key, img_u8, mask_u8, cfg: AugmentConfig):
    """img, mask: (H, W) uint8 → augmented (H, W) uint8 pair.  (Reference
    path for tests; ``augment_batch`` uses the batched fused-gather warp.)"""
    H, W = img_u8.shape
    sy, sx, g, alpha, beta = _coords_one(key, H, W, cfg)
    img, mask = _warp_pair_batch(img_u8.astype(jnp.float32)[None],
                                 mask_u8.astype(jnp.float32)[None],
                                 sy[None], sx[None])
    img, mask = img[0], mask[0]
    img = _apply_intensity(img, g, alpha, beta)
    return jnp.round(img).astype(jnp.uint8), (mask > 127).astype(jnp.uint8)


def _apply_intensity(img, g, alpha, beta):
    """Gamma then brightness/contrast, albumentations conventions on the
    u8 scale.  g/alpha/beta broadcast over the trailing (H, W) dims."""
    img = jnp.power(jnp.clip(img / 255.0, 0.0, 1.0), g) * 255.0
    return jnp.clip(img * alpha + beta, 0.0, 255.0)


@functools.partial(jax.jit, static_argnames=("cfg", "train"))
def augment_batch(key, images_u8: jax.Array, masks_u8: jax.Array,
                  cfg: AugmentConfig = AugmentConfig(), train: bool = True):
    """(B, S, S) uint8 images + masks → (B, S, S, 1) float [0,1] + {0,1}.

    Geometric+intensity augmentation (train only), then CLAHE + median-3 and
    scaling — the augmented-image path of ``FetalACDataset``.
    """
    if train:
        B, H, W = images_u8.shape
        keys = jax.random.split(key, B)
        sy, sx, g, alpha, beta = jax.vmap(
            lambda k: _coords_one(k, H, W, cfg))(keys)
        img, mask = _warp_pair_batch(images_u8.astype(jnp.float32),
                                     masks_u8.astype(jnp.float32), sy, sx)
        img = _apply_intensity(img, g[:, None, None], alpha[:, None, None],
                               beta[:, None, None])
        images_u8 = jnp.round(img).astype(jnp.uint8)
        masks_u8 = (mask > 127).astype(jnp.uint8)
    else:
        masks_u8 = (masks_u8 > 127).astype(jnp.uint8)
    # deterministic serving-parity tail; cfg.use_clahe=False trains on
    # unequalised input (no-CLAHE cascade scouts)
    enhanced = median3x3(clahe(images_u8, 1.0, (8, 8))
                         if cfg.use_clahe else images_u8)
    x = (enhanced.astype(jnp.float32) / 255.0)[..., None]
    y = masks_u8.astype(jnp.float32)[..., None]
    return x, y
