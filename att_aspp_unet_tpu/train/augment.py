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


def _augment_one(key, img_u8, mask_u8, cfg: AugmentConfig):
    """img, mask: (H, W) uint8 → augmented (H, W) uint8 pair."""
    H, W = img_u8.shape
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

    img = _warp(img_u8.astype(jnp.float32), sy, sx, order=1)
    mask = _warp(mask_u8.astype(jnp.float32), sy, sx, order=0)

    # --- intensity (image only), albumentations conventions on u8 scale ---
    g = jnp.where(params["do_gamma"], params["gamma"], 1.0)
    img = jnp.power(jnp.clip(img / 255.0, 0.0, 1.0), g) * 255.0

    alpha = 1.0 + jnp.where(params["do_bc"], params["contrast"], 0.0)
    beta = jnp.where(params["do_bc"], params["brightness"], 0.0) * 255.0
    img = jnp.clip(img * alpha + beta, 0.0, 255.0)

    return jnp.round(img).astype(jnp.uint8), (mask > 127).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("cfg", "train"))
def augment_batch(key, images_u8: jax.Array, masks_u8: jax.Array,
                  cfg: AugmentConfig = AugmentConfig(), train: bool = True):
    """(B, S, S) uint8 images + masks → (B, S, S, 1) float [0,1] + {0,1}.

    Geometric+intensity augmentation (train only), then CLAHE + median-3 and
    scaling — the augmented-image path of ``FetalACDataset``.
    """
    if train:
        keys = jax.random.split(key, images_u8.shape[0])
        images_u8, masks_u8 = jax.vmap(
            lambda k, i, m: _augment_one(k, i, m, cfg))(keys, images_u8,
                                                        masks_u8)
    else:
        masks_u8 = (masks_u8 > 127).astype(jnp.uint8)
    enhanced = median3x3(clahe(images_u8, 1.0, (8, 8)))
    x = (enhanced.astype(jnp.float32) / 255.0)[..., None]
    y = masks_u8.astype(jnp.float32)[..., None]
    return x, y
