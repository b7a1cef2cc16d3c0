"""Binary morphology as convolution counts — MXU/VPU-friendly.

Dilation = "any foreground under the footprint", erosion = "no background
under the footprint"; both are thresholded box correlations with the
structuring element, so a whole sweep dilates in one fused XLA program.
Border semantics follow the ops the reference used:

- ``binary_dilation``: outside-image = background (scipy.ndimage default,
  used in ``model_attention_aspp.py:80-81``);
- ``binary_erosion`` (within closing): outside-image = foreground (OpenCV's
  replicated border for erode, so ``cv2.morphologyEx(..., MORPH_CLOSE)``
  never eats the image edge — ``…stage.py:347``);
- ``fill_holes``: scipy ``binary_fill_holes`` with its default cross
  structure — background 4-connected to the border stays background, enclosed
  background flips to foreground.  Implemented with the same segmented-scan
  propagation as the CC labeler (seeds = border background).

These are plain traceable functions — call them under an outer ``jax.jit``
(the refine/postprocess pipelines do).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .cc import _fixed_point, _make_propagate


def structuring_ellipse(ksize: int) -> np.ndarray:
    """cv2.getStructuringElement(MORPH_ELLIPSE, (k, k)) — row-span rule."""
    r = c = ksize // 2
    inv_r2 = 1.0 / (r * r) if r else 0.0
    el = np.zeros((ksize, ksize), np.uint8)
    for i in range(ksize):
        dy = i - r
        if abs(dy) <= r:
            dx = int(round(c * np.sqrt(max(r * r - dy * dy, 0) * inv_r2)))
            j1, j2 = max(c - dx, 0), min(c + dx + 1, ksize)
            el[i, j1:j2] = 1
    return el


def _footprint_correlate(x: jax.Array, footprint: np.ndarray,
                         pad_value: float = 0.0) -> jax.Array:
    """Correlate (..., H, W) float with a small static 0/1 footprint."""
    footprint = np.asarray(footprint)
    kh, kw = footprint.shape
    ph, pw = kh // 2, kw // 2
    lead = x.shape[:-2]
    H, W = x.shape[-2], x.shape[-1]
    xr = x.reshape((-1, H, W))
    xp = jnp.pad(xr, ((0, 0), (ph, kh - 1 - ph), (pw, kw - 1 - pw)),
                 constant_values=pad_value)
    out = None
    for i in range(kh):
        for j in range(kw):
            if footprint[i, j]:
                term = xp[:, i:i + H, j:j + W]
                out = term if out is None else out + term
    return out.reshape(lead + (H, W))


def binary_dilation(mask: jax.Array, footprint: np.ndarray = None,
                    iterations: int = 1) -> jax.Array:
    fp = np.ones((3, 3), np.uint8) if footprint is None else np.asarray(footprint)
    m = (mask > 0).astype(jnp.float32)
    for _ in range(iterations):
        m = (_footprint_correlate(m, fp) > 0).astype(jnp.float32)
    return m.astype(jnp.uint8)


def binary_erosion(mask: jax.Array, footprint: np.ndarray = None,
                   border_foreground: bool = True) -> jax.Array:
    """Erode; ``border_foreground=True`` gives OpenCV's closing semantics
    (the out-of-image region never erodes the edge)."""
    fp = np.ones((3, 3), np.uint8) if footprint is None else np.asarray(footprint)
    bg = 1.0 - (mask > 0).astype(jnp.float32)
    pad = 0.0 if border_foreground else 1.0
    cnt = _footprint_correlate(bg, fp, pad_value=pad)
    return ((cnt == 0) & (mask > 0)).astype(jnp.uint8)


def binary_closing(mask: jax.Array, footprint: np.ndarray) -> jax.Array:
    """cv2.morphologyEx(MORPH_CLOSE): dilate then erode (OpenCV borders)."""
    return binary_erosion(binary_dilation(mask, footprint), footprint,
                          border_foreground=True)


@functools.partial(jax.jit, static_argnames=("max_iters",))
def fill_holes(mask: jax.Array, max_iters: int = 64) -> jax.Array:
    """scipy.ndimage.binary_fill_holes equivalent (4-connected background).

    Hole filling IS a connected-components question — which background
    pixels reach the border — so this reuses the CC labeler's min-propagation
    machinery (``cc._make_propagate``, 4-connectivity = segmented scans only,
    no shifts): border background seeds 0, interior background 1, foreground
    is the wall; after the fixed point, background still holding 1 is
    enclosed and flips to foreground.
    """
    fg = mask.astype(bool)
    H, W = fg.shape[-2], fg.shape[-1]
    bg = ~fg

    border = jnp.zeros((H, W), bool).at[0, :].set(True).at[-1, :].set(True) \
        .at[:, 0].set(True).at[:, -1].set(True)
    seed = jnp.where(bg & border, jnp.int32(0), jnp.int32(1))
    seed = jnp.where(bg, seed, jnp.int32(2 ** 30))      # fg = +inf wall

    propagate = _make_propagate(bg, ndim=2, connectivity=4)
    vals = _fixed_point(propagate, seed, max_iters)
    unreachable_bg = bg & (vals == 1)
    return (fg | unreachable_bg).astype(jnp.uint8)
