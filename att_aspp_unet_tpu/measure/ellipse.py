"""Direct least-squares ellipse fitting on device + AC measurement.

TPU-native replacement for ``cv2.fitEllipse`` → Ramanujan-II circumference
(``attention_aspp_unet_pipeline_stage.py:355-374``).  cv2 fits Fitzgibbon's
B2AC objective to the traced contour points; we fit the numerically stable
Halir–Flusser formulation to the *boundary-pixel set* of the mask — order
never matters for a least-squares fit, so no tracing is needed and every
quantity reduces to weighted monomial sums over the image grid (pure VPU
reductions, batchable over frames):

1. boundary pixels via 4-neighbour erosion complement,
2. centroid + RMS-radius normalisation (conditioning for f32),
3. scatter blocks S1/S2/S3 from degree-≤4 weighted sums,
4. reduced 3×3 eigenproblem solved with a closed-form cubic (trig/Cardano,
   branchless), eigenvector by cross products, Fitzgibbon constraint
   4ac − b² > 0 selects the ellipse solution,
5. conic → geometric (center, axes, validity).

The reference's ``len(contour) < 5`` fallback (arc length × mean spacing) is
honoured by ``measure_ac_mm`` through the host tracer.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..postprocess.select import boundary_mask


def _real_cubic_roots(p, q, r):
    """Real roots of λ³ + pλ² + qλ + r (3-vector; duplicates if fewer)."""
    # depressed cubic t³ + a t + b with λ = t − p/3
    a = q - p * p / 3.0
    b = 2.0 * p ** 3 / 27.0 - p * q / 3.0 + r
    disc = (b / 2.0) ** 2 + (a / 3.0) ** 3

    # three-real-root (trig) branch — guard the domain for the other branch
    neg_a3 = jnp.maximum(-a / 3.0, 1e-12)
    rho = jnp.sqrt(neg_a3)
    cos_arg = jnp.clip(3.0 * b / (2.0 * a) / rho, -1.0, 1.0)
    theta = jnp.arccos(jnp.where(a < 0, cos_arg, 0.0))
    k = jnp.arange(3, dtype=jnp.float32)
    trig_roots = 2.0 * rho * jnp.cos((theta - 2.0 * math.pi * k) / 3.0)

    # single-real-root (Cardano) branch
    sd = jnp.sqrt(jnp.maximum(disc, 0.0))
    cbrt = lambda v: jnp.sign(v) * jnp.abs(v) ** (1.0 / 3.0)
    t1 = cbrt(-b / 2.0 + sd) + cbrt(-b / 2.0 - sd)
    cardano_roots = jnp.stack([t1, t1, t1])

    t = jnp.where(disc <= 0.0, trig_roots, cardano_roots)
    return t - p / 3.0


def _eigvec_for(M, lam):
    """Null vector of (M − λI) via the best-conditioned row cross product."""
    A = M - lam * jnp.eye(3, dtype=M.dtype)
    c0 = jnp.cross(A[0], A[1])
    c1 = jnp.cross(A[0], A[2])
    c2 = jnp.cross(A[1], A[2])
    cands = jnp.stack([c0, c1, c2])
    norms = jnp.linalg.norm(cands, axis=1)
    v = cands[jnp.argmax(norms)]
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-20)


def _fit_one(weights: jax.Array):
    """Fit an ellipse to weighted pixel positions of one (H, W) weight map.

    Returns (cx, cy, major, minor, valid) in pixel units (full axis lengths).
    """
    H, W = weights.shape
    w = weights.astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    n = jnp.sum(w)
    n_safe = jnp.maximum(n, 1.0)
    cx = jnp.sum(w * xs) / n_safe
    cy = jnp.sum(w * ys) / n_safe
    u0 = xs - cx
    v0 = ys - cy
    s = jnp.sqrt(jnp.maximum(jnp.sum(w * (u0 * u0 + v0 * v0)) / n_safe, 1e-6))
    u = u0 / s
    v = v0 / s

    def m(e1, e2):
        return jnp.sum(w * (u ** e1) * (v ** e2))

    # scatter blocks (Halir–Flusser S1, S2, S3)
    S1 = jnp.array([[m(4, 0), m(3, 1), m(2, 2)],
                    [m(3, 1), m(2, 2), m(1, 3)],
                    [m(2, 2), m(1, 3), m(0, 4)]])
    S2 = jnp.array([[m(3, 0), m(2, 1), m(2, 0)],
                    [m(2, 1), m(1, 2), m(1, 1)],
                    [m(1, 2), m(0, 3), m(0, 2)]])
    S3 = jnp.array([[m(2, 0), m(1, 1), m(1, 0)],
                    [m(1, 1), m(0, 2), m(0, 1)],
                    [m(1, 0), m(0, 1), n]])

    S3r = S3 + 1e-9 * jnp.eye(3)
    T = -jnp.linalg.solve(S3r, S2.T)
    R = S1 + S2 @ T
    C1inv = jnp.array([[0.0, 0.0, 0.5],
                       [0.0, -1.0, 0.0],
                       [0.5, 0.0, 0.0]])
    M = C1inv @ R

    tr = jnp.trace(M)
    minors = (M[0, 0] * M[1, 1] - M[0, 1] * M[1, 0]
              + M[0, 0] * M[2, 2] - M[0, 2] * M[2, 0]
              + M[1, 1] * M[2, 2] - M[1, 2] * M[2, 1])
    det = jnp.linalg.det(M)
    lams = _real_cubic_roots(-tr, minors, -det)

    vecs = jax.vmap(lambda l: _eigvec_for(M, l))(lams)
    kappa = 4.0 * vecs[:, 0] * vecs[:, 2] - vecs[:, 1] ** 2
    best = jnp.argmax(kappa)
    a1 = vecs[best]
    valid_fit = kappa[best] > 1e-12

    a2 = T @ a1
    A, B, C = a1[0], a1[1], a1[2]
    D, E, F = a2[0], a2[1], a2[2]

    # center of the conic in normalised coords
    den = 4.0 * A * C - B * B
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    un = (B * E - 2.0 * C * D) / den
    vn = (B * D - 2.0 * A * E) / den
    mu = A * un * un + B * un * vn + C * vn * vn + D * un + E * vn + F

    # eigen of the quadratic form [[A, B/2], [B/2, C]]
    half = (A + C) / 2.0
    delta = jnp.sqrt(((A - C) / 2.0) ** 2 + (B / 2.0) ** 2)
    l1 = half - delta
    l2 = half + delta
    with_mu = lambda l: jnp.sqrt(jnp.maximum(-mu / jnp.where(
        jnp.abs(l) < 1e-12, 1e-12, l), 0.0))
    semi_a = with_mu(l1)      # along the smaller-eigenvalue direction → major
    semi_b = with_mu(l2)

    major = 2.0 * jnp.maximum(semi_a, semi_b) * s
    minor = 2.0 * jnp.minimum(semi_a, semi_b) * s
    cx_out = cx + un * s
    cy_out = cy + vn * s
    valid = valid_fit & (n >= 5) & jnp.isfinite(major) & jnp.isfinite(minor) \
        & (minor > 0)
    return cx_out, cy_out, major, minor, valid


@jax.jit
def fit_ellipse_mask(masks: jax.Array):
    """Fit ellipses to the boundary pixels of binary masks (..., H, W).

    Returns (cx, cy, major_axis, minor_axis, valid) arrays over the leading
    dims; axes are FULL lengths in pixels (cv2 RotatedRect.size convention).
    """
    b = boundary_mask(masks)
    lead = b.shape[:-2]
    flat = b.reshape((-1,) + b.shape[-2:])
    cx, cy, maj, mnr, valid = jax.vmap(_fit_one)(flat)
    rs = lambda a: a.reshape(lead)
    return rs(cx), rs(cy), rs(maj), rs(mnr), rs(valid)


def ellipse_circumference(a: float, b: float) -> float:
    """Ramanujan's second approximation (``…stage.py:356-358``);
    a, b are SEMI-axes.  NumPy on purpose: callers are host code (the
    serving collect tail, eval CSV writers) where a jnp scalar op would be
    a ~50 ms tunnel dispatch."""
    a, b = np.asarray(a), np.asarray(b)
    h = ((a - b) ** 2) / np.maximum((a + b) ** 2, 1e-12)
    return math.pi * (a + b) * (1.0 + 3.0 * h / (10.0 + np.sqrt(4.0 - 3.0 * h)))


def _fit_ellipse_np(mask: np.ndarray):
    """Host twin of the device fit: same Halir–Flusser reduced formulation
    over the same 4-neighbour boundary-pixel set, in float64 numpy.

    Exists because the serving loop measures ONE mask per sweep on the host
    tail — routing that through the jitted ``fit_ellipse_mask`` costs a
    device dispatch (~50 ms tunnel round trip, and it queues behind the next
    sweep's program: probe r17 measured 220 ms per call, the entire
    pipelined-vs-dispatch-only e2e gap).  K boundary points → ~15 monomial
    sums; microseconds on the host.

    Returns (cx, cy, major, minor, valid); axes are FULL lengths in pixels.
    """
    m = np.asarray(mask) > 0
    fp = np.pad(m, 1)
    interior = (fp[:-2, 1:-1] & fp[2:, 1:-1]
                & fp[1:-1, :-2] & fp[1:-1, 2:])
    ys, xs = np.nonzero(m & ~interior)
    n = xs.size
    if n < 5:
        return 0.0, 0.0, 0.0, 0.0, False
    x = xs.astype(np.float64)
    y = ys.astype(np.float64)
    cx = x.mean()
    cy = y.mean()
    u0 = x - cx
    v0 = y - cy
    s = math.sqrt(max(np.mean(u0 * u0 + v0 * v0), 1e-6))
    u = u0 / s
    v = v0 / s

    def msum(e1, e2):
        return float(np.sum(u ** e1 * v ** e2))

    S1 = np.array([[msum(4, 0), msum(3, 1), msum(2, 2)],
                   [msum(3, 1), msum(2, 2), msum(1, 3)],
                   [msum(2, 2), msum(1, 3), msum(0, 4)]])
    S2 = np.array([[msum(3, 0), msum(2, 1), msum(2, 0)],
                   [msum(2, 1), msum(1, 2), msum(1, 1)],
                   [msum(1, 2), msum(0, 3), msum(0, 2)]])
    S3 = np.array([[msum(2, 0), msum(1, 1), msum(1, 0)],
                   [msum(1, 1), msum(0, 2), msum(0, 1)],
                   [msum(1, 0), msum(0, 1), float(n)]])
    T = -np.linalg.solve(S3 + 1e-9 * np.eye(3), S2.T)
    R = S1 + S2 @ T
    C1inv = np.array([[0.0, 0.0, 0.5],
                      [0.0, -1.0, 0.0],
                      [0.5, 0.0, 0.0]])
    M = C1inv @ R

    lams, vecs = np.linalg.eig(M)
    real = np.abs(lams.imag) < 1e-8 * (1.0 + np.abs(lams.real))
    vr = vecs.real
    kappa = 4.0 * vr[0] * vr[2] - vr[1] ** 2
    kappa = np.where(real, kappa, -np.inf)
    best = int(np.argmax(kappa))
    if not (kappa[best] > 1e-12):
        return 0.0, 0.0, 0.0, 0.0, False
    a1 = vr[:, best]
    a2 = T @ a1
    A, B, C = a1
    D, E, F = a2

    den = 4.0 * A * C - B * B
    if abs(den) < 1e-12:
        den = 1e-12
    un = (B * E - 2.0 * C * D) / den
    vn = (B * D - 2.0 * A * E) / den
    mu = A * un * un + B * un * vn + C * vn * vn + D * un + E * vn + F

    half = (A + C) / 2.0
    delta = math.sqrt(((A - C) / 2.0) ** 2 + (B / 2.0) ** 2)

    def semi(l):
        l = l if abs(l) >= 1e-12 else 1e-12
        return math.sqrt(max(-mu / l, 0.0))

    semi_a = semi(half - delta)
    semi_b = semi(half + delta)
    major = 2.0 * max(semi_a, semi_b) * s
    minor = 2.0 * min(semi_a, semi_b) * s
    valid = (math.isfinite(major) and math.isfinite(minor) and minor > 0)
    return cx + un * s, cy + vn * s, major, minor, valid


def measure_ac_mm(mask: np.ndarray, spacing: Tuple[float, float]) -> float:
    """Abdominal circumference in mm of a single binary mask.

    Ellipse fit when ≥5 boundary pixels support it; otherwise the
    reference's fallback: traced-contour arc length × mean spacing.  Empty
    mask → 0.0 (``…stage.py:359-374``).

    HOST code throughout (``_fit_ellipse_np``): this runs in the serving
    loop's collect tail once per sweep, where any jnp op is a tunnel
    dispatch that queues behind the next sweep's device program (probe r17:
    220 ms/call through the jitted fit — the whole pipelined e2e gap).  The
    batched device fit (``fit_ellipse_mask``) stays for stack-at-once use.
    """
    m = np.asarray(mask)
    if (m > 0).sum() == 0:
        return 0.0
    # cv2 fits the LARGEST external contour; restrict to the largest
    # component so stray blobs don't perturb the fit (the refine pipeline
    # already guarantees a single component, this covers raw masks)
    from scipy import ndimage as ndi

    labels, n = ndi.label(m > 0, structure=np.ones((3, 3), np.uint8))
    if n > 1:
        sizes = np.bincount(labels.ravel())
        sizes[0] = 0
        m = (labels == sizes.argmax()).astype(np.uint8)
    cx, cy, major, minor, valid = _fit_ellipse_np(m)
    if valid:
        a_mm = major / 2.0 * float(spacing[0])
        b_mm = minor / 2.0 * float(spacing[1])
        return float(ellipse_circumference(a_mm, b_mm))
    from .contour import arc_length, trace_contour
    c = trace_contour(m)
    return arc_length(c, closed=True) * float(sum(spacing) / 2.0)
