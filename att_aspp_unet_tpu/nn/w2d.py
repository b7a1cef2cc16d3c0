"""Width-to-depth (w2d) lowering for 3×3 stride-1 convolutions.

The MXU multiplies 128-lane operands; a conv's output channels ride the
lane dimension, so the flagship's 48-channel full-resolution stages fill
48/128 lanes and measure ~20 TF/s bf16 — while the *same arithmetic* at
(H, W/2, 2C) measures ~71 TF/s (probe r15b).  In NHWC row-major,

    (B, H, W, C) → (B, H, W//2, 2C)

is a flat reinterpret — element (b, h, 2w'+p, c) lands at channel p·C+c of
cell (b, h, w') — so the lowering is a reshape plus a re-indexed weight,
and it is numerically EXACT: the packed conv computes the same products
(plus zero-weight terms) with f32 MXU accumulation either way.

Derivation of the packed weight: output column 2w'+q, tap dx ∈ {0,1,2}
reads original column 2w'+q+dx−1 = 2(w'+d)+p with

    q=0: dx→(d,p) = 0→(−1,1), 1→(0,0), 2→(0,1)
    q=1: dx→(d,p) = 0→(0,0),  1→(0,1), 2→(1,0)

giving a 3-wide packed kernel W'[dy, d+1, p·C+ci, q·Co+co] with half its
entries zero.  SAME zero-padding maps exactly: the only out-of-range cell
slots a border output touches carry zero weights.

Measured (v5e, probe r15c, batch 16): isolated in a fori_loop the drop-in
wins big (48→48 @512²: ×1.40; 32→32 @448×576: ×1.43) — but embedded in
the real model it LOSES (flagship forward 85 → 137 ms/16 frames).
Autopsy: XLA pads the NHWC minor dim to lane boundaries, so the
"free" logical reshape between a 48-channel and a 96-channel layout is a
physical relayout of the whole activation; in the loop probe the
unpack-of-iteration-i cancelled against pack-of-iteration-i+1, which is
the STAGE-RESIDENT case, not the drop-in case.  Per-conv drop-in pays
two relayouts every conv and the relayouts cost more than the lane fill
buys.

Hence this lowering ships as an exactness-tested OPT-IN (config default
is "direct"): it only pays if a whole stage — convs, norms, activations —
stays resident in the packed layout, with pack/unpack amortized at stage
boundaries.  The profitability gate below encodes the isolated-conv win
region (≤96 packed lanes) for that future use.

Reference counterpart: none — this is a TPU-specific lowering of the
reference's plain ``nn.Conv2d(…, 3, padding=1)`` layers
(``attention_aspp_unet_pipeline_stage.py:59-65``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["w2d_pack_weight", "w2d_pack_in_weight", "w2d_group_perm",
           "conv3x3_w2d", "w2d_profitable", "w2d_structural"]


def w2d_pack_weight(w: jax.Array) -> jax.Array:
    """(3, 3, C, Co) HWIO → (3, 3, 2C, 2Co) width-packed equivalent."""
    _, _, C, Co = w.shape
    w2 = jnp.zeros((3, 3, 2 * C, 2 * Co), w.dtype)
    w2 = w2.at[:, 0, C:, :Co].set(w[:, 0])
    w2 = w2.at[:, 1, :C, :Co].set(w[:, 1])
    w2 = w2.at[:, 1, C:, :Co].set(w[:, 2])
    w2 = w2.at[:, 1, :C, Co:].set(w[:, 0])
    w2 = w2.at[:, 1, C:, Co:].set(w[:, 1])
    w2 = w2.at[:, 2, :C, Co:].set(w[:, 2])
    return w2


def w2d_pack_in_weight(w: jax.Array) -> jax.Array:
    """(3, 3, Ci, Co) → (3, 4, Ci, 2Co): the PACK-EMITTING conv weight.

    A stride-(1,2) conv with this width-4 kernel (padding 1 each side)
    maps an UNPACKED input directly to the packed layout: output cell
    (h, w', p·Co+co) is the original stride-1 SAME conv's output column
    2w'+p.  Used at the d1 input conv, where packing costs nothing
    because the conv computes into the packed layout to begin with.
    Derivation: window cols are 2w'−1+e (e ∈ 0..3, left pad 1) and the
    original tap dx = e−p−1, so W[:, p+j, :, p·Co+co] = w[:, j, :, co].
    """
    _, _, ci, co = w.shape
    w4 = jnp.zeros((3, 4, ci, 2 * co), w.dtype)
    for p in (0, 1):
        for j in range(3):
            w4 = w4.at[:, p + j, :, p * co:(p + 1) * co].add(w[:, j])
    return w4


def w2d_group_perm(c: int) -> "jax.Array":
    """Input-channel permutation absorbing a packed concat into the
    packed-conv kernel.

    ``concat([a_packed, b_packed])`` carries groups [a_p0, a_p1, b_p0,
    b_p1]·c, while :func:`w2d_pack_weight` of the logical (3,3,2c,·)
    kernel expects [p0·(a,b), p1·(a,b)].  Indexing the packed kernel's
    input axis with this permutation makes it consume the concat order
    directly — free at trace time, no activation shuffle.
    """
    import numpy as np
    return np.concatenate([np.arange(0, c), np.arange(2 * c, 3 * c),
                           np.arange(c, 2 * c), np.arange(3 * c, 4 * c)])


def conv3x3_w2d(x: jax.Array, w: jax.Array) -> jax.Array:
    """3×3 stride-1 SAME conv of NHWC ``x`` by HWIO ``w`` via width
    packing.  Requires even W; output dtype follows x (MXU accumulation is
    f32 internally either way, as with the direct lowering)."""
    B, H, W, C = x.shape
    Co = w.shape[-1]
    x2 = x.reshape(B, H, W // 2, 2 * C)
    dn = lax.conv_dimension_numbers(x2.shape, (3, 3, 2 * C, 2 * Co),
                                    ("NHWC", "HWIO", "NHWC"))
    y2 = lax.conv_general_dilated(x2, w2d_pack_weight(w), (1, 1), "SAME",
                                  dimension_numbers=dn)
    return y2.reshape(B, H, W, Co)


def w2d_structural(x_shape: Sequence[int], kernel: int,
                   stride: int = 1) -> bool:
    """Is the w2d lowering *valid* for this call? (3×3, stride 1, even W —
    the packed-weight derivation covers exactly this case)."""
    return kernel == 3 and stride == 1 and x_shape[-2] % 2 == 0


def w2d_profitable(cin: int, cout: int) -> bool:
    """Is it *faster*?  Both packed operand widths must stay within the
    measured win region (≤96 lanes, probe r15c), and the contraction must
    be non-trivial (cin≥16 — the 1→C input convs are bandwidth-bound and
    unmeasured)."""
    return cin >= 16 and 2 * max(cin, cout) <= 96


def resolve_w2d(lowering: str, x_shape: Sequence[int], kernel: int,
                cin: int, cout: int, stride: int = 1) -> bool:
    """Trace-time lowering decision.

    - ``"direct"``: never.
    - ``"w2d"``: whenever structurally valid (used by tests to force the
      packed path on CPU).
    - ``"auto"``: structurally valid AND profitable AND running on TPU
      (on CPU/GPU backends the packed conv is pure FLOP inflation).
    """
    if lowering != "auto" and lowering != "w2d":
        return False
    if not w2d_structural(x_shape, kernel, stride):
        return False
    if lowering == "w2d":
        return True
    return (w2d_profitable(cin, cout)
            and jax.default_backend() == "tpu")
