"""Probe r15c — the width-to-depth conv drop-in: exactness + speed.

Probe r15b showed a dense 3x3 conv at (512, 256, C96) runs 1.76x faster
than the SAME work at (512, 512, C48): C=48 fills 48/128 MXU lanes.  In
NHWC, (B, H, W, C) -> (B, H, W/2, 2C) is a flat reinterpret (row-major:
((bH+h)W+w)C+c groups w=2w'+p into (p*C+c)), so the lowering is a pure
reshape + a re-indexed weight:

    W'[dy, 0, ci+C, co    ] = W[dy, 0, ci, co]
    W'[dy, 1, ci,   co    ] = W[dy, 1, ci, co]
    W'[dy, 1, ci+C, co    ] = W[dy, 2, ci, co]
    W'[dy, 1, ci,   co+Co ] = W[dy, 0, ci, co]
    W'[dy, 1, ci+C, co+Co ] = W[dy, 1, ci, co]
    W'[dy, 2, ci,   co+Co ] = W[dy, 2, ci, co]     (all other entries 0)

(derivation: output column 2w'+q tap dx reads original column
2w'+q+dx-1 = 2(w'+d)+p; SAME zero-padding maps exactly because the only
out-of-range cell slots touched have zero weights).  Numerically EXACT —
same taps, same dtype; only the contraction adds zero terms.

This probe (a) asserts the drop-in matches lax direct conv bitwise-close
on every target shape, (b) times the FULL drop-in (reshapes + on-the-fly
weight transform + conv) vs direct at the flagship's 512-level shapes and
the baseline nnU-Net's C32/C64 stages.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from perf_probe_r15_int8 import K, loop_op, timed  # noqa: E402


def w2d_weight(w):
    """(3, 3, C, Co) HWIO -> (3, 3, 2C, 2Co) width-to-depth equivalent."""
    import jax.numpy as jnp

    _, _, C, Co = w.shape
    w2 = jnp.zeros((3, 3, 2 * C, 2 * Co), w.dtype)
    w2 = w2.at[:, 0, C:, :Co].set(w[:, 0])
    w2 = w2.at[:, 1, :C, :Co].set(w[:, 1])
    w2 = w2.at[:, 1, C:, :Co].set(w[:, 2])
    w2 = w2.at[:, 1, :C, Co:].set(w[:, 0])
    w2 = w2.at[:, 1, C:, Co:].set(w[:, 1])
    w2 = w2.at[:, 2, :C, Co:].set(w[:, 2])
    return w2


def conv_w2d(x, w):
    import jax.numpy as jnp
    from jax import lax

    B, H, W, C = x.shape
    Co = w.shape[-1]
    x2 = x.reshape(B, H, W // 2, 2 * C)
    dn = lax.conv_dimension_numbers(x2.shape, (3, 3, 2 * C, 2 * Co),
                                    ("NHWC", "HWIO", "NHWC"))
    y2 = lax.conv_general_dilated(x2, w2d_weight(w), (1, 1), "SAME",
                                  dimension_numbers=dn,
                                  preferred_element_type=jnp.float32)
    return y2.reshape(B, H, W, Co)


def conv_direct(x, w):
    import jax.numpy as jnp
    from jax import lax

    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                    dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    print(f"[r15c] backend={jax.default_backend()} B={args.batch}",
          file=sys.stderr)
    rng = np.random.default_rng(0)

    # ---- exactness on a small odd-content shape -------------------------
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 5, 7)), jnp.bfloat16)
    # pad channels to even? w2d needs no channel constraint, only W even
    y_ref = np.asarray(conv_direct(x, w))
    y_w2d = np.asarray(conv_w2d(x, w))
    err = np.abs(y_ref - y_w2d).max()
    print(f"[r15c] exactness (2,8,12,5)->7: max|err| = {err:.2e}")
    assert err < 1e-2, err

    B = args.batch
    shapes = (
        # label,                 H,   W,  Cin, Cout
        ("flagship d1/u1 48->48", 512, 512, 48, 48),
        ("flagship u1 96->48  ", 512, 512, 96, 48),
        ("baseline  32->32    ", 448, 576, 32, 32),
        ("baseline  64->64    ", 224, 288, 64, 64),
    )
    for label, H, W, Ci, Co in shapes:
        x = jnp.asarray(rng.standard_normal((B, H, W, Ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)), jnp.bfloat16)
        e = np.abs(np.asarray(conv_direct(x[:1], w))
                   - np.asarray(conv_w2d(x[:1], w))).max()
        # when Cin != Cout the loop needs the output fed back at Cin — a
        # channel concat per iteration, identical for both variants
        rs = (None if Ci == Co
              else (lambda o: jnp.concatenate([o, o], axis=-1)))
        td = timed(loop_op(conv_direct, reshape=rs), x, w,
                   iters=args.iters) / (K + 1)
        tw = timed(loop_op(conv_w2d, reshape=rs), x, w,
                   iters=args.iters) / (K + 1)
        flop = 2 * B * H * W * 9 * Ci * Co / 1e12
        print(f"[r15c] {label} direct {td*1e3:6.2f} ms ({flop/td:5.1f} TF/s)"
              f"   w2d {tw*1e3:6.2f} ms ({flop/tw:5.1f} TF/s-eff)"
              f"   x{td/tw:4.2f}   max|err|={e:.2e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
