"""Pallas kernels (interpret mode on CPU) vs their XLA formulations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from att_aspp_unet_tpu.ops.pallas.clahe_interp import (
    clahe_interp_pallas, clahe_interp_pallas_batched)


@pytest.mark.parametrize("kernel", [clahe_interp_pallas,
                                    clahe_interp_pallas_batched])
def test_clahe_interp_matches_gather(rng, kernel):
    N, B, P = 2, 6, 64
    blocks = (rng.random((N, B, P)) * 256).astype(np.int32)
    luts = np.sort((rng.random((N, B, 256, 4)) * 255).round(), axis=2
                   ).astype(np.float32)
    wts = rng.random((P, 4)).astype(np.float32)
    wts = wts / wts.sum(axis=1, keepdims=True)

    got = np.asarray(kernel(jnp.asarray(blocks), jnp.asarray(luts),
                            jnp.asarray(wts), interpret=True))

    want = np.zeros((N, B, P), np.float32)
    for n in range(N):
        for b in range(B):
            g = luts[n, b][blocks[n, b]]            # (P, 4)
            want[n, b] = (g * wts).sum(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_clahe_interp_matches_xla(rng):
    N, B, P = 2, 6, 64
    blocks = (rng.random((N, B, P)) * 256).astype(np.int32)
    luts = np.sort((rng.random((N, B, 256, 4)) * 255).round(), axis=2
                   ).astype(np.float32)
    wts = rng.random((P, 4)).astype(np.float32)
    wts = wts / wts.sum(axis=1, keepdims=True)

    got = np.asarray(clahe_interp_pallas(jnp.asarray(blocks),
                                         jnp.asarray(luts), jnp.asarray(wts),
                                         interpret=True))

    # direct gather reference
    want = np.zeros((N, B, P), np.float32)
    for n in range(N):
        for b in range(B):
            g = luts[n, b][blocks[n, b]]            # (P, 4)
            want[n, b] = (g * wts).sum(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_clahe_pallas_path_equals_xla_path(rng):
    """Full clahe() with use_pallas (interpreted via forced flag) ==
    the lax.map one-hot path, bit for bit."""
    from att_aspp_unet_tpu.ops import clahe
    from jax.experimental.pallas import tpu as pltpu

    frames = (rng.random((2, 40, 48)) * 255).astype(np.uint8)
    ref = np.asarray(clahe(frames, 1.0, (8, 8), use_pallas=False))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(clahe(frames, 1.0, (8, 8), use_pallas=True))
    np.testing.assert_array_equal(got, ref)
