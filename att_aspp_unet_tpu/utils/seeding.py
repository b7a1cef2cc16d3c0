"""Determinism helpers.

The reference threaded seeds through python/numpy/torch/albumentations and an
opt-in cudnn-deterministic mode (``test_ablation.py:45-69``).  In JAX the
model is deterministic by construction: randomness flows only through
explicit PRNG keys, and XLA:TPU kernels are deterministic by default.  What
remains host-side is numpy/python RNG used by the data pipeline.
"""

from __future__ import annotations

import os
import random

import numpy as np


def set_seed(seed: int = 2025) -> None:
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)


def prng_key(seed: int = 2025):
    import jax

    return jax.random.PRNGKey(seed)
