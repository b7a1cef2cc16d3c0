"""Compact flat-npz weight archives.

``benchmarks/train_synthetic_tpu.py`` exports trained variables as one
float16 ``.npz`` whose keys are ``params/<module>/.../<leaf>`` and
``batch_stats/...`` — 3× smaller than an Orbax directory and a single file,
so a trained flagship checkpoint can live in the repo
(``resources/synthetic/weights.npz``) for bench realism.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict

import numpy as np


def save_npz_variables(variables: Dict, path) -> None:
    import jax

    flat = {}
    for tree_name in ("params", "batch_stats"):
        leaves = jax.tree_util.tree_flatten_with_path(
            variables.get(tree_name, {}))[0]
        for path_t, leaf in leaves:
            key = tree_name + "/" + "/".join(
                getattr(p, "key", str(p)) for p in path_t)
            flat[key] = np.asarray(leaf, np.float16)
    np.savez_compressed(path, **flat)


def load_npz_variables(path) -> Dict:
    """Rebuild {"params": nested, "batch_stats": nested} (float32 leaves)."""
    out: Dict = {"params": {}, "batch_stats": {}}
    with np.load(Path(path)) as z:
        for key in z.files:
            parts = key.split("/")
            node = out[parts[0]]
            for p in parts[1:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key].astype(np.float32)
    return out
