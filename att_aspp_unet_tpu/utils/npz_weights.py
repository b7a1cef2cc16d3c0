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
    """params/batch_stats leaves store as f16; any other collection (e.g.
    the int8-PTQ ``quant`` calibration scales) keeps its exact dtype so a
    calibrated deployment reproduces bit-identically across runs."""
    import jax

    flat = {}
    for tree_name, tree in variables.items():
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        narrow = tree_name in ("params", "batch_stats")
        for path_t, leaf in leaves:
            key = tree_name + "/" + "/".join(
                getattr(p, "key", str(p)) for p in path_t)
            arr = np.asarray(leaf)
            # integer leaves (pre-quantized int8 kernels) keep their exact
            # dtype — narrowing only applies to float leaves
            flat[key] = (arr.astype(np.float16)
                         if narrow and np.issubdtype(arr.dtype, np.floating)
                         else arr)
    np.savez_compressed(path, **flat)


def load_npz_variables(path) -> Dict:
    """Rebuild the nested collections; params/batch_stats leaves widen to
    float32, other collections (``quant``, …) keep their stored dtype."""
    out: Dict = {"params": {}, "batch_stats": {}}
    with np.load(Path(path)) as z:
        for key in z.files:
            parts = key.split("/")
            node = out.setdefault(parts[0], {})
            for p in parts[1:-1]:
                node = node.setdefault(p, {})
            leaf = z[key]
            if (parts[0] in ("params", "batch_stats")
                    and np.issubdtype(leaf.dtype, np.floating)):
                leaf = leaf.astype(np.float32)
            node[parts[-1]] = leaf
    return out
