"""Mesh + sharding utilities.

The reference is single-device (SURVEY.md §2 parallelism table: no DDP, no
collectives anywhere); the TPU framework makes data parallelism first-class:
frames of a sweep (inference) or samples of a batch (training) shard over the
``data`` axis of a ``jax.sharding.Mesh``, gradients/batch-stats reduce over
ICI via the collectives GSPMD inserts.  A ``model`` axis exists so tensor
parallelism is *expressible*, but at ~30 M parameters it stays size 1
(SURVEY.md §2: "design mesh axes so TP is expressible but unused").

One chip and N chips run identical code: the mesh is built from whatever
``jax.devices()`` offers.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devs = list(devices if devices is not None else jax.devices())
    mp = max(1, cfg.model_parallelism)
    if len(devs) % mp:
        raise ValueError(f"{len(devs)} devices not divisible by "
                         f"model_parallelism={mp}")
    arr = np.array(devs).reshape(len(devs) // mp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def make_mesh_for_batch(cfg: MeshConfig, batch_size: int,
                        devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh whose data axis divides ``batch_size`` (subsets devices if the
    full count doesn't divide the batch — e.g. batch 4 on 8 chips)."""
    devs = list(devices if devices is not None else jax.devices())
    mp = max(1, cfg.model_parallelism)
    avail = len(devs) // mp
    data = max(d for d in range(1, avail + 1) if batch_size % d == 0)
    return make_mesh(cfg, devs[: data * mp])


def batch_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard dimension ``axis`` of an ndim-array over the data axis."""
    spec = [None] * ndim
    spec[axis] = mesh.axis_names[0]
    return NamedSharding(mesh, P(*spec))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of arrays with the leading axis sharded over
    ``data``.  Leading dims must divide the data-axis size."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch)


def shard_params(mesh: Mesh, params):
    """Replicate parameters/opt-state across the mesh (DP layout)."""
    rep = replicate(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), params)


def pad_to_multiple(n: int, m: int) -> int:
    """Frames per sweep rarely divide the chip count — pad the frame axis to
    the next multiple (masked out downstream) to keep shardings even."""
    return ((n + m - 1) // m) * m
