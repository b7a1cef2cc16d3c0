"""Import nnU-Net v2 PlainConvUNet checkpoints into the flax baseline model.

The reference's baseline path loads
``resources/nnUNet_results/.../fold_0/checkpoint_final.pth`` through
``nnUNetPredictor`` (``/root/reference/model.py:52-57``).  This maps that
state-dict layout onto :class:`att_aspp_unet_tpu.models.PlainConvUNet`:

torch (nnunetv2)                                  flax
------------------------------------------------  -------------------------
encoder.stages.{s}.0.convs.{c}.conv.{weight,bias} enc{s}_{c}/conv
encoder.stages.{s}.0.convs.{c}.norm.{weight,bias} enc{s}_{c}/norm (InstanceNorm)
decoder.transpconvs.{i}.{weight,bias}             up{s}      (s = n−2−i)
decoder.stages.{i}.convs.{c}.conv/norm            dec{s}_{c} (s = n−2−i)
decoder.seg_layers.[-1].{weight,bias}             seg_head   (full-res head)

Checkpoint containers ``{"network_weights": ...}`` (nnU-Net trainer output)
and ``{"state_dict": ...}`` are unwrapped; ``_orig_mod.`` (torch.compile) and
``module.`` (DDP) prefixes are stripped.
"""

from __future__ import annotations

import dataclasses
import json
import re
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import PlainUNetConfig
from .torch_import import _conv_w, _convT_w, _deep_dict, _set


def load_plans_config(plans_path, configuration: str = "2d",
                      dataset_json: Optional[Path] = None,
                      base: Optional[PlainUNetConfig] = None
                      ) -> PlainUNetConfig:
    """Build a :class:`PlainUNetConfig` from an nnU-Net v2 ``plans.json``.

    The reference configures its predictor from
    ``resources/.../plans.json`` at runtime (``/root/reference/model.py:35-
    60``; plan values at ``plans.json:26-49``).  This maps the plan onto the
    flax model config so an imported checkpoint with a *different* plan
    (patch size, stages, features) builds the matching architecture instead
    of silently using the hardcoded defaults.

    ``dataset_json`` (nnU-Net's ``dataset.json`` next to the plan) supplies
    ``num_classes`` (#labels) and ``in_channels`` (#channel_names); without
    it those stay at ``base``'s values.
    """
    plans = json.loads(Path(plans_path).read_text())
    try:
        c = plans["configurations"][configuration]
    except KeyError as e:
        raise KeyError(
            f"configuration {configuration!r} not in plans "
            f"(have {sorted(plans.get('configurations', {}))})") from e

    arch = c.get("UNet_class_name", "PlainConvUNet")
    if arch != "PlainConvUNet":
        raise ValueError(f"unsupported architecture {arch!r} "
                         "(only PlainConvUNet plans are importable)")
    enc = list(c["n_conv_per_stage_encoder"])
    if len(set(enc)) != 1:
        raise ValueError(f"non-uniform convs per stage unsupported: {enc}")
    for k in c.get("conv_kernel_sizes", []):
        if tuple(k) != (3, 3):
            raise ValueError(f"non-3x3 conv kernels unsupported: "
                             f"{c['conv_kernel_sizes']}")
    pools = [tuple(p) for p in c.get("pool_op_kernel_sizes", [])]
    if pools and (pools[0] != (1, 1) or any(p != (2, 2) for p in pools[1:])):
        raise ValueError(f"unsupported pooling layout: {pools}")

    kw = dict(
        base_c=int(c["UNet_base_num_features"]),
        max_c=int(c.get("unet_max_num_features", 512)),
        n_stages=len(enc),
        conv_per_stage=int(enc[0]),
        patch_size=tuple(int(v) for v in c["patch_size"]),
    )
    if dataset_json is not None:
        ds = json.loads(Path(dataset_json).read_text())
        if "labels" in ds:
            kw["num_classes"] = len(ds["labels"])
        if "channel_names" in ds:
            kw["in_channels"] = len(ds["channel_names"])
    return dataclasses.replace(base or PlainUNetConfig(), **kw)


def normalize_nnunet_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    for container in ("network_weights", "state_dict"):
        if container in sd and isinstance(sd[container], dict):
            sd = sd[container]
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^(module\.|_orig_mod\.)", "", k)
        out[k] = v
    return out


def convert_nnunet_state_dict(sd: Dict[str, np.ndarray], cfg: PlainUNetConfig,
                              variables: dict, verbose: bool = True) -> dict:
    """Fill an initialised flax PlainConvUNet variables tree (non-strict)."""
    import jax

    sd = {k: np.asarray(v) for k, v in normalize_nnunet_state_dict(sd).items()}
    out = {"params": _deep_dict(jax.tree_util.tree_map(np.asarray,
                                                       variables)["params"])}

    used = set()
    missing: List[str] = []

    def put(tkey: str, fpath: str, conv=None):
        if tkey in sd:
            v = sd[tkey]
            if conv is not None:
                v = conv(v)
            if _set(out["params"], fpath, v):
                used.add(tkey)
        else:
            missing.append(tkey)

    n = cfg.n_stages
    for s in range(n):
        for c in range(cfg.conv_per_stage):
            base = f"encoder.stages.{s}.0.convs.{c}"
            put(f"{base}.conv.weight", f"enc{s}_{c}/conv/kernel", _conv_w)
            put(f"{base}.conv.bias", f"enc{s}_{c}/conv/bias")
            put(f"{base}.norm.weight", f"enc{s}_{c}/norm/scale")
            put(f"{base}.norm.bias", f"enc{s}_{c}/norm/bias")

    for i in range(n - 1):
        s = n - 2 - i
        put(f"decoder.transpconvs.{i}.weight", f"up{s}/kernel", _convT_w)
        put(f"decoder.transpconvs.{i}.bias", f"up{s}/bias")
        for c in range(cfg.conv_per_stage):
            base = f"decoder.stages.{i}.convs.{c}"
            put(f"{base}.conv.weight", f"dec{s}_{c}/conv/kernel", _conv_w)
            put(f"{base}.conv.bias", f"dec{s}_{c}/conv/bias")
            put(f"{base}.norm.weight", f"dec{s}_{c}/norm/scale")
            put(f"{base}.norm.bias", f"dec{s}_{c}/norm/bias")

    put(f"decoder.seg_layers.{n - 2}.weight", "seg_head/kernel", _conv_w)
    put(f"decoder.seg_layers.{n - 2}.bias", "seg_head/bias")

    unexpected = [k for k in sd if k not in used
                  and not k.startswith("decoder.seg_layers.")
                  and not k.endswith("num_batches_tracked")]
    if verbose:
        print(f"[nnunet_import] loaded with {len(missing)} missing & "
              f"{len(unexpected)} unexpected keys")
    return out


def load_nnunet_checkpoint(path, cfg: PlainUNetConfig, variables: dict,
                           verbose: bool = True) -> dict:
    import torch

    # prefer the safe loader; nnU-Net trainer checkpoints embed a few plain
    # objects (numpy scalars etc.) that weights_only=True may reject, so fall
    # back to the unsafe path only if the safe one cannot parse the file
    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict):
        sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
              for k, v in normalize_nnunet_state_dict(sd).items()
              if hasattr(v, "detach")}
    return convert_nnunet_state_dict(sd, cfg, variables, verbose=verbose)
