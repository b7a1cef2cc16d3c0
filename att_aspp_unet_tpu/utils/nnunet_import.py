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

import re
from typing import Dict, List, Tuple

import numpy as np

from ..config import PlainUNetConfig
from .torch_import import _conv_w, _convT_w, _deep_dict, _set


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
