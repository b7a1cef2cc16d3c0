"""Import reference PyTorch checkpoints into framework parameter trees.

Covers the reference's checkpoint compatibility semantics
(``attention_aspp_unet_pipeline_stage.py:134-141`` and
``test_ablation.py:222-229``):

- unwrap ``{"state_dict": ...}`` containers,
- rename legacy ``.W_g.`` → ``.Wg.`` and ``.W_x.`` → ``.Wx.`` keys,
- non-strict loading: fill what matches, keep initial values for the rest,
  and report missing/unexpected key counts.

Layout conversions (PyTorch → JAX/flax):

- Conv2d            weight (O, I, kH, kW)  → kernel (kH, kW, I, O)
- ConvTranspose2d   weight (I, O, kH, kW)  → kernel (kH, kW, I, O)
- BatchNorm2d       weight/bias/running_mean/running_var
                    → scale/bias (params) + mean/var (batch_stats)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..config import ModelConfig


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _convT_w(w: np.ndarray) -> np.ndarray:
    # flax ConvTranspose (transpose_kernel=False) correlates the dilated input
    # with the kernel as-is, whereas torch's ConvTranspose2d is the conv
    # gradient (a scatter) — equivalent to correlation with the spatially
    # flipped kernel.  Hence the [::-1, ::-1].
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def normalize_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Unwrap containers and apply the legacy key renames."""
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k.replace(".W_g.", ".Wg.").replace(".W_x.", ".Wx."): v
            for k, v in sd.items()}


def _mapping_for_config(cfg: ModelConfig) -> List[Tuple[str, str, str]]:
    """(torch_prefix, flax_path, kind) triples for every module.

    kind ∈ {conv, convT, bn, conv_bias}; flax_path is '/'-joined below
    params/ or batch_stats/.
    """
    rules: List[Tuple[str, str, str]] = []

    def cbr(torch_prefix, flax_prefix):
        rules.append((f"{torch_prefix}.block.0", f"{flax_prefix}/conv", "conv"))
        rules.append((f"{torch_prefix}.block.1", f"{flax_prefix}/bn", "bn"))

    for i in range(1, 5):
        cbr(f"d{i}.0", f"d{i}_0")
        cbr(f"d{i}.1", f"d{i}_1")

    if cfg.use_aspp:
        n_rates = len(cfg.aspp_rates)
        for b in range(n_rates + 1):
            rules.append((f"bridge.blocks.{b}.0", f"bridge/branch{b}_conv", "conv"))
            rules.append((f"bridge.blocks.{b}.1", f"bridge/branch{b}_bn", "bn"))
        rules.append(("bridge.pool.1", "bridge/pool_conv", "conv"))
        rules.append(("bridge.pool.2", "bridge/pool_bn", "bn"))
        rules.append(("bridge.project.0", "bridge/project_conv", "conv"))
        rules.append(("bridge.project.1", "bridge/project_bn", "bn"))
    else:
        cbr("bridge.0", "bridge_conv")

    def gated(level: int) -> bool:
        # mirror AttentionASPPUNet._gated: v1 gates u4/u3/u2 (u1 ungated,
        # reference …stage.py:120-121); v2 gates u4/u3 subject to att_depth
        if not cfg.use_att:
            return False
        if cfg.gate_variant == "v1":
            return level >= 2
        return level >= 3 and cfg.att_depth >= level

    for lvl in (4, 3, 2, 1):
        rules.append((f"u{lvl}.up", f"u{lvl}/up", "convT"))
        if not gated(lvl):
            pass
        elif cfg.gate_variant == "v1":
            rules.append((f"u{lvl}.att.Wg.0", f"u{lvl}/att/Wg_conv", "conv"))
            rules.append((f"u{lvl}.att.Wg.1", f"u{lvl}/att/Wg_bn", "bn"))
            rules.append((f"u{lvl}.att.Wx.0", f"u{lvl}/att/Wx_conv", "conv"))
            rules.append((f"u{lvl}.att.Wx.1", f"u{lvl}/att/Wx_bn", "bn"))
            rules.append((f"u{lvl}.att.psi.0", f"u{lvl}/att/psi_conv", "conv"))
            rules.append((f"u{lvl}.att.psi.1", f"u{lvl}/att/psi_bn", "bn"))
        else:
            rules.append((f"u{lvl}.att.Wg", f"u{lvl}/att/Wg", "conv"))
            rules.append((f"u{lvl}.att.Wx", f"u{lvl}/att/Wx", "conv"))
            rules.append((f"u{lvl}.att.psi.1", f"u{lvl}/att/psi", "conv_bias"))
        cbr(f"u{lvl}.conv.0", f"u{lvl}/conv0")
        cbr(f"u{lvl}.conv.1", f"u{lvl}/conv1")

    rules.append(("out_conv", "out_conv", "conv_bias"))
    return rules


def _set(tree: dict, path: str, value: np.ndarray) -> bool:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        if p not in node:
            return False
        node = node[p]
    if parts[-1] not in node:
        return False
    expected = np.shape(node[parts[-1]])
    if tuple(expected) != tuple(value.shape):
        raise ValueError(f"shape mismatch at {path}: "
                         f"checkpoint {value.shape} vs model {expected}")
    node[parts[-1]] = value.astype(np.asarray(node[parts[-1]]).dtype)
    return True


def convert_reference_state_dict(sd: Dict[str, np.ndarray], cfg: ModelConfig,
                                 variables: dict,
                                 verbose: bool = True) -> dict:
    """Fill a flax variables tree from a (normalised) torch state dict.

    ``variables`` is a freshly initialised ``{"params":…, "batch_stats":…}``;
    a deep-copied, filled version is returned.  Non-strict: unmatched torch
    keys and unfilled model leaves are reported, not fatal.
    """
    import jax

    sd = normalize_state_dict(sd)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    out = jax.tree_util.tree_map(np.asarray, variables)
    out = {"params": _deep_dict(out["params"]),
           "batch_stats": _deep_dict(out.get("batch_stats", {}))}

    used = set()
    missing: List[str] = []
    for torch_prefix, flax_path, kind in _mapping_for_config(cfg):
        if kind in ("conv", "conv_bias", "convT"):
            wk = f"{torch_prefix}.weight"
            if wk in sd:
                conv = _convT_w if kind == "convT" else _conv_w
                if _set(out["params"], f"{flax_path}/kernel", conv(sd[wk])):
                    used.add(wk)
            else:
                missing.append(wk)
            bk = f"{torch_prefix}.bias"
            if kind in ("conv_bias", "convT"):
                if bk in sd:
                    if _set(out["params"], f"{flax_path}/bias", sd[bk]):
                        used.add(bk)
                else:
                    missing.append(bk)
        elif kind == "bn":
            pairs = [("weight", "params", "scale"), ("bias", "params", "bias"),
                     ("running_mean", "batch_stats", "mean"),
                     ("running_var", "batch_stats", "var")]
            for tsuf, coll, fsuf in pairs:
                tk = f"{torch_prefix}.{tsuf}"
                if tk in sd:
                    if _set(out[coll], f"{flax_path}/{fsuf}", sd[tk]):
                        used.add(tk)
                else:
                    missing.append(tk)

    unexpected = [k for k in sd
                  if k not in used and not k.endswith("num_batches_tracked")]
    if verbose:
        print(f"[torch_import] loaded with {len(missing)} missing & "
              f"{len(unexpected)} unexpected keys")
    return out


def _deep_dict(tree) -> dict:
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _deep_dict(v) for k, v in tree.items()}
    return tree


def load_torch_checkpoint(path, cfg: ModelConfig, variables: dict,
                          verbose: bool = True) -> dict:
    """Read a reference ``.pt``/``.pth`` file and import it (requires torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd_np = {k: v.detach().cpu().numpy() for k, v in sd.items()
             if hasattr(v, "detach")}
    return convert_reference_state_dict(sd_np, cfg, variables, verbose=verbose)
