"""Packed inference fast-path for the Attention-ASPP-UNet.

At deployment the model never trains, so BatchNorm is a per-channel affine
and every ConvBNReLU pair can run as ONE fused Pallas kernel with the
intermediate activation resident in VMEM (``ops/pallas/fused_conv.py``).
This module folds the flax variables into a packed "plan" once, then runs
the whole forward in channels-leading (N, C, H, W) layout:

- encoder/decoder conv pairs at levels whose width is a multiple of 128
  lanes → ``fused_double_cbr`` (one kernel per pair);
- the small 64²/32² island (d4, bridge, u4) plus every 1×1 conv → dense
  tap/pointwise einsum matmuls (the same MXU-native lowering that
  ``nn.blocks.DilatedConv3x3Matmul`` uses for the ASPP branches);
- ConvTranspose(2,2) → four pointwise matmuls + pixel interleave
  (depth-to-space), measured at parity with XLA's native lowering.

Semantics match ``AttentionASPPUNet.apply(..., train=False)`` (reference
forward: ``/root/reference/attention_aspp_unet_pipeline_stage.py:111-127``)
for the v1 gate wiring; the packer refuses configs it does not cover so
callers can fall back to the flax path.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.pallas.fused_conv import (fold_batchnorm, fused_double_cbr,
                                     pack_conv_weight)

_BF = jnp.bfloat16


def supports(model) -> bool:
    """True if the packed fast path reproduces this model config."""
    return (model.gate_variant == "v1" and model.use_aspp
            and len(tuple(model.aspp_rates)) == 3
            and model.in_channels >= 1 and not model.remat
            and not getattr(model, "c1_pad", 0))


# ---------------------------------------------------------------- packing

def _fold_bn(params_bn, stats_bn) -> Tuple[jax.Array, jax.Array]:
    s, b = fold_batchnorm(params_bn["scale"], params_bn["bias"],
                          stats_bn["mean"], stats_bn["var"])
    return s.astype(jnp.float32), b.astype(jnp.float32)


def _pack_cbr(p, s):
    return {"w": pack_conv_weight(p["conv"]["kernel"]).astype(_BF),
            "k": jnp.asarray(p["conv"]["kernel"], _BF),
            "sb": jnp.stack(_fold_bn(p["bn"], s["bn"]))}


def _pack_pw(p, s, conv="conv", bn="bn"):
    """1×1 conv (+ folded BN): kernel (1,1,Ci,Co) → (Ci,Co)."""
    out = {"w": jnp.asarray(p[conv]["kernel"][0, 0], _BF)}
    if bn is not None:
        out["sb"] = jnp.stack(_fold_bn(p[bn], s[bn]))
    return out


def pack_variables(model, variables) -> Dict[str, Any]:
    """Fold BN statistics and pre-transpose all weights for the fast path."""
    if not supports(model):
        raise ValueError(f"fast path does not cover this config: "
                         f"gate={model.gate_variant} aspp={model.use_aspp} "
                         f"remat={model.remat}")
    p = variables["params"]
    s = variables["batch_stats"]
    plan: Dict[str, Any] = {}

    for lvl in (1, 2, 3, 4):
        plan[f"d{lvl}"] = [_pack_cbr(p[f"d{lvl}_{i}"], s[f"d{lvl}_{i}"])
                           for i in (0, 1)]

    bp, bs = p["bridge"], s["bridge"]
    plan["bridge"] = {
        "b0": _pack_pw(bp, bs, "branch0_conv", "branch0_bn"),
        "rates": [
            {"k": jnp.asarray(bp[f"branch{i}_conv"]["kernel"], _BF),
             "sb": jnp.stack(_fold_bn(bp[f"branch{i}_bn"],
                                      bs[f"branch{i}_bn"]))}
            for i in (1, 2, 3)],
        "pool": _pack_pw(bp, bs, "pool_conv", "pool_bn"),
        "project": _pack_pw(bp, bs, "project_conv", "project_bn"),
    }

    for lvl in (4, 3, 2, 1):
        up, us = p[f"u{lvl}"], s[f"u{lvl}"]
        blk = {
            # pre-flipped: flax ConvTranspose applies the spatially
            # REVERSED kernel (lax.conv_transpose semantics; pinned by
            # test_packed_stage.py::test_packed_transpose_matches_flax),
            # while _up2's einsum indexes it forward
            "up_k": jnp.asarray(up["up"]["kernel"][::-1, ::-1], _BF),
            "up_b": jnp.asarray(up["up"]["bias"], jnp.float32),
            "pair": [_pack_cbr(up[f"conv{i}"], us[f"conv{i}"])
                     for i in (0, 1)],
        }
        if "att" in up:
            ap, as_ = up["att"], us["att"]
            blk["att"] = {
                "wg": _pack_pw(ap, as_, "Wg_conv", "Wg_bn"),
                "wx": _pack_pw(ap, as_, "Wx_conv", "Wx_bn"),
                "psi": _pack_pw(ap, as_, "psi_conv", "psi_bn"),
            }
        plan[f"u{lvl}"] = blk

    plan["out"] = {"w": jnp.asarray(p["out_conv"]["kernel"][0, 0], _BF),
                   "b": jnp.asarray(p["out_conv"]["bias"], jnp.float32)}
    return plan


# ---------------------------------------------------------------- NCHW ops

# The CPU backend cannot execute mixed bf16×bf16→f32 dots (the MXU's native
# accumulate mode on TPU), so on CPU the dots are plain f32 einsums.
# Resolved lazily at first trace so importing this module never initializes
# a jax backend.
_F32_DOTS = None


def _einsum(expr, a, b):
    global _F32_DOTS
    if _F32_DOTS is None:
        _F32_DOTS = jax.default_backend() == "cpu"
    if _F32_DOTS:
        return jnp.einsum(expr, a.astype(jnp.float32),
                          b.astype(jnp.float32))
    return jnp.einsum(expr, a, b, preferred_element_type=jnp.float32)


def _affine_relu(acc, sb, relu=True):
    y = acc * sb[0][None, :, None, None] + sb[1][None, :, None, None]
    return jnp.maximum(y, 0.0) if relu else y


def _pw(x, w, sb=None, relu=False, sigmoid=False):
    """1×1 conv in NCHW: (N,Ci,H,W) @ (Ci,Co) → (N,Co,H,W) bf16."""
    y = _einsum("nchw,co->nohw", x, w)
    if sb is not None:
        y = _affine_relu(y, sb, relu)
    elif relu:
        y = jnp.maximum(y, 0.0)
    if sigmoid:
        y = jax.nn.sigmoid(y)
    return y.astype(_BF)


def _conv3x3_taps(x, k, sb, rate=1):
    """3×3 (dilated) conv + folded BN + ReLU as nine pointwise matmuls.

    x (N,Ci,H,W) bf16, k (3,3,Ci,Co).  MXU-dense for the small-spatial
    stages where the fused kernel's 128-lane width constraint fails.
    """
    r = rate
    xp = jnp.pad(x, ((0, 0), (0, 0), (r, r), (r, r)))
    H, W = x.shape[2], x.shape[3]
    acc = None
    for i in range(3):
        for j in range(3):
            sl = xp[:, :, i * r:i * r + H, j * r:j * r + W]
            t = _einsum("nchw,co->nohw", sl, k[i, j])
            acc = t if acc is None else acc + t
    return _affine_relu(acc, sb).astype(_BF)


def _maxpool2(x):
    n, c, h, w = x.shape
    return x.reshape(n, c, h // 2, 2, w // 2, 2).max(axis=(3, 5))


def _up2(x, k, b):
    """ConvTranspose(2,2,stride 2) in NCHW: 4 pointwise matmuls + interleave.
    k (2,2,Ci,Co)."""
    t = _einsum("nchw,uvco->nohuwv", x, k)
    t = t + b[None, :, None, None, None, None]
    n, o, h, _, w, _ = t.shape
    return t.reshape(n, o, 2 * h, 2 * w).astype(_BF)


def _cbr_pair(x, pair, interpret, fused):
    if fused:
        return fused_double_cbr(
            x, pair[0]["w"], pair[0]["sb"][0], pair[0]["sb"][1],
            pair[1]["w"], pair[1]["sb"][0], pair[1]["sb"][1],
            interpret=interpret)
    h = _conv3x3_taps(x, pair[0]["k"], pair[0]["sb"])
    return _conv3x3_taps(h, pair[1]["k"], pair[1]["sb"])


def _gate_v1(att, g, x):
    """x · σ(BN(ψ(ReLU(BN(Wg·g) + BN(Wx·x))))) — reference …stage.py:85-92."""
    hg = _pw(g, att["wg"]["w"], att["wg"]["sb"], relu=False)
    hx = _pw(x, att["wx"]["w"], att["wx"]["sb"], relu=False)
    a = jnp.maximum(hg.astype(jnp.float32) + hx.astype(jnp.float32), 0.0)
    a = _pw(a.astype(_BF), att["psi"]["w"], att["psi"]["sb"], relu=False,
            sigmoid=True)
    return (x * a).astype(_BF)


def _aspp(plan, x, rates):
    br = plan["bridge"]
    feats = [_pw(x, br["b0"]["w"], br["b0"]["sb"], relu=True)]
    for i, rate in enumerate(rates):
        feats.append(_conv3x3_taps(x, br["rates"][i]["k"],
                                   br["rates"][i]["sb"], rate=rate))
    m = jnp.mean(x.astype(jnp.float32), axis=(2, 3), keepdims=True)
    pbr = _pw(m.astype(_BF), br["pool"]["w"], br["pool"]["sb"], relu=True)
    feats.append(jnp.broadcast_to(pbr, feats[0].shape).astype(_BF))
    h = jnp.concatenate(feats, axis=1)
    return _pw(h, br["project"]["w"], br["project"]["sb"], relu=True)


def _fusable(w: int) -> bool:
    return w % 128 == 0


def make_fast_apply(model, *, interpret: bool = False) -> Callable:
    """Build ``apply_fn(plan, x_nhwc) -> logits_nhwc_f32`` for ``model``.

    Drop-in for ``model.apply`` in the inference engines: same input layout,
    returns logits only (ψ maps are a train/diagnostics feature).
    """
    if not supports(model):
        raise ValueError("unsupported config for the packed fast path")
    gated = {lvl: model._gated(lvl) for lvl in (1, 2, 3, 4)}
    rates = tuple(model.aspp_rates)

    @functools.partial(jax.jit, static_argnums=())
    def apply_fn(plan, x):
        # NHWC → channels-leading
        x = jnp.transpose(x, (0, 3, 1, 2)).astype(_BF)
        W = x.shape[-1]

        def pair(h, key):
            return _cbr_pair(h, plan[key], interpret, _fusable(h.shape[-1]))

        x1 = pair(x, "d1")
        x2 = pair(_maxpool2(x1), "d2")
        x3 = pair(_maxpool2(x2), "d3")
        x4 = pair(_maxpool2(x3), "d4")
        b = _aspp(plan, _maxpool2(x4), rates)

        def up(lvl, g, skip):
            blk = plan[f"u{lvl}"]
            g = _up2(g, blk["up_k"], blk["up_b"])
            if gated[lvl]:
                skip = _gate_v1(blk["att"], g, skip)
            h = jnp.concatenate([skip, g], axis=1)
            return _cbr_pair(h, blk["pair"], interpret,
                             _fusable(h.shape[-1]))

        d4 = up(4, b, x4)
        d3 = up(3, d4, x3)
        d2 = up(2, d3, x2)
        d1 = up(1, d2, x1)

        logits = _einsum("nchw,co->nohw", d1, plan["out"]["w"])
        logits = logits + plan["out"]["b"][None, :, None, None]
        return jnp.transpose(logits, (0, 2, 3, 1))  # NHWC f32

    return apply_fn
