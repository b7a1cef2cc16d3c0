"""Post-training int8 quantization (PTQ) for the 3×3 conv stages.

TPU-specific serving optimization with no reference counterpart: the
reference serves its convs in f32/AMP through cuDNN
(``/root/reference/attention_aspp_unet_pipeline_stage.py:310`` autocast);
on a v5e the MXU's int8 mode runs the flagship's dominant conv shapes
substantially faster than bf16 (probes r16-int8/r16b, NOTES.md):

- the lane-underfilled 512²×C48 stage: ×1.88 (20.2 TF/s → 38.0 Top/s),
- whole encoder/decoder conv set at B=16: ×1.51,
- the full quantize → int8 conv → dequant·BN·ReLU chain keeps ×1.51 —
  the elementwise VPU passes fuse into the conv's producer/consumer.

Scheme (standard symmetric PTQ):

- weights: per-output-channel symmetric int8, quantized in-graph from the
  f32 checkpoint kernel (folds to a one-time cost under jit since the
  params are loop-invariant across a serving micro-batch);
- activations: per-tensor symmetric int8 with a static scale obtained by
  absmax calibration (one forward pass in ``int8_calib`` lowering records
  per-conv-site absmax into the ``quant`` variable collection).

Accuracy is gated by tests (``tests/test_quant_int8.py``) comparing int8
vs bf16 probabilities and masks; the mode is opt-in
(``ModelConfig.conv_lowering = "int8"``), bf16 remains the default.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["quantize_weight", "quantize_act", "int8_conv3x3",
           "int8_conv3x3_pre", "prequantize_params", "merge_quant"]


def quantize_weight(k: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(kh, kw, Ci, Co) f32 kernel → (int8 kernel, per-Co f32 scale)."""
    absmax = jnp.max(jnp.abs(k.astype(jnp.float32)), axis=(0, 1, 2))
    s = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(k.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def quantize_act(x: jax.Array, s_x: jax.Array) -> jax.Array:
    """Per-tensor symmetric int8 quantization of an activation tensor."""
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127)
    return q.astype(jnp.int8)


def int8_conv3x3_pre(x: jax.Array, wq: jax.Array, s_w: jax.Array,
                     s_x: jax.Array) -> jax.Array:
    """3×3 stride-1 SAME conv on the int8 MXU path with an
    already-quantized kernel; returns f32.

    ``x`` (B, H, W, Ci) any float dtype, ``wq`` (3, 3, Ci, Co) int8,
    ``s_w`` (Co,) f32 weight scales, ``s_x`` scalar f32 activation scale.
    """
    xq = quantize_act(x, s_x)
    dn = lax.conv_dimension_numbers(xq.shape, wq.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(xq, wq, (1, 1), "SAME",
                                 dimension_numbers=dn,
                                 preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (s_x * s_w)


def int8_conv3x3(x: jax.Array, kernel: jax.Array,
                 s_x: jax.Array) -> jax.Array:
    """As :func:`int8_conv3x3_pre` but quantizing the f32 ``kernel``
    in-graph (checkpoint interchangeability; the engine pre-quantizes
    outside jit instead — see :func:`prequantize_params`)."""
    wq, s_w = quantize_weight(kernel)
    return int8_conv3x3_pre(x, wq, s_w, s_x)


def prequantize_params(params: Dict[str, Any]
                       ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Quantize every ``Conv3x3`` kernel of a params tree OUTSIDE jit.

    Returns ``(params_q, w_scales)``: the same tree with each 3×3
    ``Conv3x3`` kernel (a ``{"kernel": (3,3,Ci,Co)}`` module named
    ``conv`` — the naming every ConvBNReLU uses) replaced by its int8
    quantization, and a ``quant``-collection-shaped tree carrying the
    matching per-out-channel ``w_scale`` leaves.  Merge the scales into
    the calibrated activation-absmax tree with :func:`merge_quant`.
    """
    def is_c3(name, node):
        return (name == "conv" and isinstance(node, dict)
                and "kernel" in node
                and getattr(node["kernel"], "ndim", 0) == 4
                and node["kernel"].shape[:2] == (3, 3))

    def walk(node):
        pq: Dict[str, Any] = {}
        ws: Dict[str, Any] = {}
        for name, child in node.items():
            if is_c3(name, child):
                q, s = quantize_weight(jnp.asarray(child["kernel"]))
                pq[name] = {**child, "kernel": q}
                ws[name] = {"w_scale": s}
            elif isinstance(child, dict):
                sub_pq, sub_ws = walk(child)
                pq[name] = sub_pq
                if sub_ws:
                    ws[name] = sub_ws
            else:
                pq[name] = child
        return pq, ws

    return walk(params)


def merge_quant(act_tree: Dict[str, Any],
                w_tree: Dict[str, Any]) -> Dict[str, Any]:
    """Deep-merge the calibrated activation-absmax tree with the
    pre-quantized ``w_scale`` tree (both mirror the module nesting)."""
    out = dict(act_tree)
    for k, v in w_tree.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_quant(out[k], v)
        else:
            out[k] = v
    return out
