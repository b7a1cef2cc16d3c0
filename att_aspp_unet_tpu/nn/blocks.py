"""Building blocks of the Attention-ASPP-UNet, re-designed for TPU.

Semantics match the reference's PyTorch modules
(``/root/reference/attention_aspp_unet_pipeline_stage.py:59-109`` for the v1
variants, ``test_ablation.py:73-166`` for the v2/ablation variants) but the
implementation is TPU-idiomatic:

- NHWC activations (XLA's preferred TPU convolution layout; channels ride the
  128-wide lane dimension of the MXU/VPU),
- bf16 compute with f32 parameters and f32 batch statistics,
- ``lax.conv_general_dilated`` under the hood via flax (dilated ASPP branches
  compile to MXU im2col matmuls),
- no data-dependent Python control flow — everything traces once under jit.

Under ``pjit`` over a data mesh axis, BatchNorm batch statistics are global
automatically: the mean/var reductions are partitioned by GSPMD, which inserts
the cross-chip collectives — no explicit ``axis_name`` plumbing needed.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _resize_bilinear_nhwc(x: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """F.interpolate(..., mode='bilinear', align_corners=False) equivalent."""
    B, H, W, C = x.shape
    if (H, W) == tuple(hw):
        return x
    return jax.image.resize(x, (B, hw[0], hw[1], C), method="linear",
                            antialias=False)


class Conv3x3(nn.Module):
    """3×3 stride-1 SAME conv, no bias, with a selectable TPU lowering.

    Parameter layout (``kernel``: (3, 3, Cin, features) HWIO under this
    module's scope) is identical to ``nn.Conv``'s, so checkpoints are
    interchangeable between lowerings.  ``lowering``:

    - ``"direct"`` — plain ``lax.conv_general_dilated`` (what ``nn.Conv``
      emits);
    - ``"w2d"`` — force the width-to-depth packed conv (exact same math,
      see :mod:`..nn.w2d` — measured SLOWER as a per-conv drop-in; only
      pays stage-resident);
    - ``"auto"`` — w2d on TPU when the isolated-conv shape is in the
      measured win region (probe r15c); experimentation only;
    - ``"int8"`` — post-training-quantized serving conv (per-out-channel
      int8 weights, per-tensor int8 activations; :mod:`..nn.quant`).
      Requires a calibrated ``quant`` variable collection — run one
      forward in ``"int8_calib"`` lowering with ``mutable=["quant"]``
      first (the inference engine does this automatically);
    - ``"int8_calib"`` — the direct bf16 conv, additionally recording the
      running activation absmax for ``"int8"`` into collection ``quant``.
    """

    features: int
    lowering: str = "direct"
    use_bias: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from .quant import int8_conv3x3, int8_conv3x3_pre
        from .w2d import conv3x3_w2d, resolve_w2d

        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), self.param_dtype)
        x = x.astype(self.dtype)
        k = kernel.astype(self.dtype)
        if self.lowering in ("int8", "int8_calib"):
            amax = self.variable("quant", "act_absmax",
                                 lambda: jnp.zeros((), jnp.float32))
        if self.lowering == "int8":
            s_x = jnp.maximum(amax.value, 1e-6) / 127.0
            if kernel.dtype == jnp.int8:
                # engine pre-quantized the kernel outside jit
                # (nn/quant.py::prequantize_params)
                ws = self.variable(
                    "quant", "w_scale",
                    lambda: jnp.ones((self.features,), jnp.float32))
                y = int8_conv3x3_pre(x, kernel, ws.value, s_x)
            else:
                y = int8_conv3x3(x, kernel, s_x)
            y = y.astype(self.dtype)
        elif (self.lowering != "int8_calib"
              and resolve_w2d(self.lowering, x.shape, 3, cin,
                              self.features)):
            y = conv3x3_w2d(x, k)
        else:
            if (self.lowering == "int8_calib"
                    and self.is_mutable_collection("quant")
                    and not self.is_initializing()):
                amax.value = jnp.maximum(
                    amax.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
            dn = jax.lax.conv_dimension_numbers(
                x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=dn)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


class ConvBNReLU(nn.Module):
    """Conv(k, pad k//2, no bias) → BatchNorm → ReLU.

    Reference: ``attention_aspp_unet_pipeline_stage.py:59-65``.
    """

    features: int
    kernel: int = 3
    lowering: str = "direct"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kernel == 3:
            x = Conv3x3(self.features, lowering=self.lowering,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="conv")(x)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        padding=self.kernel // 2, use_bias=False,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="bn")(x)
        return nn.relu(x)


class DilatedConv3x3Matmul(nn.Module):
    """3×3 dilated conv (rate r, SAME padding, no bias) as nine shifted
    1×1 matmuls — the MXU-native lowering for small spatial extents.

    At the ASPP bridge the feature map is only (H/16)² (32² at 512² input)
    while the dilation rate reaches 18: XLA's native dilated-conv lowering
    pads the input to (H/16 + 2r)² — up to 4.5× wasted MACs — and ran at
    ~7 % MFU (NOTES.md round-1 ablation).  Nine ``(B·H·W, Cin) @ (Cin,
    Cout)`` einsum taps over a single padded copy keep every MAC dense on
    the MXU.  The parameter is named/shaped exactly like ``nn.Conv``'s
    ``kernel`` (HWIO), so checkpoints are interchangeable between
    implementations.
    """

    features: int
    rate: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), self.param_dtype)
        k = kernel.astype(self.dtype)
        r = self.rate
        xp = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
        H, W = x.shape[1], x.shape[2]
        out = None
        for i in range(3):
            for j in range(3):
                sl = jax.lax.slice_in_dim(
                    jax.lax.slice_in_dim(xp, i * r, i * r + H, axis=1),
                    j * r, j * r + W, axis=2)
                t = jnp.einsum("bhwc,co->bhwo", sl, k[i, j],
                               preferred_element_type=self.dtype)
                out = t if out is None else out + t
        return out


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling bridge.

    Five parallel branches — 1×1, three 3×3 dilated convs (rates 6/12/18), and
    global-average-pool → 1×1 → broadcast — concatenated and projected by a
    1×1 conv with Dropout(0.1).  Reference:
    ``attention_aspp_unet_pipeline_stage.py:67-83``.

    The pooled branch's bilinear upsample of a 1×1 map is exactly a broadcast,
    so we broadcast directly instead of interpolating.

    ``impl='matmul'`` lowers the dilated branches via
    :class:`DilatedConv3x3Matmul` (same parameters, same math, dense MXU
    matmuls instead of XLA's padded dilated conv).
    """

    features: int
    rates: Sequence[int] = (6, 12, 18)
    dropout: float = 0.1
    impl: str = "conv"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                param_dtype=self.param_dtype, name=name)(h)

        feats = []
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="branch0_conv")(x)
        feats.append(nn.relu(bn(h, "branch0_bn")))
        for i, r in enumerate(self.rates, start=1):
            if self.impl == "matmul":
                h = DilatedConv3x3Matmul(self.features, r, dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name=f"branch{i}_conv")(x)
            else:
                h = nn.Conv(self.features, (3, 3), padding=r,
                            kernel_dilation=(r, r),
                            use_bias=False, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name=f"branch{i}_conv")(x)
            feats.append(nn.relu(bn(h, f"branch{i}_bn")))

        # global-average-pool branch: (B,1,1,C) → conv → BN → ReLU → broadcast
        p = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(self.dtype)
        p = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="pool_conv")(p)
        p = nn.relu(bn(p, "pool_bn"))
        feats.append(jnp.broadcast_to(p, feats[0].shape))

        h = jnp.concatenate(feats, axis=-1)
        h = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="project_conv")(h)
        h = nn.relu(bn(h, "project_bn"))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h


class AttentionGateV1(nn.Module):
    """v1 gate: ``x · σ(BN(ψ(ReLU(BN(Wg·g) + BN(Wx·x)))))``.

    Reference: ``attention_aspp_unet_pipeline_stage.py:85-92``.
    """

    inter_features: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                param_dtype=self.param_dtype, name=name)(h)

        hg = bn(nn.Conv(self.inter_features, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="Wg_conv")(g), "Wg_bn")
        hx = bn(nn.Conv(self.inter_features, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name="Wx_conv")(x), "Wx_bn")
        a = nn.relu(hg + hx)
        a = bn(nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="psi_conv")(a),
               "psi_bn")
        a = nn.sigmoid(a)
        return x * a, a


class AttentionGateV2(nn.Module):
    """v2 (ablation) gate: no BN, bias on ψ, residual ``x·a + x``; returns the
    ψ attention map.  ``Fint = max(8, min(Fg, Fl) // 4)`` is resolved by the
    caller.  Reference: ``test_ablation.py:128-143``.
    """

    inter_features: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        hg = nn.Conv(self.inter_features, (1, 1), use_bias=False,
                     dtype=self.dtype, param_dtype=self.param_dtype,
                     name="Wg")(g)
        hx = nn.Conv(self.inter_features, (1, 1), use_bias=False,
                     dtype=self.dtype, param_dtype=self.param_dtype,
                     name="Wx")(x)
        a = nn.sigmoid(nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype,
                               param_dtype=self.param_dtype,
                               name="psi")(nn.relu(hg + hx)))
        return x * a + x, a


class UpBlock(nn.Module):
    """Decoder stage: ConvTranspose(2,2) upsample of the gate signal, bilinear
    size-fix, attention-gated skip, concat([x, g]), two ConvBNReLU.

    Reference: ``attention_aspp_unet_pipeline_stage.py:98-109`` (v1 gate with
    Fint = out_c // 2) and ``test_ablation.py:149-166`` (v2 gate, auto Fint).
    """

    features: int
    use_att: bool = True
    gate_variant: str = "v1"
    lowering: str = "direct"
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        g = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                             dtype=self.dtype, param_dtype=self.param_dtype,
                             name="up")(g)
        g = g if g.shape[1:3] == x.shape[1:3] else _resize_bilinear_nhwc(
            g, (x.shape[1], x.shape[2])).astype(g.dtype)

        psi = None
        if self.use_att:
            if self.gate_variant == "v1":
                x, psi = AttentionGateV1(self.features // 2, dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name="att")(g, x, train)
            else:
                fint = max(8, self.features // 4)
                x, psi = AttentionGateV2(fint, dtype=self.dtype,
                                         param_dtype=self.param_dtype,
                                         name="att")(g, x, train)

        h = jnp.concatenate([x, g], axis=-1)
        h = ConvBNReLU(self.features, lowering=self.lowering,
                       dtype=self.dtype,
                       param_dtype=self.param_dtype, name="conv0")(h, train)
        h = ConvBNReLU(self.features, lowering=self.lowering,
                       dtype=self.dtype,
                       param_dtype=self.param_dtype, name="conv1")(h, train)
        return h, psi
