"""PlainConvUNet — the nnU-Net-style baseline segmentation network.

TPU-native equivalent of the reference's baseline path: an nnU-Net v2
``PlainConvUNet`` as planned in
``resources/.../nnUNetTrainer__nnUNetPlans__2d/plans.json`` — 7 stages,
base 32 features capped at 512, 2 convs per stage, stride-2 downsampling from
stage 2, conv-transpose decoder — wrapped by ``nnUNetPredictor``
(``/root/reference/model.py:35-60``).  nnU-Net's conv blocks use
InstanceNorm + LeakyReLU(0.01); deep-supervision heads exist in training but
inference consumes only the full-resolution head, so only that head is built.

Outputs softmax-able logits over {background, optimal, suboptimal}
(``postprocess_probability_maps.py:61-78`` consumes the class softmax).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import PlainUNetConfig
from ..nn.blocks import Conv3x3


class _InstanceNorm(nn.Module):
    """InstanceNorm2d (affine, eps 1e-5): normalise each (H, W) plane per
    sample per channel — nnU-Net's norm_op."""

    epsilon: float = 1e-5
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        var = jnp.var(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],),
                          self.param_dtype)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


class _ConvINLReLU(nn.Module):
    features: int
    stride: int = 1
    lowering: str = "direct"
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.stride == 1:
            # selectable TPU lowering (w2d width-packing for the
            # lane-underfilled 32-channel stages — nn/w2d.py); param names
            # match nn.Conv so checkpoints are identical
            x = Conv3x3(self.features, lowering=self.lowering,
                        use_bias=True, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="conv")(x)
        else:
            x = nn.Conv(self.features, (3, 3),
                        strides=(self.stride, self.stride),
                        padding=1, use_bias=True, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="conv")(x)
        x = _InstanceNorm(dtype=self.dtype, param_dtype=self.param_dtype,
                          name="norm")(x)
        return nn.leaky_relu(x, negative_slope=0.01)


class PlainConvUNet(nn.Module):
    in_channels: int = 1
    num_classes: int = 3
    base_c: int = 32
    max_c: int = 512
    n_stages: int = 7
    conv_per_stage: int = 2
    conv_lowering: str = "direct"
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: PlainUNetConfig) -> "PlainConvUNet":
        return cls(in_channels=cfg.in_channels, num_classes=cfg.num_classes,
                   base_c=cfg.base_c, max_c=cfg.max_c, n_stages=cfg.n_stages,
                   conv_per_stage=cfg.conv_per_stage,
                   conv_lowering=getattr(cfg, "conv_lowering", "direct"),
                   dtype=jnp.dtype(cfg.compute_dtype),
                   param_dtype=jnp.dtype(cfg.param_dtype))

    def stage_features(self, s: int) -> int:
        return min(self.base_c * (2 ** s), self.max_c)

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, C) with H, W divisible by 2**(n_stages-1).
        Returns full-resolution logits (B, H, W, num_classes) in f32."""
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = x.astype(self.dtype)

        skips = []
        for s in range(self.n_stages):
            feats = self.stage_features(s)
            for c in range(self.conv_per_stage):
                stride = 2 if (s > 0 and c == 0) else 1
                x = _ConvINLReLU(feats, stride=stride,
                                 lowering=self.conv_lowering,
                                 name=f"enc{s}_{c}", **kw)(x)
            skips.append(x)

        x = skips[-1]
        for s in range(self.n_stages - 2, -1, -1):
            feats = self.stage_features(s)
            x = nn.ConvTranspose(feats, (2, 2), strides=(2, 2),
                                 name=f"up{s}", **kw)(x)
            x = jnp.concatenate([x, skips[s]], axis=-1)
            for c in range(self.conv_per_stage):
                x = _ConvINLReLU(feats, lowering=self.conv_lowering,
                                 name=f"dec{s}_{c}", **kw)(x)

        logits = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="seg_head")(x)
        return logits.astype(jnp.float32)
