"""Width-packed 512² serving stages (``conv_lowering="w2d_stage"``).

The w2d conv lowering (``nn/w2d.py``) is exact but loses as a per-conv
drop-in: the pack/unpack reshapes are physical lane relayouts.  This
module implements the one place packing composes with ZERO relayouts —
the full-resolution level of the U-Net, where every boundary folds away:

- the d1 input conv EMITS the packed layout (stride-(1,2) width-4 kernel,
  :func:`..nn.w2d.w2d_pack_in_weight`);
- BN-ReLU run in packed space (per-channel affine tiled ``[s, s]``);
- maxpool(2,2)'s width window IS the packed cell, so pooling is
  ``max(x[..., :C], x[..., C:])`` + an h-pool and the result is already
  the UNPACKED d2 input;
- the u1 transposed conv emits packed (output column 2w'+v depends only
  on input column w');
- the skip concat's group order is absorbed into the packed kernel's
  input-channel permutation (:func:`..nn.w2d.w2d_group_perm`);
- the 1×1 output conv consumes packed and the final unpack touches only
  the (B, H, W/2, 2·num_classes) logits — trivially small.

Every module here declares parameters with the SAME names and shapes as
its direct counterpart (``Conv3x3``/``nn.BatchNorm``/``nn.ConvTranspose``
/``nn.Conv``), so checkpoints are interchangeable between lowerings.
Training is supported too: BatchNorm batch statistics are computed in
packed space (reduce the activation to a (2C,) vector FIRST, fold the
halves on the vector — no relayout; :class:`PackedBNAffine`), and every
op here autodiffs, so the same packed plan serves ``train=True``.

Measured on v5e (probe r19, fresh-layout inputs — see the NOTES.md
probe-methodology rule): numbers recorded in NOTES.md round-3.
Reference counterpart: none — this is a TPU lane-packing lowering of the
reference's stride-1 convs (``…stage.py:59-65, 98-109``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .w2d import w2d_group_perm, w2d_pack_in_weight, w2d_pack_weight

Dtype = Any


def packed_pool2(xp: jax.Array) -> jax.Array:
    """maxpool(2,2) of a packed tensor → UNPACKED (B, H/2, W/2, C).

    The width window of the pool is exactly one packed cell, so the
    width reduction is a channel-half max; the h reduction follows.
    """
    n, h, w2, c2 = xp.shape
    c = c2 // 2
    wmax = jnp.maximum(xp[..., :c], xp[..., c:])
    return wmax.reshape(n, h // 2, 2, w2, c).max(axis=2)


class PackedBNAffine(nn.Module):
    """BatchNorm computed in the packed layout.

    Declares ``scale``/``bias`` params and ``batch_stats`` ``mean``/
    ``var`` with :class:`flax.linen.BatchNorm`'s names and (C,) shapes.
    Serving (``train=False``): the folded inference affine tiled over the
    two packed halves.  Training (``train=True``): batch statistics over
    (B, H, W) of the LOGICAL tensor computed without unpacking — the big
    tensor is reduced to a (2C,) sum/sum-of-squares first, and the halves
    fold on that tiny vector, so no lane relayout ever touches the
    activation; running stats update with flax's momentum rule
    (``ra = m·ra + (1−m)·batch``, m = ``momentum``).
    """

    features: int
    epsilon: float = 1e-5
    momentum: float = 0.9
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xp, train: bool = False):
        C = self.features
        scale = self.param("scale", nn.initializers.ones, (C,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (C,),
                          self.param_dtype)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((C,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((C,), jnp.float32))
        # stats in at least f32 (promoted so a float64 model keeps f64 —
        # hard-coding f32 here showed up as 1e-8 "noise" in an x64
        # parity experiment)
        sdt = jnp.promote_types(self.param_dtype, jnp.float32)
        if train:
            xs = xp.astype(sdt)
            n, h, w2, _ = xp.shape
            cnt = n * h * w2 * 2
            s1 = jnp.sum(xs, axis=(0, 1, 2)).reshape(2, C).sum(0)
            s2 = jnp.sum(xs * xs, axis=(0, 1, 2)).reshape(2, C).sum(0)
            m = s1 / cnt
            v = s2 / cnt - m * m                # flax "fast variance"
            if not self.is_initializing():
                mean.value = (self.momentum * mean.value
                              + (1.0 - self.momentum) * m)
                var.value = (self.momentum * var.value
                             + (1.0 - self.momentum) * v)
        else:
            m, v = mean.value, var.value
        s = (scale.astype(sdt) * jax.lax.rsqrt(v.astype(sdt)
                                               + self.epsilon))
        b = bias.astype(sdt) - m.astype(sdt) * s
        st = jnp.concatenate([s, s]).astype(self.dtype)
        bt = jnp.concatenate([b, b]).astype(self.dtype)
        return xp * st + bt


class PackedConv3x3(nn.Module):
    """3×3 conv in packed space; parameter-compatible with ``Conv3x3``.

    ``io``: ``"in"`` — unpacked input → packed output (the pack-emitting
    stride-(1,2) form); ``"both"`` — packed input → packed output.
    ``in_groups=2`` absorbs a ``concat([a_packed, b_packed])`` input
    order into the kernel permutation.
    """

    features: int
    io: str = "both"
    in_groups: int = 1
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.io == "in":
            cin = x.shape[-1]
        else:
            cin = x.shape[-1] // 2
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), self.param_dtype)
        k = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        if self.io == "in":
            kp = w2d_pack_in_weight(k)
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kp.shape, ("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                x, kp, (1, 2), ((1, 1), (1, 1)), dimension_numbers=dn)
        kp = w2d_pack_weight(k)
        if self.in_groups == 2:
            kp = kp[:, :, w2d_group_perm(cin // 2), :]
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kp.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, kp, (1, 1), "SAME", dimension_numbers=dn)


class PackedCBR(nn.Module):
    """ConvBNReLU computed in packed space (children ``conv``/``bn`` keep
    the direct module's parameter layout)."""

    features: int
    io: str = "both"
    in_groups: int = 1
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        y = PackedConv3x3(self.features, io=self.io,
                          in_groups=self.in_groups, name="conv", **kw)(x)
        y = PackedBNAffine(self.features, name="bn", **kw)(y, train)
        return nn.relu(y)


class PackedConvTranspose2(nn.Module):
    """ConvTranspose(2,2,stride 2) emitting the packed layout directly.

    Parameter-compatible with ``nn.ConvTranspose(features, (2, 2),
    strides=(2, 2))`` (kernel (2, 2, Ci, Co) + bias).  Output column
    2w'+v depends only on input column w', so packed cell
    (2h'+u, w', v·Co+o) is one einsum with adjacent-dim merges.
    """

    features: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, cin, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        # flax ConvTranspose applies the spatially FLIPPED kernel
        # (lax.conv_transpose semantics): out[2h+u, 2w+v] ← k[1−u, 1−v]
        t = jnp.einsum("nhwc,uvco->nhuwvo", x.astype(self.dtype),
                       kernel[::-1, ::-1].astype(self.dtype))
        n, h, _, w, _, o = t.shape
        tp = t.reshape(n, 2 * h, w, 2 * o)
        bt = jnp.concatenate([bias, bias]).astype(self.dtype)
        return tp + bt


class PackedPointwise(nn.Module):
    """1×1 conv consuming packed input; parameter-compatible with
    ``nn.Conv(features, (1, 1), use_bias=True)`` (the output head)."""

    features: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xp):
        c = xp.shape[-1] // 2
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, c, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        n, h, w2, _ = xp.shape
        x2 = xp.reshape(n, h, w2, 2, c).astype(self.dtype)
        y = jnp.einsum("nhwpc,co->nhwpo", x2,
                       kernel[0, 0].astype(self.dtype))
        y = y + bias.astype(self.dtype)
        return y.reshape(n, h, w2, 2 * self.features)


class PackedUpBlock(nn.Module):
    """The u1 decoder stage in packed space (children ``up``/``conv0``/
    ``conv1`` — u1 carries no gate in either variant, ``…stage.py:121``,
    ``test_ablation.py:199-202``)."""

    features: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, g, x1_packed, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        gp = PackedConvTranspose2(self.features, name="up", **kw)(g)
        h = jnp.concatenate([x1_packed.astype(gp.dtype), gp], axis=-1)
        h = PackedCBR(self.features, io="both", in_groups=2,
                      name="conv0", **kw)(h, train)
        return PackedCBR(self.features, io="both", name="conv1",
                         **kw)(h, train)


def unpack_logits(lp: jax.Array, num_classes: int) -> jax.Array:
    """(B, H, W/2, 2·ncls) packed logits → (B, H, W, ncls)."""
    n, h, w2, _ = lp.shape
    return lp.reshape(n, h, w2 * 2, num_classes)
