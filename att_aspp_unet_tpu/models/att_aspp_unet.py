"""Attention-ASPP-UNet — the flagship segmentation model.

Capabilities of both reference variants behind one config:

- v1 (``attention_aspp_unet_pipeline_stage.py:111-127``): 4-level encoder
  (base_c·{1,2,4,8}), ASPP bridge → base_c·16, decoder u4..u1 with v1
  attention gates on u4/u3/u2 (u1 ungated), 1×1 output conv.
- v2 / ablation (``test_ablation.py:168-218``): flags ``use_att / use_aspp /
  att_depth``, v2 residual gates on u4 (depth≥4) and u3 (depth≥3) only, bridge
  replaceable by ConvBNReLU+Dropout, forward returns ψ maps [ψ3, ψ2].

Input/params are NHWC / HWIO; activations bf16, params f32.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..nn.blocks import ASPP, ConvBNReLU, UpBlock


class AttentionASPPUNet(nn.Module):
    in_channels: int = 1
    num_classes: int = 1
    base_c: int = 48
    use_att: bool = True
    use_aspp: bool = True
    att_depth: int = 4
    gate_variant: str = "v1"
    aspp_rates: Tuple[int, ...] = (6, 12, 18)
    aspp_dropout: float = 0.1
    aspp_impl: str = "matmul"
    conv_lowering: str = "direct"
    # level-1 channel pad (0 = off; see nn/cpad.py) — trees must come
    # from pad_variables_c1, never from a raw init (zero pad channels
    # are what makes this a lowering rather than a wider model)
    c1_pad: int = 0
    remat: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: ModelConfig) -> "AttentionASPPUNet":
        return cls(
            in_channels=cfg.in_channels, num_classes=cfg.num_classes,
            base_c=cfg.base_c, use_att=cfg.use_att, use_aspp=cfg.use_aspp,
            att_depth=cfg.att_depth, gate_variant=cfg.gate_variant,
            aspp_rates=tuple(cfg.aspp_rates), aspp_dropout=cfg.aspp_dropout,
            aspp_impl=getattr(cfg, "aspp_impl", "matmul"),
            conv_lowering=getattr(cfg, "conv_lowering", "direct"),
            c1_pad=getattr(cfg, "c1_pad", 0),
            remat=getattr(cfg, "remat", False),
            dtype=jnp.dtype(cfg.compute_dtype), param_dtype=jnp.dtype(cfg.param_dtype),
        )

    def _gated(self, level: int) -> bool:
        """Which decoder levels carry a gate.

        v1 wiring gates u4/u3/u2 and leaves u1 plain
        (``…stage.py:120-121``); v2 wiring gates u4/u3 only, subject to
        ``att_depth`` (``test_ablation.py:199-202``).
        """
        if not self.use_att:
            return False
        if self.gate_variant == "v1":
            return level >= 2
        return level >= 3 and self.att_depth >= level

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, in_channels) → logits (B, H, W, num_classes), ψ list."""
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        c = self.base_c
        # channel-padded level-1 width (nn/cpad.py): d1/u1 run at c1
        # channels whose [base_c:] tail is exactly zero by construction
        c1 = self.c1_pad or c
        if self.c1_pad:
            if self.c1_pad < c:
                raise ValueError(f"c1_pad {self.c1_pad} < base_c {c}")
            if self.conv_lowering != "direct":
                raise ValueError(
                    "c1_pad composes only with conv_lowering='direct' "
                    f"(got {self.conv_lowering!r})")
        x = x.astype(self.dtype)

        # Width-packed full-resolution level (serving-only lowering; the
        # packed modules declare parameters under the same names/shapes,
        # so checkpoints are interchangeable — nn/packed_stage.py).
        packed512 = self.conv_lowering == "w2d_stage"
        if packed512:
            if x.shape[2] % 2:
                raise ValueError("w2d_stage needs an even input width")

        # jax.checkpoint on every stage: activations recompute in the
        # backward pass instead of living in HBM (SURVEY.md §0 "use remat to
        # trade FLOPs for memory"); param names are unchanged so checkpoints
        # are interchangeable between remat on/off.
        # static_argnums=(2,): the `train` flag must stay a Python bool
        # through the remat trace (BatchNorm branches on it)
        if self.remat:
            CBR = nn.remat(ConvBNReLU, static_argnums=(2,))
            UP = nn.remat(UpBlock, static_argnums=(3,))
            BRIDGE = nn.remat(ASPP, static_argnums=(2,))
        else:
            CBR, UP, BRIDGE = ConvBNReLU, UpBlock, ASPP

        # inner levels always run the direct lowering under w2d_stage
        inner_lowering = "direct" if packed512 else self.conv_lowering

        def enc(h, feats, name):
            h = CBR(feats, lowering=inner_lowering,
                    name=f"{name}_0", **kw)(h, train)
            return CBR(feats, lowering=inner_lowering,
                       name=f"{name}_1", **kw)(h, train)

        if packed512:
            from ..nn.packed_stage import PackedCBR, packed_pool2

            PCBR = (nn.remat(PackedCBR, static_argnums=(2,))
                    if self.remat else PackedCBR)
            x1 = PCBR(c, io="in", name="d1_0", **kw)(x, train)
            x1 = PCBR(c, io="both", name="d1_1", **kw)(x1, train)
            x2_in = packed_pool2(x1)          # already the unpacked layout
        else:
            x1 = enc(x, c1, "d1")
            x2_in = nn.max_pool(x1, (2, 2), (2, 2))
        x2 = enc(x2_in, c * 2, "d2")
        x3 = enc(nn.max_pool(x2, (2, 2), (2, 2)), c * 4, "d3")
        x4 = enc(nn.max_pool(x3, (2, 2), (2, 2)), c * 8, "d4")
        hb = nn.max_pool(x4, (2, 2), (2, 2))

        if self.use_aspp:
            b = BRIDGE(c * 16, rates=self.aspp_rates,
                       dropout=self.aspp_dropout, impl=self.aspp_impl,
                       name="bridge", **kw)(hb, train)
        else:
            b = CBR(c * 16, lowering=self.conv_lowering,
                    name="bridge_conv", **kw)(hb, train)
            b = nn.Dropout(self.aspp_dropout, deterministic=not train)(b)

        def up(level, feats, g, skip):
            return UP(feats, use_att=self._gated(level),
                      gate_variant=self.gate_variant,
                      lowering=inner_lowering,
                      name=f"u{level}", **kw)(g, skip, train)

        d4, psi3 = up(4, c * 8, b, x4)
        d3, psi2 = up(3, c * 4, d4, x3)
        d2, psi1 = up(2, c * 2, d3, x2)

        if packed512:
            from ..nn.packed_stage import (PackedPointwise, PackedUpBlock,
                                           unpack_logits)

            PUP = (nn.remat(PackedUpBlock, static_argnums=(3,))
                   if self.remat else PackedUpBlock)
            d1p = PUP(c, name="u1", **kw)(d2, x1, train)
            lp = PackedPointwise(self.num_classes, name="out_conv",
                                 **kw)(d1p)
            logits = unpack_logits(lp, self.num_classes)
        else:
            d1, psi0 = up(1, c1, d2, x1)
            logits = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                             dtype=self.dtype,
                             param_dtype=self.param_dtype,
                             name="out_conv")(d1)
        logits = logits.astype(jnp.float32)

        psis: List[Optional[jax.Array]] = [psi3, psi2]
        return logits, psis


def create_model(cfg: ModelConfig):
    """Build the model plus initialized variables for a given config."""
    model = AttentionASPPUNet.from_config(cfg)

    def init(rng, sample_hw=(64, 64)):
        x = jnp.zeros((1, sample_hw[0], sample_hw[1], cfg.in_channels), jnp.float32)
        return model.init({"params": rng}, x, train=False)

    return model, init
