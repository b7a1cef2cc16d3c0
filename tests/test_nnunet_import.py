"""nnU-Net v2 checkpoint importer parity vs a torch oracle with the
nnunetv2 PlainConvUNet naming + wiring."""

import numpy as np
import torch
from torch import nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from att_aspp_unet_tpu.config import PlainUNetConfig
from att_aspp_unet_tpu.models import PlainConvUNet
from att_aspp_unet_tpu.utils.nnunet_import import (convert_nnunet_state_dict,
                                                   normalize_nnunet_state_dict)


class _ConvBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=True)
        self.norm = nn.InstanceNorm2d(cout, affine=True, eps=1e-5)

    def forward(self, x):
        return F.leaky_relu(self.norm(self.conv(x)), 0.01)


class _Stage(nn.Module):
    """Matches nnunetv2's ``encoder.stages.{s}.0.convs.{c}`` key layout."""

    def __init__(self, cin, cout, first_stride):
        super().__init__()
        seq = nn.Module()
        seq.convs = nn.ModuleList([_ConvBlock(cin, cout, first_stride),
                                   _ConvBlock(cout, cout, 1)])
        self.blocks = nn.ModuleList([seq])

    def forward(self, x):
        for c in self.blocks[0].convs:
            x = c(x)
        return x


class _NNUNetOracle(nn.Module):
    def __init__(self, cfg: PlainUNetConfig):
        super().__init__()
        n = cfg.n_stages
        feats = [min(cfg.base_c * 2 ** s, cfg.max_c) for s in range(n)]

        encoder = nn.Module()
        encoder.stages = nn.ModuleList()
        cin = cfg.in_channels
        for s in range(n):
            encoder.stages.append(_Stage(cin, feats[s], 2 if s else 1))
            cin = feats[s]
        self.encoder = encoder

        decoder = nn.Module()
        decoder.transpconvs = nn.ModuleList()
        decoder.stages = nn.ModuleList()
        decoder.seg_layers = nn.ModuleList()
        for i in range(n - 1):
            s = n - 2 - i
            decoder.transpconvs.append(
                nn.ConvTranspose2d(feats[s + 1], feats[s], 2, 2))
            decoder.stages.append(_Stage(feats[s] * 2, feats[s], 1))
            decoder.seg_layers.append(nn.Conv2d(feats[s], cfg.num_classes, 1))
        self.decoder = decoder

    def forward(self, x):
        skips = []
        for st in self.encoder.stages:
            x = st(x)
            skips.append(x)
        x = skips[-1]
        for i, (up, st) in enumerate(zip(self.decoder.transpconvs,
                                         self.decoder.stages)):
            x = up(x)
            x = torch.cat((x, skips[-(i + 2)]), dim=1)
            x = st(x)
        return self.decoder.seg_layers[-1](x)


def _rename(sd):
    """Map the oracle's registration paths onto nnunetv2's: encoder stages
    are Sequential-wrapped (``encoder.stages.{s}.0.convs``), decoder stages
    are bare StackedConvBlocks (``decoder.stages.{i}.convs``)."""
    import re

    out = {}
    for k, v in sd.items():
        k = k.replace(".blocks.0.convs.", ".0.convs.")
        k = re.sub(r"^decoder\.stages\.(\d+)\.0\.convs\.",
                   r"decoder.stages.\1.convs.", k)
        out[k] = v
    return out


def test_nnunet_import_parity():
    cfg = PlainUNetConfig(base_c=4, max_c=16, n_stages=4,
                          compute_dtype="float32")
    oracle = _NNUNetOracle(cfg)
    oracle.eval()

    sd = _rename({k: v.detach().numpy() for k, v in oracle.state_dict().items()})

    model = PlainConvUNet.from_config(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)),
                           train=False)
    filled = convert_nnunet_state_dict(sd, cfg, variables, verbose=False)

    x = torch.rand(2, 1, 32, 32)
    with torch.no_grad():
        want = oracle(x).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(model.apply(filled, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)), train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_normalize_containers():
    sd = {"network_weights": {"module.encoder.x": np.zeros(1),
                              "_orig_mod.decoder.y": np.ones(1)}}
    out = normalize_nnunet_state_dict(sd)
    assert set(out) == {"encoder.x", "decoder.y"}


_REF_PLAN_DIR = (
    "/root/reference/resources/nnUNet_results/Dataset300_ACOptimalSuboptimal/"
    "nnUNetTrainer__nnUNetPlans__2d")


def test_load_plans_config_reference_file():
    """Build the baseline config from the ACTUAL reference plans.json
    (reference loader: model.py:35-60; plan values plans.json:26-49)."""
    import pytest
    from pathlib import Path

    from att_aspp_unet_tpu.utils.nnunet_import import load_plans_config

    plans = Path(_REF_PLAN_DIR) / "plans.json"
    dataset = Path(_REF_PLAN_DIR) / "dataset.json"
    if not plans.exists():
        pytest.skip("reference resources not mounted")

    cfg = load_plans_config(plans, dataset_json=dataset)
    assert cfg.base_c == 32 and cfg.max_c == 512
    assert cfg.n_stages == 7 and cfg.conv_per_stage == 2
    assert cfg.patch_size == (448, 576)
    assert cfg.num_classes == 3 and cfg.in_channels == 1

    # and the model actually builds from it
    model = PlainConvUNet.from_config(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1)),
                           train=False)
    out = model.apply(variables, jnp.zeros((1, 64, 64, 1)), train=False)
    assert out.shape == (1, 64, 64, 3)


def test_load_plans_config_rejects_unknown():
    import json

    import pytest

    from att_aspp_unet_tpu.utils.nnunet_import import load_plans_config

    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "plans.json")
        with open(p, "w") as f:
            json.dump({"configurations": {"2d": {
                "UNet_class_name": "ResEncUNet",
                "n_conv_per_stage_encoder": [2, 2],
                "patch_size": [64, 64],
                "UNet_base_num_features": 16}}}, f)
        with pytest.raises(ValueError):
            load_plans_config(p)
        with pytest.raises(KeyError):
            load_plans_config(p, configuration="3d_fullres")
