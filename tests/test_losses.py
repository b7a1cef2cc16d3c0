"""Loss parity vs inline torch oracles of the reference loss spec."""

import numpy as np
import torch
import torch.nn.functional as F

from att_aspp_unet_tpu.config import LossConfig
from att_aspp_unet_tpu.train.losses import (
    bce_with_logits, build_criterion, combo_loss, dice_loss, edge_loss,
    iou_score, tversky_loss,
)


def _rand(rng, B=4, H=16, W=16):
    logits = rng.normal(size=(B, H, W, 1)).astype(np.float32) * 2
    targets = (rng.random((B, H, W, 1)) > 0.6).astype(np.float32)
    targets[1] = 0.0                      # one empty-mask sample
    return logits, targets


def _t(x):
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def _torch_dice(l, t, s=1.0):
    p = torch.sigmoid(l)
    num = 2 * (p * t).sum((2, 3)) + s
    den = p.sum((2, 3)) + t.sum((2, 3)) + s
    return (1 - num / den).mean()


def _torch_tversky(l, t, a=0.7, b=0.3, s=1.0):
    p = torch.sigmoid(l)
    tp = (p * t).sum((2, 3))
    fp = (p * (1 - t)).sum((2, 3))
    fn = ((1 - p) * t).sum((2, 3))
    return (1 - (tp + s) / (tp + a * fp + b * fn + s)).mean()


def _torch_edge(l, t):
    kx = torch.tensor([[1, 0, -1], [2, 0, -2], [1, 0, -1]],
                      dtype=torch.float32).view(1, 1, 3, 3)
    ky = torch.tensor([[1, 2, 1], [0, 0, 0], [-1, -2, -1]],
                      dtype=torch.float32).view(1, 1, 3, 3)
    p = torch.sigmoid(l)
    gp = torch.sqrt(F.conv2d(p, kx, padding=1) ** 2 +
                    F.conv2d(p, ky, padding=1) ** 2 + 1e-8)
    gt = torch.sqrt(F.conv2d(t, kx, padding=1) ** 2 +
                    F.conv2d(t, ky, padding=1) ** 2 + 1e-8)
    return F.l1_loss(gp, gt)


def test_dice(rng):
    l, t = _rand(rng)
    got = float(dice_loss(l, t))
    want = float(_torch_dice(_t(l), _t(t)))
    assert abs(got - want) < 1e-5


def test_tversky(rng):
    l, t = _rand(rng)
    got = float(tversky_loss(l, t))
    want = float(_torch_tversky(_t(l), _t(t)))
    assert abs(got - want) < 1e-5


def test_bce(rng):
    l, t = _rand(rng)
    got = float(bce_with_logits(l, t))
    want = float(F.binary_cross_entropy_with_logits(_t(l), _t(t)))
    assert abs(got - want) < 1e-5


def test_combo(rng):
    l, t = _rand(rng)
    got = float(combo_loss(l, t))
    want = float(_torch_dice(_t(l), _t(t)) +
                 F.binary_cross_entropy_with_logits(_t(l), _t(t)))
    assert abs(got - want) < 1e-5


def test_edge(rng):
    l, t = _rand(rng)
    got = float(edge_loss(l, t))
    want = float(_torch_edge(_t(l), _t(t)))
    assert abs(got - want) < 1e-5


def test_iou(rng):
    l, t = _rand(rng)
    tl, tt = _t(l), _t(t)
    p = (torch.sigmoid(tl) > 0.5).float()
    inter = (p * tt).sum((2, 3))
    union = p.sum((2, 3)) + tt.sum((2, 3)) - inter
    want = float((inter / (union + 1e-7)).mean())
    assert abs(float(iou_score(l, t)) - want) < 1e-5


def _torch_criterion(l, t, stage, neg_w=0.05, edge_w=0.05):
    """Reference build_criterion spec: weighted BCE on all samples + combo
    (Dice+BCE) and edge on positive samples only."""
    B = t.size(0)
    is_empty = (t.sum((2, 3), keepdim=True) == 0).float()
    w = torch.where(is_empty == 1, torch.tensor(neg_w), torch.tensor(1.0)) \
        if stage == "finetune" else torch.ones_like(is_empty)
    bce = F.binary_cross_entropy_with_logits(l, t, weight=w.expand_as(t))
    pos = (is_empty.view(B) == 0).nonzero(as_tuple=True)[0]
    d = torch.tensor(0.0)
    e = torch.tensor(0.0)
    if len(pos) > 0:
        lp, tp = l[pos], t[pos]
        d = _torch_dice(lp, tp) + F.binary_cross_entropy_with_logits(lp, tp)
        e = _torch_edge(lp, tp) * edge_w
    return float(d + bce + e)


def test_criterion_main_stage(rng):
    l, t = _rand(rng)
    crit = build_criterion(LossConfig(), stage="main")
    want = _torch_criterion(_t(l), _t(t), "main")
    assert abs(float(crit(l, t)) - want) < 1e-5


def test_criterion_finetune_stage(rng):
    l, t = _rand(rng)
    crit = build_criterion(LossConfig(), stage="finetune")
    want = _torch_criterion(_t(l), _t(t), "finetune")
    assert abs(float(crit(l, t)) - want) < 1e-5


def test_criterion_all_empty(rng):
    l, _ = _rand(rng)
    t = np.zeros_like(l)
    crit = build_criterion(LossConfig(), stage="main")
    got = float(crit(l, t))
    want = float(F.binary_cross_entropy_with_logits(_t(l), _t(t)))
    assert abs(got - want) < 1e-5


def test_criterion_tversky(rng):
    l, t = _rand(rng)
    crit = build_criterion(LossConfig(loss_type="tversky"), stage="main")
    tl, tt = _t(l), _t(t)
    B = tt.size(0)
    is_empty = (tt.sum((2, 3), keepdim=True) == 0).float()
    bce = F.binary_cross_entropy_with_logits(tl, tt)
    pos = (is_empty.view(B) == 0).nonzero(as_tuple=True)[0]
    d = _torch_tversky(tl[pos], tt[pos])
    e = _torch_edge(tl[pos], tt[pos]) * 0.05
    assert abs(float(crit(l, t)) - float(d + bce + e)) < 1e-5
