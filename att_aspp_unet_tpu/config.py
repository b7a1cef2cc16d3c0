"""Single typed configuration tree for the whole framework.

The reference scatters configuration over three layers — argparse CLIs,
module-level constant globals (``attention_aspp_unet_pipeline_stage.py:29-31``),
and JSON/env side channels (``thr.json``, ``--spacing_json``, ``MODEL_TAG``,
``CASE_ID``; see ``/root/reference/inference.py:29-31``).  Here everything is
one dataclass tree; the CLI builds instances of these and nothing else reads
globals.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional, Sequence, Tuple


@dataclass(frozen=True)
class PreprocessConfig:
    """Per-frame enhancement applied to every sweep frame on device.

    Mirrors the reference chain min-max→CLAHE(clip=1.0, 8×8)→median-3
    (``/root/reference/inference.py:168-177``), but batched over the whole
    sweep in one XLA program instead of a per-frame OpenCV loop.
    """

    clahe_clip: float = 1.0      # <= 0 disables CLAHE (min-max→median only)
    clahe_grid: Tuple[int, int] = (8, 8)
    median_kernel: int = 3
    img_size: int = 512          # network input H=W (reference IMG_SIZE=512)


@dataclass(frozen=True)
class ModelConfig:
    """Attention-ASPP-UNet architecture knobs.

    Covers both reference variants: the v1 gate with BatchNorm
    (``attention_aspp_unet_pipeline_stage.py:85-92``) and the v2 ablation gate
    (no BN, residual ``x·a + x``, returns ψ maps, auto Fint —
    ``test_ablation.py:128-143``), plus the ablation flags
    ``use_att/use_aspp/att_depth`` (``test_ablation.py:168-204``).
    """

    in_channels: int = 1
    num_classes: int = 1
    base_c: int = 48                 # reference CLI default (…stage.py:545)
    use_att: bool = True
    use_aspp: bool = True
    att_depth: int = 4               # gates active on u4 (=4), u3 (=3)
    gate_variant: str = "v1"         # "v1" (BN gate) | "v2" (residual ψ gate)
    aspp_rates: Tuple[int, ...] = (6, 12, 18)
    aspp_dropout: float = 0.1
    # 'matmul' lowers the dilated branches as nine shifted MXU matmuls
    # (identical parameters & math; see nn.blocks.DilatedConv3x3Matmul)
    aspp_impl: str = "matmul"
    # 3×3 conv lowering: 'direct' (default — fastest exact path in-graph);
    # 'w2d' force width-packing (exact math, only pays stage-resident —
    # see nn/w2d.py autopsy); 'auto' = w2d on TPU where isolated-conv
    # profitable (measured SLOWER in-graph; kept for experimentation);
    # 'int8' post-training-quantized serving convs on the int8 MXU path
    # (per-out-channel weights, absmax-calibrated activations —
    # nn/quant.py; the engine auto-calibrates on its first sweep);
    # 'w2d_stage' width-packs the ENTIRE full-resolution level at serving
    # time with zero relayouts (pack folds into the d1 input conv, unpack
    # into the pool/logits — nn/packed_stage.py; exact, serving-only)
    conv_lowering: str = "direct"
    # Channel-padded level-1 lowering (0 = off): run d1/u1 (the 512²
    # C=base_c stages that fill only 48/128 MXU lanes, probe r15) at this
    # padded width with EXACTLY-ZERO extra channels — numerically the
    # identity on real channels, checkpoint layout convertible both ways
    # (nn/cpad.py).  Requires conv_lowering='direct'.  Probe r42 measures
    # whether the MXU fill gain beats the extra FLOPs (VERDICT r4 #1).
    c1_pad: int = 0
    # rematerialise encoder/decoder stages in the backward pass (trade FLOPs
    # for activation memory — enables much larger global batches)
    remat: bool = False
    # TPU precision policy: bf16 activations, f32 params & batch stats.
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"

    @property
    def returns_psi(self) -> bool:
        return self.gate_variant == "v2"


@dataclass(frozen=True)
class PlainUNetConfig:
    """nnU-Net-style PlainConvUNet used by the baseline path.

    Mirrors the reference plan "2d" (batch 13, patch 448×576, 7 stages,
    base 32 — ``resources/.../plans.json``), predicted with Gaussian-weighted
    50%-overlap tiles + mirror TTA like ``nnUNetPredictor``
    (``/root/reference/model.py:41-49``).
    """

    in_channels: int = 1
    num_classes: int = 3             # background / optimal / suboptimal
    base_c: int = 32
    max_c: int = 512
    n_stages: int = 7
    conv_per_stage: int = 2
    patch_size: Tuple[int, int] = (448, 576)
    tile_step: float = 0.5
    use_gaussian: bool = True
    use_mirroring: bool = True
    mirror_batch: bool = True        # run the 4 mirror-TTA views as one
                                     # 4·tile_batch forward (bigger MXU
                                     # batches, 4× activation memory).
                                     # Probe r14: tb=16+mirror_batch runs the
                                     # sweep at 30 f/s / 32% MFU vs 20 f/s for
                                     # sequential mirrors (NOTES.md round-3).
    tile_batch: int = 32             # patch tiles per forward micro-batch
                                     # (bounds activation HBM).  Probe r45
                                     # swept {16,24,32,48,64}: 32 hits the
                                     # ~50 % MFU plateau (46.9 f/s with
                                     # mirror TTA vs 30.2 at the old 16;
                                     # 64 measures the same 48.0 f/s at 4×
                                     # the activation memory; 24/48 lose to
                                     # tile-count padding — keep it a
                                     # divisor of 4·frames)
    # 3×3 stride-1 conv lowering: 'direct' (default); 'w2d' forces
    # width-packing (exact math, only pays stage-resident — nn/w2d.py)
    conv_lowering: str = "direct"
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"


@dataclass(frozen=True)
class LossConfig:
    """Criterion = weighted BCE + Dice(+Tversky) + Sobel edge loss.

    Reference loss zoo at ``attention_aspp_unet_pipeline_stage.py:173-232``.
    """

    loss_type: str = "combo"         # "combo" (Dice+BCE) | "tversky"
    tversky_alpha: float = 0.7
    tversky_beta: float = 0.3
    dice_smooth: float = 1.0
    edge_weight: float = 0.05
    neg_bce_weight: float = 0.05     # finetune-only empty-mask down-weight


@dataclass(frozen=True)
class AugmentConfig:
    """Device-side augmentation pipeline (reference used albumentations on CPU:
    ``attention_aspp_unet_pipeline_stage.py:149-156``)."""

    hflip_p: float = 0.5
    affine_p: float = 0.7
    scale_range: Tuple[float, float] = (0.92, 1.08)
    rotate_deg: float = 7.0
    translate_frac: float = 0.02
    gamma_p: float = 0.3
    gamma_range: Tuple[float, float] = (0.8, 1.2)
    brightness_contrast_p: float = 0.3
    brightness_limit: float = 0.1
    contrast_limit: float = 0.1
    elastic_p: float = 0.25
    elastic_alpha: float = 8.0
    elastic_sigma: float = 3.0
    # Deterministic CLAHE+median tail applied to every batch (the reference
    # enhanced its PNGs the same way before training).  False trains a model
    # on unequalised input — required for a scout whose serving tier skips
    # CLAHE (PredictConfig.cascade_scout_clahe).
    use_clahe: bool = True


@dataclass(frozen=True)
class TrainConfig:
    """Two-stage (main → finetune) training loop configuration.

    Defaults mirror the reference CLI (``…stage.py:539-550``): batch 8,
    120 epochs, lr 3e-4, AdamW wd 5e-4, 5 % linear warmup → cosine, grad clip
    1.0, early-stop patience 15, seed 2025.
    """

    seed: int = 2025
    stage: str = "main"              # "main" | "finetune"
    batch_size: int = 8              # global batch (sharded over the mesh)
    epochs: int = 120
    lr: float = 3e-4
    weight_decay: float = 5e-4
    grad_clip: float = 1.0
    warmup_frac: float = 0.05        # 0 in finetune stage
    early_stop_patience: int = 15
    val_frac: float = 0.1            # positive-only fallback split
    differential_lr: bool = False    # ablation runner: attention params 2×
    loss: LossConfig = field(default_factory=LossConfig)
    augment: AugmentConfig = field(default_factory=AugmentConfig)


@dataclass(frozen=True)
class PredictConfig:
    """Standalone sweep/PNG prediction settings.

    Mirrors ``predict()`` (``…stage.py:399-523``): hflip TTA, resize back,
    5×5 Gaussian blur on probabilities, thr from ``thr.json`` else 0.48,
    refine mask, top-5-area frames re-ranked by circularity.
    """

    threshold: float = 0.48
    # deployment default is NO TTA, matching the reference's container/ROI
    # path (model_attention_aspp.py:41-65 runs a single forward); the
    # standalone predict CLI (…stage.py:336-338) used hflip TTA — pass
    # tta_hflip=True there explicitly.  TTA doubles forward cost.
    tta_hflip: bool = False
    gaussian_kernel: int = 5
    topk_frames: int = 5
    # extra candidates refined beyond topk in predict_case, so proxy-rank
    # error (the key over-estimates junk shapes, never under-estimates a
    # winner — engine.candidate_rank_areas) can't push a winner out of the
    # set; 11 → 16 refined frames, whose extra refine+transfer cost is
    # noise next to the forward
    refine_margin: int = 11
    min_area_px: int = 20
    min_area_frac: float = 0.0015
    close_kernel: int = 7
    frame_batch: int = 16            # frames per forward micro-batch: b16
                                     # beats b32 in the full no-TTA pipeline
                                     # (0.619 vs 0.671 s/sweep, probe r10c;
                                     # smaller activations fit VMEM better
                                     # and 140 pads to 144 not 160).  The
                                     # reference looped batches of 8.
    # Tier-2 micro-batch for BULK multi-sweep cascade serving
    # (engine.predict_bulk_submit): the S·cascade_scouts promoted frames
    # of a bulk group share micro-batches of this size, so one group's
    # tier 2 fills the MXU better than per-case b8 batches while the
    # per-call fixed block (refine latency, glue — probes r33/r34)
    # amortizes over the whole group.
    bulk_frame_batch: int = 16
    # packed BN-folded forward with fused Pallas conv pairs
    # (infer/fast_forward.py): "auto" = on for single-device TPU runs,
    # off elsewhere; True/False force it.  Default off until the fused
    # kernel measurably beats the flax path on hardware (probe r7/r9).
    fast_forward: object = False
    roi_size: int = 224              # ROI deployment path (model_attention_aspp.py)
    subsample_frames: int = 128      # linspace subsample in the ROI path
    quant_calib_frames: int = 16     # frames used for int8 PTQ activation
                                     # absmax calibration (conv_lowering
                                     # 'int8'; evenly spaced over the first
                                     # sweep the engine sees)
    # Two-tier cascade serving (predict_case only, opt-in): scout every
    # frame with a cheap low-resolution forward, then run the full
    # img_size forward only on the cascade_scouts highest-ranked frames.
    # The final candidate ranking / refine / select run on full-res
    # probabilities exactly as in the direct path — the only deviation is
    # that a frame outside the scout set cannot be picked.
    # Philosophically the reference's own deployment path cuts harder
    # (128-frame subsample + 224² crop, model_attention_aspp.py:45-55);
    # this keeps every frame in play at tier 1.
    cascade: bool = False
    # Scout forward resolution.  When cascade_scout_weights points at a
    # checkpoint whose sibling summary.json declares img_size, the engine
    # adopts THAT size (a scout must run at the resolution it was trained
    # at — off-distribution scouting is the failure that sank scout-192,
    # NOTES.md r21; the trained-at-128 scout is the r31 win) and this
    # field only applies to scout-less cascades.
    cascade_img_size: int = 256
    # Frames promoted to the full forward.  The refined candidate set and
    # the tier-2 micro-batch are clamped to this count (engine
    # predict_case_submit), so 8 promotes == ONE b8 tier-2 micro-batch
    # with every promoted frame refined at full res.  Promote-count
    # fidelity was swept on trained weights twice (probes r30 and r32,
    # 12 seeds each): pick agreement with the direct engine is 12/12 at
    # 8/16/24/32 promotes, the direct pick survives INSIDE the refined
    # set 12/12 even when that set is 8, and median AC error vs analytic
    # truth is identical.  Perf (840-frame case, 128-px distilled scout):
    # 8 promotes 9263 f/s vs 7149 at 16 — the padded half of the b16
    # tier-2 batch was the largest remaining fixed cost (probe r32).
    cascade_scouts: int = 8
    # Enhance (CLAHE+median) the scout tier at cascade_img_size instead of
    # native resolution, and enhance only the promoted frames natively.
    # Tier 2 stays bit-identical to direct (enhancement is per-frame);
    # only the scout RANKING sees low-res CLAHE adaptation.  Measured
    # (probe r23, trained weights): 8/8 pick agreement with identical ACs
    # vs the native-enhance scout, sweep ×1.17, 840-frame case ×1.37.
    cascade_lowres_enhance: bool = True
    # Micro-batch for the scout tier's forward; 0 = frame_batch.  At the
    # scout resolution activations are 1/4 the size, so a larger batch
    # fills the MXU better without VMEM pressure: ×1.41 on the 840-frame
    # case going 16 → 128 (probes r24/r24b — 1169 f/s).  The engine caps
    # the effective batch so zero-padding never exceeds n/4 of the stack
    # (engine.scout_micro_batch), so short sweeps aren't over-padded.
    cascade_scout_batch: int = 128
    # Optional DISTILLED SCOUT: an npz_weights checkpoint of a smaller
    # AttentionASPPUNet (base_c cascade_scout_base_c) used only for the
    # tier-1 ranking forward — the scout only has to rank frames, and the
    # full-capacity scout forward is ~62 % of the case's device time
    # (probe r25).  Tier 2 always runs the main model, so served masks
    # never depend on scout quality; promotion fidelity is measured in
    # probe r26.  cascade_scout_thr: the scout's own calibrated
    # probability threshold for the rank mask.  0 = AUTO: adopt
    # ``best_thr_no_tta``/``best_thr`` from the thr.json (or summary.json)
    # next to the scout weights — the rank mask thresholds the SCOUT's
    # probability distribution, not the main model's, and every fidelity
    # probe ran with the scout's calibrated value; with no sidecar file
    # the main threshold is used.  cascade_scout_base_c: None = AUTO — read ``base_c``
    # from the summary.json next to the weights (``cli train
    # --export_npz`` records it), fallback 16; an explicit value
    # overrides.  A mismatch is a hard shape error at load, never a
    # silent wrong-net serve.
    cascade_scout_weights: Optional[str] = None
    cascade_scout_base_c: Optional[int] = None
    # Scout-tier preprocessing: False skips CLAHE in tier 1 (min-max →
    # median only; requires a scout trained with AugmentConfig
    # use_clahe=False and calibrated through a clahe_clip<=0 predict
    # path).  None = AUTO: read ``use_clahe`` from the summary.json next
    # to cascade_scout_weights (train_synthetic_tpu writes it), so a
    # scout can never be served with the wrong preprocessing by default;
    # no summary → True.  Measured (probe r29, trained weights): 12/12
    # identical picks, 840-frame case ×1.31 (2367 → 3100 f/s).  Only
    # meaningful with cascade_lowres_enhance; tier 2 always enhances per
    # PreprocessConfig, so served masks are unaffected.
    cascade_scout_clahe: Optional[bool] = None
    # Tier-1 rank key: "refined" = close + pooled-hole-fill proxy (the
    # tier-2/direct key, candidate_rank_areas), "closed" = closed area
    # only.  r28's standalone programs priced the fill proxy at ~73 % of
    # the key, but in the FUSED cascade it costs ~1 % (probe r29 — the
    # r15c/r18d lesson again: standalone-program costs don't survive
    # in-graph fusion).  "refined" stays the default; "closed" remains a
    # measured, fidelity-verified opt-out (12/12 picks identical).
    cascade_scout_rank: str = "refined"
    cascade_scout_thr: float = 0.0
    # Directory of AOT-serialized case-serving executables
    # (utils/aot_cache; exported by `cli warm --export-aot`).  When set,
    # predict_case_submit serves a matching shape from the deserialized
    # executable instead of jit — no remote compile at all on a fresh
    # process (probe r41: deserialize 0.45 s + one ~13 s device load vs
    # 43–174 s of remote-compile variance, outputs bit-identical).  A
    # missing or stale entry silently falls back to the jit path.
    aot_dir: Optional[str] = None


@dataclass(frozen=True)
class CalibrateConfig:
    """Threshold calibration sweep.  Unlike the reference (which re-runs every
    forward pass for each of 17 thresholds, ``…stage.py:383-392``), we compute
    probabilities once and sweep thresholds vectorised on device."""

    thr_lo: float = 0.1
    thr_hi: float = 0.9
    thr_steps: int = 17
    with_ci: bool = False            # ablation variant adds t-dist 95 % CI


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout.  One axis ("data") shards the frame/batch axis —
    frames of a sweep are independent, so sweep inference is pure DP over ICI.
    A "model" axis is expressible for TP but unused at this model scale."""

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallelism: int = 1


@dataclass(frozen=True)
class ContainerConfig:
    """Grand-Challenge container contract (``/root/reference/inference.py``):
    read ``<input>/images/stacked-fetal-ultrasound/*.mha|*.tiff``, write
    ``<output>/images/fetal-abdomen-segmentation/<case>.mha`` (uint8, label 2,
    spacing 0.28, compressed) + ``<output>/fetal-abdomen-frame-number.json``.
    ``MODEL_TAG`` selects baseline vs att_aspp; ``CASE_ID`` names the output."""

    input_path: str = "./test/input"
    output_path: str = "./test/output"
    model_tag: str = "baseline"      # "baseline" | "att_aspp"
    case_id: str = "output"
    spacing_mm: float = 0.28
    frames_per_sweep: int = 140


@dataclass(frozen=True)
class Config:
    preprocess: PreprocessConfig = field(default_factory=PreprocessConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    plain_unet: PlainUNetConfig = field(default_factory=PlainUNetConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    predict: PredictConfig = field(default_factory=PredictConfig)
    calibrate: CalibrateConfig = field(default_factory=CalibrateConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    container: ContainerConfig = field(default_factory=ContainerConfig)


def _to_jsonable(obj):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _to_jsonable(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    return obj


def save_config(cfg, path: Path) -> None:
    Path(path).write_text(json.dumps(_to_jsonable(cfg), indent=2))


_NESTED = {
    "preprocess": PreprocessConfig, "model": ModelConfig,
    "plain_unet": PlainUNetConfig, "train": TrainConfig,
    "predict": PredictConfig, "calibrate": CalibrateConfig,
    "mesh": MeshConfig, "container": ContainerConfig,
    "loss": LossConfig, "augment": AugmentConfig,
}


def load_config(path: Path) -> Config:
    data = json.loads(Path(path).read_text())

    def build(cls, d):
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name not in d:
                continue
            v = d[f.name]
            if f.name in _NESTED and isinstance(v, dict):
                v = build(_NESTED[f.name], v)
            elif isinstance(v, list):
                v = tuple(v)
            kwargs[f.name] = v
        return cls(**kwargs)

    return build(Config, data)
