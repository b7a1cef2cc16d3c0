"""Unified command-line interface.

One typed CLI replacing the reference's scattered per-script parsers
(``attention_aspp_unet_pipeline_stage.py:539-550``, ``test_ablation.py:883-
911``, plus six standalone scripts): train / calibrate / predict /
infer-container / eval-seg / eval-ac / vis-errors / convert / split /
leak-check / dataset-report.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path

import numpy as np


def _base_config(args) -> "Config":
    from .config import (CalibrateConfig, Config, LossConfig, ModelConfig,
                         PredictConfig, TrainConfig)

    if getattr(args, "deterministic", False):
        # device-side compute is deterministic by default in XLA; this
        # reseeds the host RNGs the data pipeline uses (the reference's
        # opt-in cudnn-deterministic mode, test_ablation.py:45-69)
        from .utils.seeding import set_seed
        set_seed(getattr(args, "seed", 2025))

    model = ModelConfig(
        base_c=getattr(args, "base_c", 48),
        use_att=not getattr(args, "no_att", False),
        use_aspp=not getattr(args, "no_aspp", False),
        att_depth=getattr(args, "att_depth", 4),
        gate_variant=getattr(args, "gate", "v1"),
        # serving-only PTQ path (nn/quant.py); only the predict/container
        # parsers expose the flag
        conv_lowering="int8" if getattr(args, "int8", False) else "direct",
        # channel-padded 512² level (nn/cpad.py; probe r42: direct path
        # ×1.04 at 64, exact) — requires the direct lowering
        c1_pad=(0 if getattr(args, "int8", False)
                else getattr(args, "c1_pad", 0) or 0),
    )
    loss = LossConfig(edge_weight=(0.0 if getattr(args, "no_edge_loss",
                                                  False)
                                   else getattr(args, "edge_w", 0.05)),
                      neg_bce_weight=getattr(args, "neg_bce_w", 0.05))
    train = TrainConfig(
        seed=getattr(args, "seed", 2025),
        stage=getattr(args, "stage", "main"),
        batch_size=getattr(args, "batch_size", 8),
        epochs=getattr(args, "epochs", 120),
        lr=getattr(args, "lr", 3e-4),
        differential_lr=getattr(args, "differential_lr", False),
        loss=loss,
    )
    predict = PredictConfig(
        cascade=getattr(args, "cascade", False),
        cascade_scout_weights=getattr(args, "scout_weights", None),
        # None = auto-detect from the scout's sibling summary.json
        cascade_scout_base_c=getattr(args, "scout_base_c", None),
        cascade_scout_thr=getattr(args, "scout_thr", 0.0),
        # None = auto-detect from the scout's sibling summary.json
        cascade_scout_clahe=(False if getattr(args, "scout_no_clahe", False)
                             else None),
        cascade_scout_rank=getattr(args, "scout_rank", "refined"),
        # AOT-serialized serving executables (utils/aot_cache; exported by
        # `warm --export-aot`): boot with no remote compile at all
        aot_dir=getattr(args, "aot", None))
    return Config(model=model, train=train, predict=predict)


def load_variables(weights: Path, cfg, img_size: int = 64,
                   model_tag: str = "att_aspp"):
    """Load model variables from an Orbax checkpoint dir or a torch .pt.

    Dispatches on ``model_tag``: ``att_aspp`` initialises the flagship
    AttentionASPPUNet and maps its torch layout
    (``…stage.py:134-141`` key-renaming semantics, handled by
    ``utils.torch_import``); ``baseline`` initialises PlainConvUNet and maps
    nnU-Net v2 ``checkpoint_final.pth`` layouts via ``utils.nnunet_import``
    (reference loader: ``/root/reference/model.py:35-60``)."""
    import jax
    import jax.numpy as jnp

    weights = Path(weights)
    if not weights.exists():
        # fail fast — model init below costs a (remote) compile
        raise FileNotFoundError(f"weights not found: {weights}")
    if weights.suffix == ".npz":
        # compact flat archive (benchmarks/train_synthetic_tpu.py exports)
        # — needs no init template; returning before model.init avoids a
        # throwaway forward-pass compile on every CLI startup
        from .utils.npz_weights import load_npz_variables
        return load_npz_variables(weights)
    if model_tag == "baseline":
        from .models import PlainConvUNet
        model = PlainConvUNet.from_config(cfg.plain_unet)
        in_ch = cfg.plain_unet.in_channels
    else:
        from .models import AttentionASPPUNet
        model = AttentionASPPUNet.from_config(cfg.model)
        in_ch = cfg.model.in_channels
    if getattr(model, "conv_lowering", "direct") == "int8":
        # the param template doesn't need the quantized path (uncalibrated
        # int8 would compile a throwaway program); shapes are identical
        model = model.clone(conv_lowering="direct")
    if weights.suffix in (".pt", ".pth"):
        # only the torch importers need an init template (shape/layout map)
        init = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, img_size, img_size, in_ch)),
                          train=False)
        if model_tag == "baseline":
            from .utils.nnunet_import import load_nnunet_checkpoint
            return load_nnunet_checkpoint(weights, cfg.plain_unet, init)
        from .utils.torch_import import load_torch_checkpoint
        return load_torch_checkpoint(weights, cfg.model, init)
    # orbax checkpoint directory
    import orbax.checkpoint as ocp

    restored = ocp.PyTreeCheckpointer().restore(str(weights.absolute()))
    return {"params": restored["params"],
            "batch_stats": restored.get("batch_stats", {})}


def cmd_train(args) -> int:
    from .train.data import (ArrayDataset, collect_pairs,
                             positive_only_val_split)
    from .train.train_loop import fit

    cfg = _base_config(args)
    # training default is the packed 512-level lowering: f64-exact vs
    # direct (params, grads and BN stats; tests/test_packed_stage.py) and
    # ×1.38 faster on hardware at the reference config (NOTES.md r22).
    # Serving keeps "direct" — the same packing LOSES there (r20).
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, conv_lowering=getattr(args, "lowering", None)
        or "w2d_stage"))
    # scout-distillation knobs (NOTES.md r26/r29/r31): a cascade tier-1
    # ranker is just this train loop at a lower resolution, smaller base_c
    # and optionally a CLAHE-free enhance chain — the choices are recorded
    # in summary.json below so serving auto-adopts them
    no_clahe = bool(getattr(args, "no_clahe", False))
    cfg = dataclasses.replace(
        cfg,
        preprocess=dataclasses.replace(
            cfg.preprocess, img_size=getattr(args, "img_size", 512),
            clahe_clip=0.0 if no_clahe else cfg.preprocess.clahe_clip),
        train=dataclasses.replace(cfg.train, augment=dataclasses.replace(
            cfg.train.augment, use_clahe=not no_clahe)))
    imgs, msks = collect_pairs(Path(args.train_dir) / "images",
                               Path(args.train_dir) / "masks")
    if args.neg_dir:
        neg_imgs, _ = collect_pairs(Path(args.neg_dir) / "images", None)
        imgs += neg_imgs
        msks += [None] * len(neg_imgs)
    pos = sum(m is not None for m in msks)
    print(f"Train samples: pos={pos}, neg={len(msks) - pos}")

    if args.val_dir:
        val_imgs, val_msks = collect_pairs(Path(args.val_dir) / "images",
                                           Path(args.val_dir) / "masks")
        tr_pair = (imgs, msks)
    else:
        tr_pair, (val_imgs, val_msks) = positive_only_val_split(
            imgs, msks, cfg.train.seed, cfg.train.val_frac)

    S = cfg.preprocess.img_size
    train_ds = ArrayDataset.from_paths(*tr_pair, S)
    val_ds = ArrayDataset.from_paths(val_imgs, val_msks, S)

    init_variables = None
    if args.stage == "finetune":
        if not args.pretrained:
            raise SystemExit("--pretrained required for --stage finetune")
        init_variables = load_variables(Path(args.pretrained), cfg, S)
        print(f"loaded pretrained {args.pretrained}")

    out = fit(cfg, train_ds, val_ds, Path(args.output_dir),
              init_variables=init_variables)
    print(f"best Dice {out['best_dice']:.4f} → {out['best_path']}")

    out_root = Path(args.output_dir)
    if getattr(args, "export_npz", False):
        # compact f16 weights next to summary.json — the exact layout
        # predict --scout_weights / bench.py consume (the serving forward
        # runs bf16 anyway; resources/synthetic* ship this way)
        import jax

        from .train.train_loop import create_train_state, load_checkpoint
        from .utils.npz_weights import save_npz_variables

        state = create_train_state(cfg.model, cfg.train, steps_per_epoch=1,
                                   rng=jax.random.PRNGKey(0),
                                   sample_hw=(S, S))
        state, _ = load_checkpoint(Path(out["best_path"]), state)
        save_npz_variables({"params": jax.device_get(state.params),
                            "batch_stats": jax.device_get(state.batch_stats)},
                           out_root / "weights.npz")
        print(f"exported {out_root / 'weights.npz'}")
    # provenance + the serving knobs the engine auto-adopts when these
    # weights rank a cascade tier: infer/engine.py reads img_size and
    # use_clahe from the summary.json next to the weights so a scout is
    # never served a resolution or preprocessing it wasn't trained on
    from .io import write_json
    write_json(out_root / "summary.json", {
        "best_val_dice": out["best_dice"],
        "epochs_run": out["epochs_run"],
        "img_size": S,
        "base_c": cfg.model.base_c,
        "use_clahe": not no_clahe,
        "stage": cfg.train.stage,
    }, indent=2)
    return 0


def _with_tta(cfg, args):
    """predict/calibrate follow the reference CLI (hflip TTA ON,
    ``…stage.py:336-338``) unless --no-tta; the container path keeps the
    reference ROI behavior (no TTA) via the PredictConfig default."""
    return dataclasses.replace(cfg, predict=dataclasses.replace(
        cfg.predict, tta_hflip=not args.no_tta))


def cmd_calibrate(args) -> int:
    from .config import CalibrateConfig
    from .infer.calibrate import calibrate

    cfg = _with_tta(_base_config(args), args)
    cfg = dataclasses.replace(cfg, calibrate=CalibrateConfig(with_ci=args.ci))
    variables = load_variables(Path(args.weights), cfg,
                               cfg.preprocess.img_size)
    calibrate(cfg, variables, Path(args.val_dir), Path(args.output_dir))
    return 0


def cmd_predict(args) -> int:
    from .infer.predict_cli import predict_directory

    pbulk = int(getattr(args, "bulk", 0) or 0)
    if pbulk == 1 or pbulk < 0:
        # same typo guard as `warm --bulk`: 1 would silently serve the
        # plain per-case path while the user believes groups are active
        raise SystemExit("--bulk takes a group size >= 2 (or 0 to disable)")
    if not getattr(args, "cascade", False):
        # the scout flags only affect the cascade's tier-1 ranking —
        # without --cascade they would be silently ignored and the user
        # would get the exhaustive direct path believing the distilled
        # scout is active (the --bulk misuse already raises, in
        # predict_directory; be consistent)
        for flag in ("scout_weights", "scout_thr", "scout_base_c",
                     "scout_no_clahe"):
            if getattr(args, flag, None):
                raise SystemExit(f"--{flag} requires --cascade")
        if getattr(args, "scout_rank", "refined") != "refined":
            raise SystemExit("--scout_rank requires --cascade")
    cfg = _with_tta(_base_config(args), args)
    variables = load_variables(Path(args.weights), cfg,
                               cfg.preprocess.img_size)
    noatt = None
    if getattr(args, "weights_noatt", None):
        # the reference builds the comparison model gate-free with
        # att_depth 0 but the same width/ASPP (test_ablation.py:800-802)
        na_cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, use_att=False, att_depth=0))
        noatt = (na_cfg, load_variables(Path(args.weights_noatt), na_cfg,
                                        cfg.preprocess.img_size))
    predict_directory(cfg, variables, Path(args.input_dir), Path(args.out_dir),
                      spacing_json=Path(args.spacing_json)
                      if args.spacing_json else None,
                      threshold=args.thr,
                      slice_metrics=args.slice_metrics,
                      topk_viz=args.topk_viz,
                      viz_att=getattr(args, "viz_att", False),
                      noatt=noatt,
                      bulk_group=getattr(args, "bulk", 0))
    return 0


def cmd_warm(args) -> int:
    """Pre-compile the serving programs for declared sweep shapes.

    The persistent XLA compilation cache keys on HLO, so running each
    shape once here means a deployment's first real case skips the cold
    compiles (refine alone is ~2 min cold at native resolution —
    NOTES.md).  All-zero sweeps compile the identical programs: shapes,
    not content, determine the HLO."""
    import time

    import numpy as np

    from .infer.engine import AttAsppEngine
    from .models import AttentionASPPUNet
    from .utils.compile_cache import enable_compilation_cache

    bulk = int(getattr(args, "bulk", 0) or 0)
    if bulk > 1 and not args.cascade:
        raise SystemExit("--bulk requires --cascade")
    if bulk == 1 or bulk < 0:
        # a --bulk 1 typo would pass the cascade guard yet warm no bulk
        # program (groups need >= 2 cases) — fail loud instead of silently
        # warming nothing
        raise SystemExit("--bulk takes a group size >= 2 (or 0 to disable)")
    enable_compilation_cache()
    cfg = _base_config(args)
    from .config import PreprocessConfig
    cfg = dataclasses.replace(
        cfg, preprocess=PreprocessConfig(img_size=args.img_size))
    if args.lowering:
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, conv_lowering=args.lowering))
    cfg = dataclasses.replace(cfg, predict=dataclasses.replace(
        cfg.predict, tta_hflip=bool(args.tta)))
    if args.weights:
        variables = load_variables(Path(args.weights), cfg,
                                   cfg.preprocess.img_size)
    else:
        import jax
        import jax.numpy as jnp

        model = AttentionASPPUNet.from_config(cfg.model)
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.preprocess.img_size,
                       cfg.preprocess.img_size, 1), jnp.float32),
            train=False)
    engine = AttAsppEngine(cfg, variables)
    # The threshold is a STATIC jit arg (baked into the HLO), so warming at
    # the config default would not pre-compile the program a calibrated
    # deployment actually serves — resolve it exactly like predict does
    # (--thr override, else thr.json, else the config default).
    if args.thr is not None:
        thr = float(args.thr)
    else:
        from .infer.predict_cli import load_threshold
        thr = load_threshold(cfg, Path(args.thr_json))
    bulk = int(getattr(args, "bulk", 0) or 0)
    if getattr(args, "export_aot", None):
        # AOT-serialize the case-serving executables instead of relying on
        # the compile cache: a fresh serving process (`predict --aot DIR`)
        # deserializes them with NO remote compile at all (probes
        # r38/r40/r41 — the sweep-shaped program's cross-process cache hit
        # is at the mercy of remote-compile-service variance; the
        # serialized executable is deterministic).  Export on the hardware
        # + jax version you deploy on; entries are fingerprinted and a
        # mismatch falls back to jit.
        shapes = [tuple(int(t) for t in spec.lower().split("x"))
                  for spec in args.shapes.split(",")]
        engine.export_aot(args.export_aot, shapes, threshold=thr,
                          bulk=bulk, roi=bool(getattr(args, "roi", False)),
                          log=print)
        return 0
    for spec in args.shapes.split(","):
        n, h, w = (int(t) for t in spec.lower().split("x"))
        sweep = np.zeros((n, h, w), np.uint8)
        t0 = time.time()
        engine.predict_case(sweep, (0.28, 0.28), threshold=thr)
        print(f"[warm] {spec}: thr {thr:.3f} compiled+ran in "
              f"{time.time() - t0:.1f}s")
        if bulk > 1:
            # predict --bulk N serves a DIFFERENT program per (S, N, H, W)
            # — one compile per group size; warm the full-group shape too
            # (singleton tail groups route through predict_case, warmed
            # above; other ragged sizes pay their own compile once)
            group = np.zeros((bulk, n, h, w), np.uint8)
            t0 = time.time()
            engine.predict_bulk_collect(
                engine.predict_bulk_submit(group, thr), (0.28, 0.28))
            print(f"[warm] bulk {bulk}x{spec}: thr {thr:.3f} "
                  f"compiled+ran in {time.time() - t0:.1f}s")
    return 0


def cmd_infer_container(args) -> int:
    from .config import ContainerConfig
    from .infer.container import run_from_env

    cfg = _base_config(args)
    cfg = dataclasses.replace(cfg, container=ContainerConfig(
        input_path=args.input, output_path=args.output,
        model_tag=args.model_tag, case_id=args.case_id))
    if args.plans:
        from .utils.nnunet_import import load_plans_config
        cfg = dataclasses.replace(cfg, plain_unet=load_plans_config(
            Path(args.plans), dataset_json=Path(args.dataset_json)
            if args.dataset_json else None, base=cfg.plain_unet))
    if args.weights:
        variables = load_variables(Path(args.weights), cfg,
                                   cfg.preprocess.img_size,
                                   model_tag=args.model_tag)
    else:
        # contract smoke-testing without a checkpoint: random init
        import jax
        import jax.numpy as jnp

        if args.model_tag == "baseline":
            from .models import PlainConvUNet
            model = PlainConvUNet.from_config(cfg.plain_unet)
        else:
            from .models import AttentionASPPUNet
            model = AttentionASPPUNet.from_config(cfg.model)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 1)), train=False)
        print("[warn] no --weights given: using random init (smoke mode)")
    return run_from_env(cfg, variables)


def cmd_eval_seg(args) -> int:
    from .evals.seg_metrics import evaluate_directories

    evaluate_directories(Path(args.gt), Path(args.base), Path(args.new),
                         out_csv=Path(args.out_csv),
                         new_suffix=args.new_suffix,
                         plot_dir=Path(args.plot_dir) if args.plot else None)
    return 0


def cmd_eval_ac(args) -> int:
    from .evals.ac_analysis import analyze_ac

    analyze_ac(args.gt, args.baseline, args.new, args.out,
               frames_per_sweep=args.fps)
    return 0


def cmd_vis_errors(args) -> int:
    from .evals.visualize import render_worst_cases

    render_worst_cases(Path(args.csv), Path(args.gt), Path(args.base),
                       Path(args.new), Path(args.out),
                       img_dir=Path(args.images) if args.images else None,
                       top=args.top, alpha=args.alpha, edge=args.edge)
    return 0


def cmd_convert(args) -> int:
    from .tools.convert import convert_frames_with_negatives

    convert_frames_with_negatives(
        args.mha_root, args.out_root, topk=args.topk,
        neighbor_pad=args.neighbor_pad, min_area_mm2=args.min_area_mm2,
        min_area_px=args.min_area_px, neg_strategy=args.neg_strategy,
        neg_ratio=args.neg_ratio, neg_cap=args.neg_cap,
        neg_stride=args.neg_stride, seed=args.seed,
        export_neg_only=args.export_neg_only,
        neg_total_cap=args.neg_total_cap)
    return 0


def cmd_split(args) -> int:
    from .tools.split import split_train_val

    split_train_val(args.raw_root, args.out_root, args.train_frac, args.seed)
    return 0


def cmd_leak_check(args) -> int:
    from .tools.leak_check import check_split_leak

    res = check_split_leak(args.train, args.val, args.out,
                           recursive=args.recursive, by_stem=args.by_stem)
    return 1 if res["present"] else 0


def cmd_dataset_report(args) -> int:
    from .evals.reports import (load_flat_images_masks, load_from_directory,
                                load_from_frame_index, make_dataset_reports)

    if args.frame_index:
        df = load_from_frame_index(Path(args.frame_index))
    elif args.flat_root:
        df = load_flat_images_masks(Path(args.flat_root),
                                    split_name_override=args.flat_split_name)
    elif args.root:
        df = load_from_directory(Path(args.root))
    else:
        raise SystemExit("one of --frame_index / --flat_root / --root required")
    if df.empty:
        raise SystemExit("no frames found")
    make_dataset_reports(df, Path(args.outdir))
    return 0


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("att-aspp-unet-tpu",
                                description=__doc__)
    sp = p.add_subparsers(dest="cmd", required=True)

    def model_flags(q):
        q.add_argument("--base_c", type=int, default=48)
        q.add_argument("--no_att", action="store_true")
        q.add_argument("--no_aspp", action="store_true")
        q.add_argument("--att_depth", type=int, default=4)
        q.add_argument("--gate", choices=["v1", "v2"], default="v1")
        # reference ablation CLI flag (test_ablation.py:894); device-side
        # determinism is the JAX default (utils/seeding.py) so this only
        # reseeds the host RNGs — accepted for drop-in compatibility
        q.add_argument("--deterministic", action="store_true")

    t = sp.add_parser("train")
    t.add_argument("--stage", choices=["main", "finetune"], default="main")
    t.add_argument("--seed", type=int, default=2025)
    t.add_argument("--train_dir", required=True)
    t.add_argument("--neg_dir")
    t.add_argument("--val_dir")
    t.add_argument("--output_dir", default="./checkpoints")
    t.add_argument("--pretrained")
    t.add_argument("--epochs", type=int, default=120)
    t.add_argument("--batch_size", type=int, default=8)
    t.add_argument("--lr", type=float, default=3e-4)
    t.add_argument("--edge_w", type=float, default=0.05)
    t.add_argument("--no_edge_loss", action="store_true",
                   help="drop the Sobel edge-loss term (reference ablation "
                        "flag, test_ablation.py:895; same as --edge_w 0)")
    t.add_argument("--neg_bce_w", type=float, default=0.05)
    t.add_argument("--differential_lr", action="store_true")
    t.add_argument("--img_size", type=int, default=512,
                   help="network input resolution (reference IMG_SIZE=512, "
                        "…stage.py:29); lower it to distill a cascade "
                        "tier-1 scout — serving auto-adopts the trained "
                        "size from summary.json (NOTES.md r31)")
    t.add_argument("--no_clahe", action="store_true",
                   help="train with a CLAHE-free enhance chain; a scout "
                        "trained this way skips tier-1 CLAHE at serving "
                        "time (recorded in summary.json, NOTES.md r29)")
    t.add_argument("--export_npz", action="store_true",
                   help="after training, export the best checkpoint as "
                        "compact f16 weights.npz + summary.json in "
                        "--output_dir (the layout predict --scout_weights "
                        "and bench.py consume)")
    t.add_argument("--lowering", choices=["direct", "w2d_stage"],
                   default="w2d_stage",
                   help="conv lowering for the train step (default "
                        "w2d_stage: packed 512-level, f64-exact vs direct "
                        "and x1.38 faster on TPU — NOTES.md r22/r20)")
    model_flags(t)
    t.set_defaults(fn=cmd_train)

    ca = sp.add_parser("calibrate")
    ca.add_argument("--weights", required=True)
    ca.add_argument("--val_dir", required=True)
    ca.add_argument("--output_dir", default="./checkpoints")
    ca.add_argument("--ci", action="store_true")
    ca.add_argument("--no-tta", action="store_true",
                    help="disable hflip TTA (the reference calibrate "
                         "used TTA)")
    model_flags(ca)
    ca.set_defaults(fn=cmd_calibrate)

    pr = sp.add_parser("predict")
    pr.add_argument("--weights", required=True)
    pr.add_argument("--input_dir", required=True)
    pr.add_argument("--out_dir", default="./preds")
    pr.add_argument("--spacing_json")
    pr.add_argument("--thr", type=float)
    pr.add_argument("--slice_metrics", action="store_true")
    pr.add_argument("--topk_viz", action="store_true")
    pr.add_argument("--no-tta", action="store_true",
                    help="disable hflip TTA (the reference predict CLI "
                         "used TTA, 2x faster without)")
    pr.add_argument("--int8", action="store_true",
                    help="serve the forward on the int8 MXU path "
                         "(post-training quantization, auto-calibrated; "
                         "nn/quant.py)")
    pr.add_argument("--c1_pad", type=int, default=0,
                    help="run the 512² level at this zero-padded channel "
                         "width (64 measured ×1.04 on the direct path, "
                         "probe r42; numerically exact — nn/cpad.py). "
                         "Incompatible with --int8/--lowering")
    pr.add_argument("--cascade", action="store_true",
                    help="two-tier sweep serving: scout all frames at "
                         "half resolution, full-res forward only on the "
                         "top candidates (infer/engine.py cascade path)")
    pr.add_argument("--bulk", type=int, default=0,
                    help="group up to N consecutive same-shape .mha cases "
                         "into ONE device program (engine.predict_bulk, "
                         "x1.5 serving throughput — probe r35); requires "
                         "--cascade; outputs identical to per-case serving")
    pr.add_argument("--aot", default=None, metavar="DIR",
                    help="serve case programs from AOT-serialized "
                         "executables in DIR (exported by `warm "
                         "--export-aot` on this hardware) — no remote "
                         "compile at boot; shapes without an entry fall "
                         "back to jit")
    pr.add_argument("--scout_weights", default=None,
                    help="npz checkpoint of a DISTILLED SCOUT for the "
                         "cascade's tier-1 ranking forward (served masks "
                         "always come from the main model); e.g. "
                         "resources/synthetic_scout/weights.npz")
    pr.add_argument("--scout_base_c", type=int, default=None,
                    help="scout width; default auto-reads base_c from "
                         "the summary.json next to --scout_weights "
                         "(fallback 16)")
    pr.add_argument("--scout_thr", type=float, default=0.0,
                    help="scout's calibrated rank threshold "
                         "(0 = main threshold)")
    pr.add_argument("--scout_no_clahe", action="store_true",
                    help="skip CLAHE in the scout tier's preprocessing "
                         "(for scouts trained with --no-clahe; tier 2 "
                         "and served masks are unaffected).  Usually "
                         "unnecessary: the engine auto-reads use_clahe "
                         "from the summary.json next to the weights")
    pr.add_argument("--scout_rank", default="refined",
                    choices=("refined", "closed"),
                    help="tier-1 rank key: refined-area proxy (default) "
                         "or closed-area only (cheaper, no hole-fill)")
    pr.add_argument("--viz_att", action="store_true",
                    help="write per-PNG attention panels (raw | prob | "
                         "mean psi | mask) to <out>/panels "
                         "(reference test_ablation.py:832-842)")
    pr.add_argument("--weights_noatt",
                    help="no-attention checkpoint for the panel's second "
                         "row (--viz_att)")
    model_flags(pr)
    pr.set_defaults(fn=cmd_predict)

    ic = sp.add_parser("infer-container")
    ic.add_argument("--input", default="./test/input")
    ic.add_argument("--output", default="./test/output")
    ic.add_argument("--model-tag", default="baseline",
                    choices=["baseline", "att_aspp"])
    ic.add_argument("--case-id", default="output")
    ic.add_argument("--weights")
    ic.add_argument("--plans", help="nnU-Net plans.json for the baseline "
                    "model architecture")
    ic.add_argument("--aot", default=None, metavar="DIR",
                    help="serve from AOT-serialized executables (exported "
                         "via `warm --export-aot --roi` on this hardware); "
                         "env ATT_ASPP_AOT_DIR is the container-contract "
                         "equivalent")
    ic.add_argument("--dataset-json", help="nnU-Net dataset.json "
                    "(num_classes / in_channels)")
    ic.add_argument("--int8", action="store_true",
                    help="att_aspp tag: serve the forward on the int8 MXU "
                         "path (post-training quantization, nn/quant.py)")
    model_flags(ic)
    ic.set_defaults(fn=cmd_infer_container)

    es = sp.add_parser("eval-seg")
    es.add_argument("--gt", required=True)
    es.add_argument("--base", required=True)
    es.add_argument("--new", required=True)
    es.add_argument("--out_csv", default="seg_eval.csv")
    es.add_argument("--new_suffix", default="_mask")
    es.add_argument("--plot", action="store_true")
    es.add_argument("--plot_dir", default="plots")
    es.set_defaults(fn=cmd_eval_seg)

    ea = sp.add_parser("eval-ac")
    ea.add_argument("--gt", required=True)
    ea.add_argument("--baseline", required=True)
    ea.add_argument("--new", required=True)
    ea.add_argument("--out", default="ac_analysis_results")
    ea.add_argument("--fps", type=int, default=140)
    ea.set_defaults(fn=cmd_eval_ac)

    ve = sp.add_parser("vis-errors")
    ve.add_argument("--csv", required=True)
    ve.add_argument("--gt", required=True)
    ve.add_argument("--base", required=True)
    ve.add_argument("--new", required=True)
    ve.add_argument("--out", default="vis")
    ve.add_argument("--images")
    ve.add_argument("--top", type=int, default=10)
    ve.add_argument("--alpha", type=float, default=0.35)
    ve.add_argument("--edge", type=int, default=2)
    ve.set_defaults(fn=cmd_vis_errors)

    cv = sp.add_parser("convert")
    cv.add_argument("--mha_root", required=True)
    cv.add_argument("--out_root", required=True)
    cv.add_argument("--topk", type=int, default=3)
    cv.add_argument("--neighbor_pad", type=int, default=0)
    cv.add_argument("--min_area_mm2", type=float, default=80.0)
    cv.add_argument("--min_area_px", type=int, default=100)
    cv.add_argument("--neg_strategy", default="random",
                    choices=["all", "random", "stride"])
    cv.add_argument("--neg_ratio", type=float, default=0.0)
    cv.add_argument("--neg_cap", type=int, default=5)
    cv.add_argument("--neg_stride", type=int, default=5)
    cv.add_argument("--seed", type=int, default=2025)
    cv.add_argument("--export_neg_only", action="store_true")
    cv.add_argument("--neg_total_cap", type=int, default=0)
    cv.set_defaults(fn=cmd_convert)

    spx = sp.add_parser("split")
    spx.add_argument("--raw_root", default="./raw")
    spx.add_argument("--out_root", default=".")
    spx.add_argument("--train_frac", type=float, default=0.8)
    spx.add_argument("--seed", type=int, default=42)
    spx.set_defaults(fn=cmd_split)

    lc = sp.add_parser("leak-check")
    lc.add_argument("--train", default="train/images")
    lc.add_argument("--val", default="val/images")
    lc.add_argument("--out", default="check_results")
    lc.add_argument("-r", "--recursive", action="store_true")
    lc.add_argument("--by-stem", action="store_true")
    lc.set_defaults(fn=cmd_leak_check)

    wm = sp.add_parser(
        "warm",
        help="pre-compile the serving programs for the declared sweep "
             "shapes so a deployment's first case doesn't pay cold XLA "
             "compiles (the persistent compilation cache keys on HLO; "
             "refine alone is ~2 min cold at native res, NOTES.md)")
    wm.add_argument("--shapes", default="140x562x744",
                    help="comma list of NxHxW sweep shapes to compile")
    wm.add_argument("--weights", help="optional checkpoint (shapes only "
                                      "matter for compilation; random "
                                      "init is used without one)")
    wm.add_argument("--cascade", action="store_true")
    wm.add_argument("--scout_weights", default=None,
                    help="pre-compile the distilled-scout cascade "
                         "programs (same flag as predict)")
    wm.add_argument("--scout_base_c", type=int, default=None,
                    help="scout width; default auto-reads base_c from "
                         "the summary.json next to --scout_weights "
                         "(fallback 16)")
    wm.add_argument("--scout_thr", type=float, default=0.0,
                    help="scout ranking threshold (static jit arg — pass "
                         "the deployment's calibrated value or the warmed "
                         "cascade program is not the served one; 0 = "
                         "auto-adopt from the thr.json next to "
                         "--scout_weights, exactly like predict)")
    wm.add_argument("--scout_no_clahe", action="store_true",
                    help="match a deployment serving --scout_no_clahe "
                         "(scout_clip is a static jit arg).  Usually "
                         "unnecessary: the engine auto-reads use_clahe "
                         "from the summary.json next to the weights")
    wm.add_argument("--scout_rank", default="refined",
                    choices=("refined", "closed"),
                    help="match the deployment's tier-1 rank key "
                         "(static jit arg)")
    wm.add_argument("--bulk", type=int, default=0,
                    help="also pre-compile the predict --bulk N group "
                         "program for each shape (a bulk group is its own "
                         "(S,N,H,W) program; requires --cascade)")
    wm.add_argument("--roi", action="store_true",
                    help="with --export-aot: also serialize the container "
                         "ROI program (the Grand-Challenge boot path; "
                         "serve via infer-container --aot DIR or env "
                         "ATT_ASPP_AOT_DIR)")
    wm.add_argument("--export-aot", default=None, metavar="DIR",
                    help="instead of warming the compile cache, serialize "
                         "the case-serving EXECUTABLES for the declared "
                         "shapes to DIR (jax.experimental."
                         "serialize_executable); `predict --aot DIR` then "
                         "boots with no remote compile at all.  Export on "
                         "the deployment hardware/jax version")
    wm.add_argument("--thr", type=float, default=None,
                    help="serving threshold to compile at (static jit arg "
                         "— must match deployment); default resolves "
                         "thr.json exactly like predict")
    wm.add_argument("--thr_json", default="./checkpoints/thr.json")
    wm.add_argument("--int8", action="store_true")
    wm.add_argument("--c1_pad", type=int, default=0,
                    help="pre-compile the channel-padded 512²-level "
                         "variant (must match the deployment's --c1_pad)")
    wm.add_argument("--lowering",
                    choices=["direct", "int8", "w2d_stage"])
    wm.add_argument("--tta", action="store_true")
    wm.add_argument("--img-size", type=int, default=512)
    model_flags(wm)
    wm.set_defaults(fn=cmd_warm)

    dr = sp.add_parser("dataset-report")
    dr.add_argument("--frame_index")
    dr.add_argument("--flat_root")
    dr.add_argument("--flat_split_name")
    dr.add_argument("--root")
    dr.add_argument("--outdir", default="reports")
    dr.set_defaults(fn=cmd_dataset_report)

    return p


def main(argv=None) -> int:
    args = get_parser().parse_args(argv)
    try:
        from .utils.compile_cache import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
