"""Train the flagship on synthetic ultrasound and export deployable weights.

Closes VERDICT r2 missing #2 / next-round #3: every previous hardware bench
used RANDOM weights with a synthetic 97th-percentile threshold; nothing ever
demonstrated the trained path (realistic probability fields through
CC-refine, candidate ranking, ellipse fit).  The environment has no real
dataset (reference fixtures are LFS stubs), so this trains on
``tools.synthetic`` frames — speckled fan-masked rims, filled-ellipse
targets — at the full deployment config (512², base_c 48, batch 8, the
reference's training recipe) on the real TPU, then:

1. calibrates the probability threshold on a held-out synthetic val set
   through the real ``calibrate()`` path;
2. exports ``resources/synthetic/weights.npz`` (float16) + ``thr.json`` +
   ``summary.json`` — the artifacts ``bench.py`` picks up by default.

Usage: python benchmarks/train_synthetic_tpu.py [--epochs 30] [--n-train 160]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "resources" / "synthetic"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n-train", type=int, default=160)
    ap.add_argument("--n-val", type=int, default=40)
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--base-c", type=int, default=48)
    ap.add_argument("--seed", type=int, default=2025)
    ap.add_argument("--out", default=None,
                    help="output dir (default resources/synthetic; a "
                         "distilled cascade SCOUT trains with e.g. "
                         "--img-size 256 --base-c 16 "
                         "--out resources/synthetic_scout)")
    ap.add_argument("--no-clahe", action="store_true",
                    help="train on unequalised input (AugmentConfig "
                         "use_clahe=False) and calibrate through a "
                         "clahe_clip<=0 predict path — for a cascade "
                         "scout served with cascade_scout_clahe=False")
    ap.add_argument("--calibrate-only", action="store_true",
                    help="skip training; recalibrate thresholds from the "
                         "shipped resources/synthetic/weights.npz")
    args = ap.parse_args()
    global OUT
    if args.out:
        OUT = REPO / args.out

    import jax

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import (AugmentConfig, CalibrateConfig,
                                          Config, ModelConfig,
                                          PreprocessConfig, TrainConfig)
    from att_aspp_unet_tpu.io import write_gray_png, write_json
    from att_aspp_unet_tpu.tools.synthetic import make_dataset
    from att_aspp_unet_tpu.train.data import ArrayDataset
    from att_aspp_unet_tpu.train.train_loop import fit, load_checkpoint, \
        create_train_state

    print(f"[train-syn] backend={jax.default_backend()}", file=sys.stderr)
    S = args.img_size
    n_pos = int(args.n_train * 0.85)
    t0 = time.time()
    tr_x, tr_y = make_dataset(n_pos, args.n_train - n_pos, S, seed=args.seed)
    va_x, va_y = make_dataset(int(args.n_val * 0.85),
                              args.n_val - int(args.n_val * 0.85), S,
                              seed=args.seed + 1)
    print(f"[train-syn] dataset {tr_x.shape} val {va_x.shape} "
          f"({time.time() - t0:.0f}s)", file=sys.stderr)

    cfg = Config(
        preprocess=PreprocessConfig(
            img_size=S, clahe_clip=0.0 if args.no_clahe else 1.0),
        model=ModelConfig(base_c=args.base_c),
        train=TrainConfig(batch_size=8, epochs=args.epochs, lr=3e-4,
                          early_stop_patience=8,
                          augment=AugmentConfig(
                              elastic_p=0.0,
                              use_clahe=not args.no_clahe)),
        calibrate=CalibrateConfig(thr_lo=0.35, thr_hi=0.6, thr_steps=11),
    )
    tr_ds = ArrayDataset(tr_x, tr_y, (tr_y.max(axis=(1, 2)) > 0))
    va_ds = ArrayDataset(va_x, va_y, (va_y.max(axis=(1, 2)) > 0))

    OUT.mkdir(parents=True, exist_ok=True)
    if args.calibrate_only:
        from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables
        variables = load_npz_variables(OUT / "weights.npz")
        # keep the training-run provenance from the prior summary — a
        # recalibration must not clobber the trained val Dice with NaN
        prior = json.loads((OUT / "summary.json").read_text()) \
            if (OUT / "summary.json").exists() else {}
        res = {"best_dice": prior.get("best_val_dice", -1.0),
               "epochs_run": prior.get("epochs_run", 0)}
    else:
        res = fit(cfg, tr_ds, va_ds, OUT, resume=False)
        print(f"[train-syn] best val Dice {res['best_dice']:.4f} after "
              f"{res['epochs_run']} epochs", file=sys.stderr)

        # restore the best checkpoint and export compact weights
        state = create_train_state(cfg.model, cfg.train, steps_per_epoch=1,
                                   rng=jax.random.PRNGKey(0),
                                   sample_hw=(S, S))
        state, extra = load_checkpoint(Path(res["best_path"]), state)
        from att_aspp_unet_tpu.utils.npz_weights import save_npz_variables

        variables = {"params": jax.device_get(state.params),
                     "batch_stats": jax.device_get(state.batch_stats)}
        # float16 storage: 42 MB vs 120 MB f32; the forward runs bf16 anyway
        save_npz_variables(variables, OUT / "weights.npz")

    # calibrate the threshold through the real path (batched val programs)
    import tempfile

    from att_aspp_unet_tpu.infer.calibrate import calibrate

    with tempfile.TemporaryDirectory() as td:
        vd = Path(td) / "val"
        (vd / "images").mkdir(parents=True)
        (vd / "masks").mkdir()
        for i in range(len(va_x)):
            write_gray_png(vd / "images" / f"v{i:03d}.png", va_x[i])
            write_gray_png(vd / "masks" / f"v{i:03d}.png", va_y[i])
        import dataclasses
        # calibrate BOTH TTA modes: the reference calibrate used hflip TTA
        # (…stage.py:384-392) while the deployment/bench default runs
        # without TTA — each mode needs the threshold tuned for ITS
        # probability field (a TTA-calibrated thr applied to a no-TTA field
        # is off its operating point)
        out = {}
        for tag, tta in (("tta", True), ("no_tta", False)):
            ccfg = dataclasses.replace(cfg, predict=dataclasses.replace(
                cfg.predict, tta_hflip=tta))
            out[tag] = calibrate(ccfg, variables, vd, OUT)

    write_json(OUT / "thr.json", {
        "best_thr": out["tta"]["best_thr"],        # reference-parity value
        "best_thr_tta": out["tta"]["best_thr"],
        "best_thr_no_tta": out["no_tta"]["best_thr"],
    }, indent=2)
    write_json(OUT / "summary.json", {
        "best_val_dice": res["best_dice"],
        "epochs_run": res["epochs_run"],
        "best_thr": out["tta"]["best_thr"],
        "best_thr_no_tta": out["no_tta"]["best_thr"],
        "best_thr_mean_dice": float(np.max(out["tta"]["mean_dice"])),
        "img_size": S, "base_c": args.base_c,
        "use_clahe": not args.no_clahe,
        "n_train": args.n_train, "n_val": args.n_val,
    }, indent=2)
    print(json.dumps({"best_val_dice": res["best_dice"],
                      "best_thr": out["tta"]["best_thr"],
                      "best_thr_no_tta": out["no_tta"]["best_thr"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
