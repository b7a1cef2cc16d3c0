"""Probe r37 — cascade fidelity at cohort scale (VERDICT r3 #3).

Every cascade fidelity gate so far (probes r26/r29/r30/r31/r32) rode the
same 12 synthetic seeds; the deviation analysis (r21d) was 8 sweeps.  The
shipping deployment default — 128-px no-CLAHE base_c-16 scout, 8 promotes
— therefore rested on ~12 samples per decision.  This probe scales the
evidence to a 108-case cohort that varies every generator axis the
round-3 knobs expose (``tools/synthetic.py``):

  - geometry: 96 distinct positive-sweep seeds (center/axes/angle/peak
    frame all re-drawn per seed);
  - speckle level: gain ∈ {0.7, 1.0, 1.3, 1.6} (sensor-noise sweep);
  - clutter: distractor-arc count ∈ {default 1–2, 0, 2, 4};
  - negatives: 12 abdomen-free sweeps (the −1/no-detection contract).

Per case it measures, direct engine (gold standard) vs the SHIPPING
cascade config (auto-adopted scout exactly as ``bench.py`` serves it):

  - pick agreement (identical best frame);
  - direct-pick survival in the promoted candidate set (the first
    element of ``predict_case_submit``'s handle is the candidate index
    set tier 2 refined);
  - AC delta cascade−direct (identical picks must give EXACTLY equal AC:
    tier-2 masks are bit-identical for the same frame);
  - |AC err| vs the generator's analytic Ramanujan-II truth, so a
    disagreement can be scored as favorable/unfavorable, not just
    different.

Output: one JSON line with overall + per-stratum tables (recorded in
NOTES.md; the in-suite statistical gate is
``tests/test_train_convergence.py::test_cascade_cohort_fidelity_gate``).
Run AFTER any other TPU probe finishes — never share the compile cache
concurrently (CLAUDE.md).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SWEEP_FRAMES = 140
H, W = 562, 744
SPACING = (0.28, 0.28)
SPECKLES = (0.7, 1.0, 1.3, 1.6)
DISTRACTORS = (None, 0, 2, 4)
N_POS = 96
N_NEG = 12


def main() -> int:
    import jax
    import jax.numpy as jnp  # noqa: F401

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import (Config, ModelConfig, PredictConfig,
                                          PreprocessConfig)
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.measure.ellipse import ellipse_circumference
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    print(f"[r37] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    variables = jax.device_put(load_npz_variables(syn / "weights.npz"))
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))

    # the SHIPPING cascade config: scout dir resolved with bench.py's
    # preference order, knobs auto-adopted from the scout's summary.json
    # via PredictConfig.cascade_scout_weights (engine._init_scout)
    scout_dir = None
    for name in ("synthetic_scout_noclahe128", "synthetic_scout_noclahe",
                 "synthetic_scout"):
        d = root / "resources" / name
        if (d / "weights.npz").exists():
            scout_dir = d
            break
    if scout_dir is None:
        print("[r37] no distilled scout found", file=sys.stderr)
        return 1
    direct_cfg = Config(preprocess=PreprocessConfig(img_size=512),
                        model=ModelConfig(base_c=48),
                        predict=PredictConfig(frame_batch=16,
                                              tta_hflip=False))
    scfg = json.loads((scout_dir / "summary.json").read_text()) \
        if (scout_dir / "summary.json").exists() else {}
    cas_cfg = Config(
        preprocess=PreprocessConfig(img_size=512),
        model=ModelConfig(base_c=48),
        predict=PredictConfig(
            frame_batch=16, tta_hflip=False, cascade=True,
            cascade_img_size=int(scfg.get("img_size", 256)),
            cascade_scouts=8, cascade_lowres_enhance=True,
            cascade_scout_batch=128,
            cascade_scout_weights=str(scout_dir / "weights.npz")))
    direct = AttAsppEngine(direct_cfg, variables)
    cascade = AttAsppEngine(cas_cfg, variables)
    print(f"[r37] scout={scout_dir.name} size="
          f"{cas_cfg.predict.cascade_img_size} promotes=8", file=sys.stderr)

    # cohort: 96 positive cases cycling (speckle, distractors), 12 negatives
    cases = []
    for s in range(N_POS):
        cases.append(dict(seed=700 + s, negative=False,
                          speckle=SPECKLES[s % len(SPECKLES)],
                          distractors=DISTRACTORS[(s // 4) % len(DISTRACTORS)]))
    for s in range(N_NEG):
        cases.append(dict(seed=900 + s, negative=True,
                          speckle=SPECKLES[s % len(SPECKLES)],
                          distractors=DISTRACTORS[s % len(DISTRACTORS)]))

    rows = []
    t_start = time.time()
    for i, c in enumerate(cases):
        frames, best_idx, truth = make_sweep(
            SWEEP_FRAMES, H, W, seed=c["seed"], negative=c["negative"],
            speckle_gain=c["speckle"], n_distractors=c["distractors"])
        true_ac = (ellipse_circumference(truth.ry * SPACING[0],
                                         truth.rx * SPACING[1])
                   if truth.present else float("nan"))
        dev = jax.device_put(frames)
        f_d, _, ac_d = direct.predict_case(dev, SPACING, threshold=thr)
        f_c, _, ac_c = cascade.predict_case(dev, SPACING, threshold=thr)
        cand = np.asarray(jax.device_get(
            cascade.predict_case_submit(dev, thr)[0]))
        rows.append(dict(
            **c, gen_best=int(best_idx),
            direct_pick=int(f_d), cascade_pick=int(f_c),
            agree=int(f_d) == int(f_c),
            survival=bool((cand == int(f_d)).any()),
            ac_direct=float(ac_d), ac_cascade=float(ac_c),
            ac_delta=float(ac_c) - float(ac_d),
            err_direct=abs(float(ac_d) - true_ac),
            err_cascade=abs(float(ac_c) - true_ac)))
        if (i + 1) % 12 == 0:
            n_ag = sum(r["agree"] for r in rows)
            print(f"[r37] {i + 1}/{len(cases)} agree={n_ag}/{len(rows)} "
                  f"({time.time() - t_start:.0f}s)", file=sys.stderr)

    def rate(rs, key):
        return (sum(r[key] for r in rs) / len(rs)) if rs else float("nan")

    pos = [r for r in rows if not r["negative"]]
    neg = [r for r in rows if r["negative"]]
    disagree = [r for r in rows if not r["agree"]]
    agree_same_ac = [r for r in rows if r["agree"]
                     and not (np.isnan(r["ac_delta"]) or r["ac_delta"] == 0)]
    summary = {
        "probe": "r37", "n_cases": len(rows), "thr": thr,
        "scout": scout_dir.name, "promotes": 8,
        "pick_agreement": round(rate(rows, "agree"), 4),
        "pick_agreement_pos": round(rate(pos, "agree"), 4),
        "pick_agreement_neg": round(rate(neg, "agree"), 4),
        "direct_pick_survival": round(rate(rows, "survival"), 4),
        "agreeing_picks_with_nonzero_ac_delta": len(agree_same_ac),
        "n_disagreements": len(disagree),
        "disagreements": [
            {k: r[k] for k in ("seed", "speckle", "distractors", "negative",
                               "gen_best", "direct_pick", "cascade_pick",
                               "ac_delta", "err_direct", "err_cascade")}
            for r in disagree],
        "median_abs_ac_err_direct_mm": round(float(np.median(
            [r["err_direct"] for r in pos])), 3),
        "median_abs_ac_err_cascade_mm": round(float(np.median(
            [r["err_cascade"] for r in pos])), 3),
        "per_speckle_agreement": {
            str(g): round(rate([r for r in rows if r["speckle"] == g],
                               "agree"), 4) for g in SPECKLES},
        "per_distractor_agreement": {
            str(d): round(rate([r for r in rows if r["distractors"] == d],
                               "agree"), 4) for d in DISTRACTORS},
        "elapsed_s": round(time.time() - t_start, 1),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
