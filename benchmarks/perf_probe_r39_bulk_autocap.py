"""Probe r39 — the bulk HBM auto-cap, end-to-end through the predict CLI.

Probe r36 established the cliff: at the 840-frame case shape, S=2 bulk
buys ×1.22 but S=3 spills HBM and runs ×0.11.  Round 4 replaced the
CLI's warn-then-spill with an auto-cap (``predict_cli.submit_group``
splits oversized groups at ~6 GB of estimated device buffers).  The unit
test pins the splitting logic on tiny shapes; this probe verifies the
shipped behavior ON HARDWARE at the real case shape: three 840-frame
``.mha`` cases served with ``--bulk 3`` must dispatch as a 2-group plus
a singleton (cap = ⌊6 GB / 2.81 GB⌋ = 2), never enter the spill regime,
and finish in sequential-or-better wall time.

``--with-spill`` additionally re-measures the uncapped S=3 dispatch
(monkeypatching the budget to ∞) to reproduce the r36 cliff in the same
session — expensive (~75 s for one group), off by default.

Prints one JSON line: group sizes actually dispatched, capped wall time,
per-case rate, (optionally) the uncapped S=3 time, and the r36 context.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CASE_FRAMES = 840
H, W = 562, 744


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--with-spill", action="store_true")
    args = ap.parse_args()

    import jax

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    import att_aspp_unet_tpu.infer.predict_cli as pcli
    from att_aspp_unet_tpu.config import (Config, ModelConfig, PredictConfig,
                                          PreprocessConfig)
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.io import MetaImage, write_mha
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    print(f"[r39] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    variables = load_npz_variables(syn / "weights.npz")
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))
    scout_dir = root / "resources" / "synthetic_scout_noclahe128"
    scfg = json.loads((scout_dir / "summary.json").read_text())
    cfg = Config(
        preprocess=PreprocessConfig(img_size=512),
        model=ModelConfig(base_c=48),
        predict=PredictConfig(
            frame_batch=16, tta_hflip=False, cascade=True,
            cascade_img_size=int(scfg.get("img_size", 128)),
            cascade_scouts=8, cascade_lowres_enhance=True,
            cascade_scout_batch=128,
            cascade_scout_weights=str(scout_dir / "weights.npz")))

    tmp = Path(tempfile.mkdtemp(prefix="r39_"))
    in_dir, out_dir = tmp / "in", tmp / "out"
    in_dir.mkdir()
    print("[r39] generating 3 × 840-frame cases...", file=sys.stderr)
    for i in range(3):
        case = np.concatenate(
            [make_sweep(140, H, W, seed=50 * i + s)[0] for s in range(6)])
        write_mha(in_dir / f"case{i}.mha",
                  MetaImage(case, spacing=(0.28, 0.28, 0.28)))

    group_sizes = []
    orig_bulk = AttAsppEngine.predict_bulk_submit
    orig_case = AttAsppEngine.predict_case_submit
    AttAsppEngine.predict_bulk_submit = (
        lambda self, g, t=None: (group_sizes.append(int(g.shape[0])),
                                 orig_bulk(self, g, t))[1])
    AttAsppEngine.predict_case_submit = (
        lambda self, v, t=None: (group_sizes.append(1),
                                 orig_case(self, v, t))[1])
    logs = []
    # warm (compile) pass first so the timed pass measures serving, not
    # the one-off remote compiles
    pcli.predict_directory(cfg, variables, in_dir, out_dir / "warm",
                           threshold=thr, bulk_group=3,
                           log=lambda *a: logs.append(" ".join(map(str, a))))
    warm_groups, group_sizes[:] = list(group_sizes), []
    t0 = time.time()
    rows = pcli.predict_directory(cfg, variables, in_dir, out_dir / "timed",
                                  threshold=thr, bulk_group=3,
                                  log=lambda *a: None)
    capped_s = time.time() - t0
    print(f"[r39] capped --bulk 3: groups={group_sizes} "
          f"{capped_s:.2f}s total ({3 / capped_s:.2f} cases/s), "
          f"rows={[(r[0], r[1]) for r in rows]}", file=sys.stderr)

    out = {"probe": "r39", "groups_dispatched": group_sizes,
           "warm_groups": warm_groups,
           "capped_logged": [l for l in logs if "capped" in l],
           "capped_bulk3_s": round(capped_s, 2),
           "capped_cases_per_s": round(3 / capped_s, 2),
           "r36_context": {"seq_case_s": 0.105, "s2_x": 1.22,
                           "s3_spill_x": 0.11}}

    if args.with_spill:
        pcli.BULK_HBM_BUDGET_BYTES = float("inf")
        group_sizes[:] = []
        t0 = time.time()
        pcli.predict_directory(cfg, variables, in_dir, out_dir / "spill",
                               threshold=thr, bulk_group=3,
                               log=lambda *a: None)
        spill_s = time.time() - t0
        print(f"[r39] UNCAPPED --bulk 3: groups={group_sizes} "
              f"{spill_s:.2f}s (incl. S=3 compile on first use)",
              file=sys.stderr)
        out["uncapped_bulk3_s"] = round(spill_s, 2)

    AttAsppEngine.predict_bulk_submit = orig_bulk
    AttAsppEngine.predict_case_submit = orig_case
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
