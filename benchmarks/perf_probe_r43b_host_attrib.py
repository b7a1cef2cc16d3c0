"""Probe r43b — stage-stamped attribution of the per-case directory wall.

r43 after the write-path fixes still measures ~24.5 s/case against
decode 5.6 s + upload 0.26 s + device ~0.1 s — ~18 s/case unattributed.
This probe runs ONE case through exactly the predict_directory stages
with a wall stamp per stage, twice (second pass warm), to find it.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import (Config, ModelConfig, PredictConfig,
                                          PreprocessConfig)
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.infer.outputs import write_output_mha_and_json
    from att_aspp_unet_tpu.io import read_mha
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    print(f"[r43b] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    variables = load_npz_variables(syn / "weights.npz")
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))
    scout_dir = syn.parent / "synthetic_scout_noclahe128"
    scfg = json.loads((scout_dir / "summary.json").read_text())
    scal = json.loads((scout_dir / "thr.json").read_text())
    cfg = Config(
        preprocess=PreprocessConfig(img_size=512),
        model=ModelConfig(base_c=48),
        predict=PredictConfig(
            frame_batch=16, tta_hflip=False, cascade=True,
            cascade_img_size=int(scfg["img_size"]),
            cascade_scout_weights=str(scout_dir / "weights.npz"),
            cascade_scout_base_c=int(scfg["base_c"]),
            cascade_scout_thr=float(scal.get("best_thr_no_tta",
                                             scal["best_thr"]))))
    engine = AttAsppEngine(cfg, variables)
    case_path = Path("/tmp/r43/input/case00.mha")
    if not case_path.exists():
        print("[r43b] run perf_probe_r43_host_io.py first (stages inputs)",
              file=sys.stderr)
        return 1
    out = Path("/tmp/r43b_out")

    stamps = {}
    for rnd in ("cold", "warm"):
        t = {}
        t0 = time.time()
        img = read_mha(case_path)
        t["read_mha"] = time.time() - t0
        vol = img.array
        t0 = time.time()
        h = engine.predict_case_submit(vol, thr)
        t["submit"] = time.time() - t0
        t0 = time.time()
        best, best_mask, ac = engine.predict_case_collect(h, (0.28, 0.28))
        t["collect"] = time.time() - t0
        t0 = time.time()
        write_output_mha_and_json(out, f"case_{rnd}", best_mask, best, img)
        t["write_output"] = time.time() - t0
        stamps[rnd] = t
        print(f"[r43b] {rnd}: " + "  ".join(
            f"{k} {v:.2f}s" for k, v in t.items()), file=sys.stderr)
        del img, vol
    print(json.dumps({"probe": "r43b", "stamps": {
        r: {k: round(v, 3) for k, v in t.items()}
        for r, t in stamps.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
