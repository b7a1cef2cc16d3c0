"""Probe r40 — what's left inside the 22 s warm bring-up? (follow-up to r38)

r38 showed the persistent cache works across restarts (case program
31.8 → 3.3 s) but the sweep program's warm time stayed at 18.9 s.  Two
suspects: (a) programs that compile in < 1 s are never cached
(`jax_persistent_cache_min_compile_time_secs` = 1.0 in
`utils/compile_cache.py`) yet a fresh process still pays their remote
compiles + round trips; (b) fixed bring-up costs the cache cannot touch
(imports, ~120 MB of f32 weights through the ~36 MB/s tunnel, scout
load, input upload, first dispatch).

Protocol: fresh child processes against ONE pre-warmed cache dir, with
per-stage timestamps (imports, weights upload, engine init incl. scout,
input upload, first sweep predict, second predict).  Phase A uses the
shipping threshold (1.0 s), phase B a 0.05 s threshold (cache almost
every program).  If B's first-predict is materially faster, the
threshold should drop in `enable_compilation_cache`; if not, the
residual is fixed bring-up and the deployment story is complete.
Each phase runs cold-then-warm (same dir) so both thresholds get a
fully-populated cache before their measured warm run.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SWEEP_FRAMES = 140
H, W = 562, 744


def _child() -> int:
    sys.path.insert(0, str(ROOT))
    t0 = time.time()
    stamps = {}

    def mark(name):
        stamps[name] = round(time.time() - t0, 2)

    import jax
    import numpy as np

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    thr_env = os.environ.get("R40_MIN_COMPILE_SECS")
    if thr_env:
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(thr_env))

    from att_aspp_unet_tpu.config import (Config, ModelConfig, PredictConfig,
                                          PreprocessConfig)
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables
    mark("imports")

    syn = ROOT / "resources" / "synthetic"
    variables = load_npz_variables(syn / "weights.npz")
    mark("weights_load")
    variables = jax.device_put(variables)
    jax.block_until_ready(variables)
    mark("weights_upload")

    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))
    sd = ROOT / "resources" / "synthetic_scout_noclahe128"
    scfg = json.loads((sd / "summary.json").read_text())
    cfg = Config(
        preprocess=PreprocessConfig(img_size=512),
        model=ModelConfig(base_c=48),
        predict=PredictConfig(
            frame_batch=16, tta_hflip=False, cascade=True,
            cascade_img_size=int(scfg.get("img_size", 128)),
            cascade_scouts=8, cascade_lowres_enhance=True,
            cascade_scout_batch=128,
            cascade_scout_weights=str(sd / "weights.npz")))
    engine = AttAsppEngine(cfg, variables)
    mark("engine_init")     # includes scout npz load + upload

    sweep = make_sweep(SWEEP_FRAMES, H, W, seed=0)[0]
    mark("sweep_gen")       # host-side; not a deployment cost
    sweep = jax.device_put(sweep)
    sweep.block_until_ready()
    mark("sweep_upload")

    engine.predict_case(sweep, (0.28, 0.28), threshold=thr)
    mark("first_predict")
    engine.predict_case(sweep, (0.28, 0.28), threshold=thr)
    mark("second_predict")
    print("CHILD_JSON " + json.dumps(stamps))
    return 0


def _run_child(cache_dir: str, min_secs: str, label: str):
    env = dict(os.environ)
    env["JAX_CACHE_DIR"] = cache_dir
    env.pop("ATT_ASPP_DISABLE_COMPILE_CACHE", None)
    env["R40_MIN_COMPILE_SECS"] = min_secs
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child"],
        env=env, capture_output=True, text=True, timeout=3600)
    sys.stderr.write(proc.stderr[-1500:])
    line = [l for l in proc.stdout.splitlines()
            if l.startswith("CHILD_JSON ")]
    if proc.returncode != 0 or not line:
        print(f"[r40] {label}: FAILED rc={proc.returncode}", file=sys.stderr)
        return {"error": proc.returncode}
    out = json.loads(line[-1][len("CHILD_JSON "):])
    print(f"[r40] {label}: {out}", file=sys.stderr)
    return out


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        return _child()
    results = {"probe": "r40"}
    for label, min_secs in (("thr1.0", "1.0"), ("thr0.05", "0.05")):
        cache_dir = tempfile.mkdtemp(prefix=f"r40_{label}_")
        _run_child(cache_dir, min_secs, f"{label}_cold")
        results[label] = _run_child(cache_dir, min_secs, f"{label}_warm")
        results[f"{label}_entries"] = len(list(Path(cache_dir).glob("*")))
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
