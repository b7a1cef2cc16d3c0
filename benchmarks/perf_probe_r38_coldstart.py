"""Probe r38 — deployment cold-start: does the compile cache amortize?

BENCH_r03 tail: cascade compile+first run 147 s, the case program another
36.9 s — a Grand-Challenge container pays that per run unless the
persistent compilation cache actually works across process restarts, and
cache-hit behaviour through the remote compile service has been
"inconclusive" since round 1 (VERDICT r3 weak #6).  Nobody has measured
process-restart warm-compile time on the TPU.  This probe does, with the
serving programs the container actually runs.

Protocol (each phase a FRESH python process, so jit in-memory caches
can't flatter the numbers; one process at a time — the cache must never
have two concurrent writers, CLAUDE.md):

  1. "cold":    JAX_CACHE_DIR → a brand-new empty directory; build the
                shipping cascade engine (trained weights + distilled
                scout) and time compile+first-run of the 140-frame sweep
                and 840-frame case programs.
  2. "warm":    identical run, SAME cache directory — the process-restart
                number a deployed container would see with a mounted
                cache volume.
  3. "nocache": identical run with the cache disabled — isolates how
                much of "warm" is cache hits vs remote-compile variance.

Prints one JSON line: per-phase {sweep_s, case_s, total_s}, the
cache-entry count after phase 1, and warm/cold ratios.  Numbers go into
NOTES.md + PARITY.md with a deployment recommendation.
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
CASE_FRAMES = 840
H, W = 562, 744


def _child() -> int:
    """One timed engine bring-up in this process; prints a JSON line."""
    sys.path.insert(0, str(ROOT))
    t_import0 = time.time()
    import jax
    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import (Config, ModelConfig, PredictConfig,
                                          PreprocessConfig)
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    syn = ROOT / "resources" / "synthetic"
    variables = jax.device_put(load_npz_variables(syn / "weights.npz"))
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))
    scout_dir = None
    for name in ("synthetic_scout_noclahe128", "synthetic_scout_noclahe",
                 "synthetic_scout"):
        d = ROOT / "resources" / name
        if (d / "weights.npz").exists():
            scout_dir = d
            break
    scfg = json.loads((scout_dir / "summary.json").read_text()) \
        if scout_dir and (scout_dir / "summary.json").exists() else {}
    cfg = Config(
        preprocess=PreprocessConfig(img_size=512),
        model=ModelConfig(base_c=48),
        predict=PredictConfig(
            frame_batch=16, tta_hflip=False, cascade=True,
            cascade_img_size=int(scfg.get("img_size", 256)),
            cascade_scouts=8, cascade_lowres_enhance=True,
            cascade_scout_batch=128,
            cascade_scout_weights=str(scout_dir / "weights.npz")))
    engine = AttAsppEngine(cfg, variables)
    setup_s = time.time() - t_import0

    out = {"setup_s": round(setup_s, 1)}
    sweep = jax.device_put(make_sweep(SWEEP_FRAMES, H, W, seed=0)[0])
    sweep.block_until_ready()
    t0 = time.time()
    engine.predict_case(sweep, (0.28, 0.28), threshold=thr)
    out["sweep_s"] = round(time.time() - t0, 1)

    case = jax.device_put(np.concatenate(
        [make_sweep(SWEEP_FRAMES, H, W, seed=1 + s)[0]
         for s in range(CASE_FRAMES // SWEEP_FRAMES)]))
    case.block_until_ready()
    t0 = time.time()
    engine.predict_case(case, (0.28, 0.28), threshold=thr)
    out["case_s"] = round(time.time() - t0, 1)
    out["total_s"] = round(time.time() - t_import0, 1)
    print("CHILD_JSON " + json.dumps(out))
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        return _child()

    cache_dir = Path(tempfile.mkdtemp(prefix="r38_cache_"))
    phases = [("cold", str(cache_dir), None),
              ("warm", str(cache_dir), None),
              ("nocache", None, "1")]
    results = {}
    for name, cdir, disable in phases:
        env = dict(os.environ)
        env.pop("JAX_CACHE_DIR", None)
        env.pop("ATT_ASPP_DISABLE_COMPILE_CACHE", None)
        if cdir:
            env["JAX_CACHE_DIR"] = cdir
        if disable:
            env["ATT_ASPP_DISABLE_COMPILE_CACHE"] = disable
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            env=env, capture_output=True, text=True, timeout=3600)
        wall = time.time() - t0
        sys.stderr.write(proc.stderr[-2000:])
        line = [l for l in proc.stdout.splitlines()
                if l.startswith("CHILD_JSON ")]
        if proc.returncode != 0 or not line:
            results[name] = {"error": f"rc={proc.returncode}",
                             "tail": proc.stderr[-500:]}
            print(f"[r38] {name}: FAILED rc={proc.returncode}",
                  file=sys.stderr)
            continue
        results[name] = json.loads(line[-1][len("CHILD_JSON "):])
        results[name]["wall_s"] = round(wall, 1)
        if name == "cold":
            results["cache_entries_after_cold"] = len(
                list(cache_dir.glob("*")))
        print(f"[r38] {name}: {results[name]}", file=sys.stderr)

    if all(isinstance(results.get(k), dict) and "case_s" in results[k]
           for k in ("cold", "warm")):
        results["warm_over_cold_total"] = round(
            results["warm"]["total_s"] / results["cold"]["total_s"], 3)
    print(json.dumps({"probe": "r38", **results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
