"""Probe r41 — AOT-serialized serving executables on the TPU.

r38/r40: the persistent compile cache amortizes the CASE program
reliably but the sweep program's cross-process hit is at the mercy of
remote-compile-service variance (43–174 s observed).  AOT packaging
removes the compiler from the boot path: `cli warm --export-aot DIR`
serializes the compiled case-serving executables, `predict --aot DIR`
(``PredictConfig.aot_dir``) deserializes them.

This probe runs the SHIPPED mechanism end to end on hardware: the
parent builds an engine (tiny cascade config), exports via
``engine.export_aot``, and records reference outputs; a FRESH child
process builds an engine with ``aot_dir`` set, which must hit the AOT
entry (no jit dispatch of the case program), reproduce the outputs
bit-exactly, and report deserialize/first-call/steady-state timings.
An early feasibility version of this probe (raw
``jax.experimental.serialize_executable`` round-trip) measured
deserialize 0.45 s, first call ~13 s (executable device load),
steady-state 55 ms — vs a 10.4 s same-session compile and 43–174 s
cross-process compile variance.  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

N, H, W = 12, 96, 112
THR = 0.5


def _setup():
    import jax

    from att_aspp_unet_tpu.config import (Config, ModelConfig, PredictConfig,
                                          PreprocessConfig)
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.models import AttentionASPPUNet
    from att_aspp_unet_tpu.tools.synthetic import make_sweep

    def cfg(**kw):
        return Config(
            preprocess=PreprocessConfig(img_size=64),
            model=ModelConfig(base_c=8, compute_dtype="float32"),
            predict=PredictConfig(frame_batch=4, cascade=True,
                                  cascade_img_size=32, cascade_scouts=6,
                                  cascade_scout_batch=4, **kw))

    model = AttentionASPPUNet.from_config(cfg().model)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 64, 64, 1), np.float32), train=False)
    sweep = make_sweep(N, H, W, seed=3)[0]
    return cfg, AttAsppEngine, variables, sweep


def _child(aot_dir: str) -> int:
    t_boot = time.time()
    cfg, AttAsppEngine, variables, sweep = _setup()
    eng = AttAsppEngine(cfg(aot_dir=aot_dir), variables)
    t0 = time.time()
    f, m, ac = eng.predict_case(sweep, (1.0, 1.0), threshold=THR)
    first_s = time.time() - t0
    assert eng._aot_loaded and all(v is not None
                                   for v in eng._aot_loaded.values()), \
        f"AOT lookup missed: {eng._aot_loaded}"
    t0 = time.time()
    f2, m2, _ = eng.predict_case(sweep, (1.0, 1.0), threshold=THR)
    steady_s = time.time() - t0
    print("CHILD_JSON " + json.dumps(
        {"boot_to_first_result_s": round(time.time() - t_boot, 2),
         "first_call_s": round(first_s, 2),
         "steady_call_s": round(steady_s, 3),
         "frame": int(f), "mask_sum": int(np.asarray(m).sum()),
         "ac": float(ac)}))
    return 0


def main() -> int:
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        return _child(sys.argv[2])

    cfg, AttAsppEngine, variables, sweep = _setup()
    eng = AttAsppEngine(cfg(), variables)
    f0, m0, ac0 = eng.predict_case(sweep, (1.0, 1.0), threshold=THR)
    aot_dir = tempfile.mkdtemp(prefix="r41_aot_")
    t0 = time.time()
    keys = eng.export_aot(aot_dir, [(N, H, W)], threshold=THR,
                          log=lambda m: print(m, file=sys.stderr))
    export_s = time.time() - t0

    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", aot_dir],
        capture_output=True, text=True, timeout=1800)
    sys.stderr.write(proc.stderr[-1500:])
    line = [l for l in proc.stdout.splitlines()
            if l.startswith("CHILD_JSON ")]
    if proc.returncode != 0 or not line:
        print(json.dumps({"probe": "r41", "ok": False,
                          "rc": proc.returncode,
                          "tail": proc.stderr[-400:]}))
        return 1
    child = json.loads(line[-1][len("CHILD_JSON "):])
    ok = (child["frame"] == int(f0)
          and child["mask_sum"] == int(np.asarray(m0).sum())
          and abs(child["ac"] - float(ac0)) < 1e-9)
    print(json.dumps({"probe": "r41", "ok": ok, "keys": keys,
                      "export_s": round(export_s, 1),
                      "child": child,
                      "parent": {"frame": int(f0), "ac": float(ac0)}}))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
