"""Probe r18 — int8 PTQ serving: accuracy parity + e2e speed vs bf16.

Probes r16-int8/r16b bounded the conv-level win at ×1.4–1.5.  This probe
runs the REAL serving engine (`AttAsppEngine`, trained synthetic weights,
production 140×562×744 sweep) in both lowerings in one process and reports:

- probability-field agreement (max/mean |Δp|),
- mask Dice at the calibrated threshold + picked-frame agreement,
- e2e sequential + dispatch-only s/sweep for both engines.

Same-session A/B — the only trustworthy comparison through the axon
tunnel (NOTES.md round-3 tunnel-variance finding).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=140)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    import dataclasses
    from att_aspp_unet_tpu.config import Config, ModelConfig, PredictConfig, \
        PreprocessConfig
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    print(f"[r18] backend={jax.default_backend()}", file=sys.stderr)
    syn = Path(__file__).resolve().parent.parent / "resources" / "synthetic"
    variables = load_npz_variables(syn / "weights.npz")
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))

    cfg = Config(preprocess=PreprocessConfig(img_size=512),
                 model=ModelConfig(base_c=48),
                 predict=PredictConfig(frame_batch=16, tta_hflip=False))
    qcfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, conv_lowering="int8"))

    sweep_host, _, _ = make_sweep(args.frames, 562, 744, seed=0)
    sweep = jax.device_put(sweep_host)
    sweep.block_until_ready()

    eng_b = AttAsppEngine(cfg, variables)
    eng_q = AttAsppEngine(qcfg, variables)

    # ---- accuracy parity ------------------------------------------------
    t0 = time.time()
    p_b = np.asarray(eng_b.predict_full(sweep_host))
    print(f"[r18] bf16 predict_full compile+run {time.time()-t0:.1f}s",
          file=sys.stderr)
    t0 = time.time()
    p_q = np.asarray(eng_q.predict_full(sweep_host))
    print(f"[r18] int8 predict_full compile+run {time.time()-t0:.1f}s "
          f"(incl. calibration pass)", file=sys.stderr)
    d = np.abs(p_q - p_b)
    m_b, m_q = p_b > thr, p_q > thr
    inter, union = (m_b & m_q).sum(), (m_b | m_q).sum()
    dice = 2 * inter / max(1, m_b.sum() + m_q.sum())
    print(f"[r18] |Δp| max {d.max():.4f} mean {d.mean():.5f}; mask Dice "
          f"{dice:.4f} (fg bf16 {m_b.sum()} px, int8 {m_q.sum()} px)",
          file=sys.stderr)

    f_b, _, ac_b = eng_b.predict_case(sweep_host, (0.28, 0.28), threshold=thr)
    f_q, _, ac_q = eng_q.predict_case(sweep_host, (0.28, 0.28), threshold=thr)
    print(f"[r18] frame pick bf16 {f_b} int8 {f_q}; AC bf16 {ac_b:.2f} mm "
          f"int8 {ac_q:.2f} mm", file=sys.stderr)

    # ---- speed (same session, interleaved) ------------------------------
    def seq(eng):
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            eng.predict_case_collect(eng.predict_case_submit(sweep, thr),
                                     (0.28, 0.28))
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    def disp(eng):
        n = 2 * args.iters
        t0 = time.time()
        hs = [eng.predict_case_submit(sweep, thr) for _ in range(n)]
        float(jnp.sum(hs[-1][0].astype(jnp.int32)))
        el = (time.time() - t0) / n
        for h in hs:
            eng.predict_case_collect(h, (0.28, 0.28))
        return el

    for label, eng in (("bf16", eng_b), ("int8", eng_q)):
        # warm the submit path's program (predict_case above used the
        # unstaged sweep; submit uses the device-staged one — same shape)
        eng.predict_case_collect(eng.predict_case_submit(sweep, thr),
                                 (0.28, 0.28))
        s = seq(eng)
        dd = disp(eng)
        print(f"[r18] {label}: sequential {s:.3f} s/sweep "
              f"({args.frames/s:.1f} f/s)   dispatch-only {dd:.3f} s/sweep "
              f"({args.frames/dd:.1f} f/s)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
