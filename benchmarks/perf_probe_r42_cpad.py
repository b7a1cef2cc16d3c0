"""Probe r42 — channel-padded level-1 lowering (c1_pad) A/B on hardware.

VERDICT r4 #1: the last named, untried lever on the honest direct-path
number.  The 512² C=48 stages fill 48/128 MXU lanes (probe r15: 9.5 %
MFU isolated); ``ModelConfig.c1_pad`` runs them at P ∈ {64, 128} with
exactly-zero pad channels (nn/cpad.py — numerically the identity,
CPU-exactness-tested in tests/test_cpad.py).  The round-2 measurement
of a GENUINE base_c-64 net (1.78× FLOPs at 1.14× time, NOTES.md)
predicts the pad LOSES ×0.88 at P=64 — this probe settles it with the
shipped lowering on the real paths:

- fresh-layout forward loop, b16 @512² (scalar-carry, the r15c/r18d
  methodology rule);
- DIRECT serving path, 840-frame case dispatch-only (the BENCH_r*
  ``direct_case_dispatch_only_fps`` figure);
- train step 512²/bs8 (reference recipe, fused augmentation);
- pick/AC agreement vs c1_pad=0 on the same case.

One process (cross-process compile caching is unreliable through the
tunnel, NOTES.md).
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
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--case-frames", type=int, default=840)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--pads", default="0,64,128")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-serve", action="store_true")
    ap.add_argument("--train-iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import (Config, MeshConfig, ModelConfig,
                                          PredictConfig, PreprocessConfig,
                                          TrainConfig)
    from att_aspp_unet_tpu.infer.engine import AttAsppEngine
    from att_aspp_unet_tpu.models import AttentionASPPUNet
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    print(f"[r42] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    variables = load_npz_variables(syn / "weights.npz")
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))

    host_case, _, _ = make_sweep(args.case_frames, 562, 744, seed=1)
    case = jax.device_put(host_case)
    case.block_until_ready()
    x16 = jax.device_put(np.random.default_rng(0).random(
        (args.batch, 512, 512, 1)).astype(np.float32))
    K = args.k
    pads = [int(p) for p in args.pads.split(",")]

    results: dict = {}
    picks: dict = {}
    for pad in pads:
        tag = f"p{pad}"
        cfg = Config(
            preprocess=PreprocessConfig(img_size=512),
            model=ModelConfig(base_c=48, c1_pad=pad),
            predict=PredictConfig(frame_batch=args.batch, tta_hflip=False),
        )
        model = AttentionASPPUNet.from_config(cfg.model)
        engine = AttAsppEngine(cfg, variables, model=model)
        r: dict = {}

        if not args.skip_serve:
            # fresh-layout forward loop
            def fwd_loop(x0, vs):
                def it(i, carry):
                    out, _ = model.apply(vs, x0 + carry * 1e-30,
                                         train=False)
                    return carry + jnp.sum(out).astype(jnp.float32) * 1e-30
                return lax.fori_loop(0, K, it, jnp.float32(0.0))

            f = jax.jit(fwd_loop)
            t0 = time.time()
            float(jnp.sum(f(x16, engine.variables)))
            print(f"[r42] {tag}: fwd compile {time.time()-t0:.1f}s",
                  file=sys.stderr)
            ts = []
            for _ in range(args.iters):
                t0 = time.time()
                float(jnp.sum(f(x16, engine.variables)))
                ts.append(time.time() - t0)
            fwd = sorted(ts)[len(ts) // 2] / K
            print(f"[r42] {tag}: fwd b{args.batch} fresh-layout "
                  f"{fwd*1e3:7.2f} ms/batch ({args.batch/fwd:.0f} f/s)",
                  file=sys.stderr)
            r["fwd_ms"] = fwd * 1e3

            # direct serving, case dispatch-only
            t0 = time.time()
            picks[tag] = engine.predict_case(case, (0.28, 0.28),
                                             threshold=thr)
            print(f"[r42] {tag}: case compile+warm {time.time()-t0:.1f}s "
                  f"(pick {picks[tag][0]}, AC {picks[tag][2]:.2f})",
                  file=sys.stderr)
            n_disp = max(2, args.iters)
            t0 = time.time()
            handles = [engine.predict_case_submit(case, thr)
                       for _ in range(n_disp)]
            float(jnp.sum(handles[-1][0].astype(jnp.int32)))
            disp = (time.time() - t0) / n_disp
            for h in handles:
                engine.predict_case_collect(h, (0.28, 0.28))
            print(f"[r42] {tag}: case({args.case_frames}) dispatch-only "
                  f"{disp:.3f} s ({args.case_frames/disp:.1f} f/s)",
                  file=sys.stderr)
            r["case_disp_s"] = disp
            r["case_fps"] = args.case_frames / disp

        if not args.skip_train:
            from att_aspp_unet_tpu.parallel.mesh import (batch_sharding,
                                                         make_mesh_for_batch,
                                                         replicate)
            from att_aspp_unet_tpu.train.train_loop import (
                create_train_state, make_train_step)

            B = 8
            rng = np.random.default_rng(0)
            images = (rng.random((B, 512, 512)) * 255).astype(np.uint8)
            masks = (rng.random((B, 512, 512)) > 0.8).astype(np.uint8) * 255
            tcfg = Config(preprocess=PreprocessConfig(img_size=512),
                          model=ModelConfig(base_c=48, c1_pad=pad),
                          train=TrainConfig(batch_size=B))
            mesh = make_mesh_for_batch(MeshConfig(), B)
            rep, data_sh = replicate(mesh), batch_sharding(mesh, 3)
            state = create_train_state(tcfg.model, tcfg.train,
                                       steps_per_epoch=100,
                                       rng=jax.random.PRNGKey(0),
                                       sample_hw=(512, 512))
            state = jax.device_put(state, rep)
            step = jax.jit(make_train_step(tcfg),
                           in_shardings=(rep, data_sh, data_sh, rep),
                           out_shardings=(rep, rep),
                           donate_argnums=(0,))
            imgs = jax.device_put(images, data_sh)
            msks = jax.device_put(masks, data_sh)
            key = jax.random.PRNGKey(1)
            t0 = time.time()
            state, m = step(state, imgs, msks, key)
            print(f"[r42] {tag}: train compile+first {time.time()-t0:.1f}s "
                  f"loss={float(m['loss']):.4f}", file=sys.stderr)
            ts = []
            for i in range(args.train_iters):
                k = jax.random.fold_in(key, i)
                t0 = time.time()
                state, m = step(state, imgs, msks, k)
                float(jnp.sum(m["loss"]))
                ts.append(time.time() - t0)
            med = sorted(ts)[len(ts) // 2]
            print(f"[r42] {tag}: train {med*1e3:.1f} ms/step "
                  f"({B/med:.1f} samples/s)", file=sys.stderr)
            r["train_step_s"] = med
        results[tag] = r

    if picks and "p0" in picks:
        f0 = int(picks["p0"][0])
        agree = {t: (int(p[0]) == f0, round(float(p[2] - picks['p0'][2]), 4))
                 for t, p in picks.items()}
        print(f"[r42] pick agreement vs p0: {agree}", file=sys.stderr)
    if "p0" in results and results["p0"]:
        base = results["p0"]
        for t, r in results.items():
            if t == "p0" or not r:
                continue
            rat = {m: round(base[m] / r[m], 3) for m in r if m in base}
            print(f"[r42] SUMMARY {t}: ratios vs p0 (>1 = pad wins) {rat}",
                  file=sys.stderr)
    print(json.dumps({"probe": "r42", "results": {
        t: {m: round(v, 5) for m, v in r.items()}
        for t, r in results.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
