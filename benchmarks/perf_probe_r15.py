"""Probe r15 — trained-weights bench regression: which stage became slow?

With trained weights + calibrated threshold on a realistic synthetic sweep,
dispatch-only went 0.667 → 3.586 s/sweep (random-weight blobs → real rims).
The convs are content-independent, so the suspects are the data-dependent
`lax.while_loop`s: CC labeling + hole fill inside `_refine_mask_padded`
(8 candidates at the native bucket) and `fill_holes` inside
`candidate_rank_areas` (all 140 frames at quarter resolution).

Measures, in ONE process, on the real TPU:
1. predict_full (forward path) on the synthetic sweep;
2. threshold → candidate_rank_areas → lexsort, jitted standalone;
3. _refine_mask_padded on the sweep's actual top-8 candidate masks, vs the
   same masks randomly permuted pixel-wise (content control, same fg count);
4. full predict_case dispatch-only.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def med3(fn):
    fn()
    ts = []
    for _ in range(3):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return sorted(ts)[1]


def main() -> int:
    import functools

    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import Config, ModelConfig, PredictConfig, \
        PreprocessConfig
    from att_aspp_unet_tpu.infer.engine import (AttAsppEngine,
                                                candidate_rank_areas)
    from att_aspp_unet_tpu.models import AttentionASPPUNet
    from att_aspp_unet_tpu.postprocess.refine import (_refine_mask_padded,
                                                      refine_bucket_hw)
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    wall0 = time.time()
    print(f"[r15] backend={jax.default_backend()}", file=sys.stderr)
    cfg = Config(preprocess=PreprocessConfig(), model=ModelConfig(base_c=48),
                 predict=PredictConfig(frame_batch=16))
    model = AttentionASPPUNet.from_config(cfg.model)
    variables = load_npz_variables(
        Path(__file__).resolve().parent.parent /
        "resources/synthetic/weights.npz")
    engine = AttAsppEngine(cfg, variables)
    sweep_np, best, _ = make_sweep(140, 562, 744, seed=0)
    sweep = jax.device_put(sweep_np)
    sweep.block_until_ready()
    thr = 0.525

    # 1. forward path
    run_full = lambda: float(jnp.sum(engine.predict_full(sweep)
                                     .astype(jnp.float32)))
    t = med3(run_full)
    print(f"[r15] predict_full: {t:.3f} s  (warm +{time.time()-wall0:.0f}s)")

    probs = engine.predict_full(sweep)

    # 2. threshold → rank → order (the candidate cut)
    @jax.jit
    def rank_cut(probs):
        binary = (probs > thr).astype(jnp.uint8)
        areas = candidate_rank_areas(binary)
        idx = jnp.arange(binary.shape[0], dtype=jnp.int32)
        order = jnp.lexsort((-idx, -areas))
        return order[:8], binary

    t = med3(lambda: float(jnp.sum(rank_cut(probs)[0])))
    print(f"[r15] threshold+rank+cut: {t:.3f} s")

    cand_idx, binary = rank_cut(probs)
    cand = jnp.take(binary, cand_idx, axis=0)
    H, W = 562, 744
    hb, wb = refine_bucket_hw(H, W)
    padded = jnp.pad(cand, ((0, 0), (0, hb - H), (0, wb - W)))
    hw = jnp.asarray([H, W], jnp.int32)
    pc = cfg.predict

    refine_fn = jax.jit(functools.partial(
        _refine_mask_padded, min_area_px=pc.min_area_px,
        min_area_frac=pc.min_area_frac, close_kernel=pc.close_kernel))

    t = med3(lambda: float(jnp.sum(refine_fn(padded, hw)
                                   .astype(jnp.int32))))
    fg = int(jnp.sum(padded.astype(jnp.int32)))
    print(f"[r15] refine 8 real candidates (fg={fg}): {t:.3f} s")

    # content control: same foreground count, scattered at random
    rng = np.random.default_rng(0)
    scat = np.zeros((8, hb, wb), np.uint8)
    per = fg // 8
    for i in range(8):
        ys = rng.integers(0, H, per)
        xs = rng.integers(0, W, per)
        scat[i, ys, xs] = 1
    scat_d = jax.device_put(scat)
    t = med3(lambda: float(jnp.sum(refine_fn(scat_d, hw)
                                   .astype(jnp.int32))))
    print(f"[r15] refine 8 scattered (same fg): {t:.3f} s")

    # 4. full predict_case dispatch-only
    h = engine.predict_case_submit(sweep, thr)
    engine.predict_case_collect(h, (0.28, 0.28))
    t0 = time.time()
    hs = [engine.predict_case_submit(sweep, thr) for _ in range(4)]
    jax.block_until_ready(hs[-1][:2])
    per = (time.time() - t0) / 4
    print(f"[r15] predict_case dispatch-only: {per:.3f} s/sweep")
    frame, mask, ac = engine.predict_case_collect(hs[0], (0.28, 0.28))
    print(f"[r15] pick frame={frame} (true best {best}), "
          f"mask px={int(mask.sum())}, ac={ac:.1f} mm")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
