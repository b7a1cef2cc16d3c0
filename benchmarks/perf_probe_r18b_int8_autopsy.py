"""Probe r18b — why does the int8 forward LOSE in-graph (r18) when every
stage conv wins in isolation (r16) and the quant chain fuses (r16b)?

Decomposition, all on preprocessed 512² frames (the production tensor):

  A. forward bf16, single 16-frame batch (one apply, no lax.map)
  B. forward int8, single 16-frame batch            → conv/layout effect
  C. forward bf16 under lax.map over 9 micro-batches (production shape)
  D. forward int8 under lax.map                     → adds any hoisting
                                                      failure of the
                                                      in-graph weight quant
  E. forward int8 under lax.map, weights PRE-quantized outside jit
                                                      → isolates weight
                                                        quantization cost

Timing: single dispatch per run (the whole lax.map is one program), forced
scalar readback, median of --iters.
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
    ap.add_argument("--frames", type=int, default=144)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import dataclasses
    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import Config, ModelConfig, \
        PreprocessConfig
    from att_aspp_unet_tpu.infer.engine import predict_sweep_probs
    from att_aspp_unet_tpu.models import AttentionASPPUNet
    from att_aspp_unet_tpu.preprocess.enhance import preprocess_sweep
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    print(f"[r18b] backend={jax.default_backend()}", file=sys.stderr)
    syn = Path(__file__).resolve().parent.parent / "resources" / "synthetic"
    variables = load_npz_variables(syn / "weights.npz")

    mcfg = ModelConfig(base_c=48)
    model = AttentionASPPUNet.from_config(mcfg)
    qmodel = model.clone(conv_lowering="int8")
    cmodel = model.clone(conv_lowering="int8_calib")

    sweep, _, _ = make_sweep(args.frames, 562, 744, seed=0)
    x = jax.jit(lambda s: preprocess_sweep(s, 512, 1.0, (8, 8), 3))(
        jax.device_put(sweep))
    x = jax.device_put(x)
    float(jnp.sum(x))

    # calibrate scales once
    calib_apply = lambda v, inp: cmodel.apply(v, inp, train=False,
                                              mutable=["quant"])
    (_, upd) = jax.jit(calib_apply)(
        {k: variables[k] for k in ("params", "batch_stats")}, x[:16, ..., None])
    qvars = {**variables, "quant": jax.device_put(upd["quant"])}
    variables = jax.device_put(variables)
    qvars = jax.device_put(qvars)

    def timed(fn):
        fn()  # compile + warm
        ts = []
        for _ in range(args.iters):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2]

    b_apply = lambda v, inp: model.apply(v, inp, train=False)
    q_apply = lambda v, inp: qmodel.apply(v, inp, train=False)

    # A/B: one 16-frame batch, one apply
    x16 = x[:16, ..., None]
    jb = jax.jit(lambda v, inp: b_apply(v, inp)[0])
    jq = jax.jit(lambda v, inp: q_apply(v, inp)[0])
    tA = timed(lambda: float(jnp.sum(jb(variables, x16))))
    print(f"[r18b] A bf16 single b16 apply: {tA*1e3:7.1f} ms", file=sys.stderr)
    tB = timed(lambda: float(jnp.sum(jq(qvars, x16))))
    print(f"[r18b] B int8 single b16 apply: {tB*1e3:7.1f} ms  "
          f"x{tA/tB:4.2f}", file=sys.stderr)

    # C/D: production lax.map structure over the full sweep
    tC = timed(lambda: float(jnp.sum(predict_sweep_probs(
        b_apply, variables, x, 16, False))))
    print(f"[r18b] C bf16 lax.map 9x16:     {tC*1e3:7.1f} ms", file=sys.stderr)
    tD = timed(lambda: float(jnp.sum(predict_sweep_probs(
        q_apply, qvars, x, 16, False))))
    print(f"[r18b] D int8 lax.map 9x16:     {tD*1e3:7.1f} ms  "
          f"x{tC/tD:4.2f}", file=sys.stderr)

    # E: weights pre-quantized OUTSIDE the jit (int8 kernels in the params
    # tree + per-site w_scale in the quant collection)
    from att_aspp_unet_tpu.nn.quant import merge_quant, prequantize_params
    pq_params, w_scales = prequantize_params(jax.device_get(
        variables["params"]))
    evars = jax.device_put({"params": pq_params,
                            "batch_stats": variables["batch_stats"],
                            "quant": merge_quant(
                                jax.device_get(qvars["quant"]), w_scales)})
    tE = timed(lambda: float(jnp.sum(predict_sweep_probs(
        q_apply, evars, x, 16, False))))
    print(f"[r18b] E int8 prequant lax.map: {tE*1e3:7.1f} ms  "
          f"x{tC/tE:4.2f} vs bf16, x{tD/tE:4.2f} vs in-graph-quant",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
