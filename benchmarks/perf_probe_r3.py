#!/usr/bin/env python
"""Round-2 (session 2) performance probes on the real TPU.

Targets the two dominant terms of the honest e2e budget (NOTES.md):
forward 0.515 s and CLAHE 0.11 s of the 0.65 s sweep.

Experiments (each new shape compiles through the remote service — batch
everything in one process, reuse shapes):

- stage_enc / stage_bridge / stage_u4 ... stage_full: cumulative truncated
  forwards at b16 no-TTA → per-stage time attribution.
- fwd_b8 / fwd_b16 / fwd_b32: micro-batch sweep of the full forward.
- convt_iso vs convt_d2s: isolated ConvTranspose(2,2,s2) vs the
  1×1-conv→depth_to_space lowering (identical math, N=4·C lanes).
- clahe_xla vs clahe_pallas_batched: LUT-interp formulations.

Prints one line per experiment: name  compile_s  median_run_s  frames_per_s
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _med(f, iters=3):
    ts = []
    for _ in range(iters):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    ap.add_argument("--frames", type=int, default=140)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    import functools

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from att_aspp_unet_tpu.config import ModelConfig
    from att_aspp_unet_tpu.infer.engine import predict_sweep_probs
    from att_aspp_unet_tpu.models import AttentionASPPUNet

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          file=sys.stderr)

    N, S = args.frames, 512
    rng = np.random.default_rng(0)
    x512 = jax.device_put(rng.random((N, S, S)).astype(np.float32))
    x512.block_until_ready()

    results = {}

    def report(name, compile_s, run_s, per_frame_count=N):
        fps = per_frame_count / run_s if run_s > 0 else float("inf")
        results[name] = (compile_s, run_s, fps)
        print(f"{name:24s} compile={compile_s:7.1f}s run={run_s:7.4f}s "
              f"fps={fps:8.1f}", flush=True)

    cfg = ModelConfig(base_c=48)
    model = AttentionASPPUNet.from_config(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, S, S, 1), jnp.float32), train=False)

    # ---- cumulative truncated forwards: where does the 0.5 s go? ----------
    class Truncated(nn.Module):
        """Replays AttentionASPPUNet.__call__ up to `upto`, reusing the full
        model's parameter tree (module/param names match exactly)."""
        base: AttentionASPPUNet
        upto: str  # enc | bridge | u4 | u3 | u2 | full

        @nn.compact
        def __call__(self, x, train: bool = False):
            from att_aspp_unet_tpu.nn.blocks import ASPP, ConvBNReLU, UpBlock
            m = self.base
            kw = dict(dtype=m.dtype, param_dtype=m.param_dtype)
            c = m.base_c
            x = x.astype(m.dtype)

            def enc(h, feats, name):
                h = ConvBNReLU(feats, name=f"{name}_0", **kw)(h, train)
                return ConvBNReLU(feats, name=f"{name}_1", **kw)(h, train)

            x1 = enc(x, c, "d1")
            x2 = enc(nn.max_pool(x1, (2, 2), (2, 2)), c * 2, "d2")
            x3 = enc(nn.max_pool(x2, (2, 2), (2, 2)), c * 4, "d3")
            x4 = enc(nn.max_pool(x3, (2, 2), (2, 2)), c * 8, "d4")
            if self.upto == "enc":
                return x4
            hb = nn.max_pool(x4, (2, 2), (2, 2))
            b = ASPP(c * 16, rates=tuple(m.aspp_rates), dropout=m.aspp_dropout,
                     impl=m.aspp_impl, name="bridge", **kw)(hb, train)
            if self.upto == "bridge":
                return b

            def up(level, feats, g, skip):
                return UpBlock(feats, use_att=m._gated(level),
                               gate_variant=m.gate_variant,
                               name=f"u{level}", **kw)(g, skip, train)

            d4, _ = up(4, c * 8, b, x4)
            if self.upto == "u4":
                return d4
            d3, _ = up(3, c * 4, d4, x3)
            if self.upto == "u3":
                return d3
            d2, _ = up(2, c * 2, d3, x2)
            if self.upto == "u2":
                return d2
            d1, _ = up(1, c, d2, x1)
            logits = nn.Conv(m.num_classes, (1, 1), use_bias=True,
                             dtype=m.dtype, param_dtype=m.param_dtype,
                             name="out_conv")(d1)
            return logits.astype(jnp.float32)

    def stage_exp(upto, batch=16):
        tm = Truncated(base=model, upto=upto)

        @functools.partial(jax.jit, static_argnames=())
        def run_all(v, frames):
            tiles = frames.reshape(-1, batch, S, S)[..., None]
            return jax.lax.map(lambda t: jnp.sum(
                tm.apply(v, t, train=False).astype(jnp.float32)), tiles)

        # pad frames to a batch multiple
        pad = (-N) % batch
        fp = jnp.pad(x512, ((0, pad), (0, 0), (0, 0)))
        run = lambda: float(jnp.sum(run_all(variables, fp)))
        t0 = time.time()
        run()
        report(f"stage_{upto}_b{batch}", time.time() - t0,
               _med(run, args.iters))

    # ---- micro-batch sweep over the real forward ---------------------------
    def fwd_exp(name, batch, hflip=False):
        apply_fn = lambda v, inp: model.apply(v, inp, train=False)
        run = lambda: float(jnp.sum(predict_sweep_probs(
            apply_fn, variables, x512, batch, hflip)))
        t0 = time.time()
        run()
        report(name, time.time() - t0, _med(run, args.iters))

    # ---- ConvTranspose lowering: native vs 1×1-conv + depth_to_space ------
    def convt_exp():
        B, H, C_in, C_out = 16, 256, 96, 48
        x = jax.device_put(rng.random((B, H, H, C_in)).astype(np.float32)
                           .astype(jnp.bfloat16))
        k = jax.device_put((rng.random((2, 2, C_in, C_out)) * 0.1)
                           .astype(np.float32).astype(jnp.bfloat16))

        @jax.jit
        def native(x, k):
            return jax.lax.conv_transpose(
                x, k, strides=(2, 2), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def d2s(x, k):
            # stride-2 kernel-2 transposed conv has no tap overlap: output
            # pixel (2i+di, 2j+dj) = x[i,j] @ k[di,dj]  → one 1×1 conv to
            # 4·C_out then depth-to-space
            kk = k.transpose(0, 1, 2, 3).reshape(4, C_in, C_out)
            kk = jnp.moveaxis(kk, 0, 1).reshape(C_in, 4 * C_out)
            y = jnp.einsum("bhwc,cd->bhwd", x, kk,
                           preferred_element_type=jnp.bfloat16)
            B_, H_, W_, _ = y.shape
            y = y.reshape(B_, H_, W_, 2, 2, C_out)
            y = y.transpose(0, 1, 3, 2, 4, 5)
            return y.reshape(B_, H_ * 2, W_ * 2, C_out)

        # numerical check once
        a = np.asarray(native(x, k), np.float32)
        b = np.asarray(d2s(x, k), np.float32)
        err = np.abs(a - b).max()
        print(f"convt max|Δ| = {err:.2e}", file=sys.stderr)

        for name, f in (("convt_native", native), ("convt_d2s", d2s)):
            run = lambda f=f: float(jnp.sum(f(x, k).astype(jnp.float32)))
            t0 = time.time()
            run()
            report(name, time.time() - t0, _med(run, args.iters),
                   per_frame_count=B)

    # ---- CLAHE: XLA one-hot vs batched Pallas ------------------------------
    def clahe_exp():
        from att_aspp_unet_tpu.ops.clahe import clahe

        H, W = 562, 744
        sweep = jax.device_put((rng.random((N, H, W)) * 255).astype(np.uint8))
        sweep.block_until_ready()

        for name, up in (("clahe_xla", False), ("clahe_pallas", True)):
            run = lambda up=up: float(jnp.sum(
                clahe(sweep, 1.0, (8, 8), use_pallas=up).astype(jnp.int32)))
            t0 = time.time()
            try:
                run()
            except Exception as e:
                print(f"{name:24s} FAILED: {type(e).__name__}: {e}",
                      flush=True)
                continue
            report(name, time.time() - t0, _med(run, args.iters))

    todo = [
        ("stage_enc", lambda: stage_exp("enc")),
        ("stage_bridge", lambda: stage_exp("bridge")),
        ("stage_u4", lambda: stage_exp("u4")),
        ("stage_u3", lambda: stage_exp("u3")),
        ("stage_u2", lambda: stage_exp("u2")),
        ("stage_full", lambda: stage_exp("full")),
        ("fwd_b8", lambda: fwd_exp("fwd_b8", 8)),
        ("fwd_b16", lambda: fwd_exp("fwd_b16", 16)),
        ("fwd_b32", lambda: fwd_exp("fwd_b32", 32)),
        ("convt", convt_exp),
        ("clahe", clahe_exp),
    ]

    for name, fn in todo:
        if only and name not in only:
            continue
        try:
            fn()
        except Exception as e:  # keep probing the rest
            import traceback
            traceback.print_exc()
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}", flush=True)

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
