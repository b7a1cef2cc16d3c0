"""Probe r43 — the host-side deployment wall clock (VERDICT r4 #3).

Probe r39 measured 109 s wall for a 3-case directory pass against 0.27 s
of device time: "almost entirely HOST file IO".  This probe (a) measures
the pieces in isolation — .mha zlib decode (native inflate path),
header+frombuffer, device upload — and (b) A/Bs the directory pass with
the depth-1 read-ahead thread (predict_cli.predict_directory
``read_ahead``) ON vs OFF in one process, flagship config (trained
weights + distilled scout, cascade).

Expectation: decode is C-speed zlib (GIL released), so reading case i+1
under case i's upload+serve+write should hide most of the decode wall;
the residual floor is max(decode, upload+serve+write) per case plus one
un-hidden decode.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=3)
    ap.add_argument("--frames", type=int, default=840)
    ap.add_argument("--hw", default="562x744")
    ap.add_argument("--workdir", default="/tmp/r43")
    args = ap.parse_args()
    H, W = (int(t) for t in args.hw.split("x"))

    import jax

    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    from att_aspp_unet_tpu.config import (Config, ModelConfig, PredictConfig,
                                          PreprocessConfig)
    from att_aspp_unet_tpu.infer.predict_cli import predict_directory
    from att_aspp_unet_tpu.io import MetaImage, read_mha, write_mha
    from att_aspp_unet_tpu.tools.synthetic import make_sweep
    from att_aspp_unet_tpu.utils.npz_weights import load_npz_variables

    print(f"[r43] backend={jax.default_backend()}", file=sys.stderr)
    root = Path(__file__).resolve().parent.parent
    syn = root / "resources" / "synthetic"
    variables = load_npz_variables(syn / "weights.npz")
    cal = json.loads((syn / "thr.json").read_text())
    thr = float(cal.get("best_thr_no_tta", cal["best_thr"]))

    wd = Path(args.workdir)
    in_dir = wd / "input"
    raw_mb = args.frames * H * W / 1e6
    gen_t = write_t = 0.0
    if len(list(in_dir.glob("case*.mha"))) == args.cases:
        # reuse the previously generated inputs (the ~270 s of synthetic
        # host generation is probe setup, not measurement)
        for d in wd.glob("out_*"):
            shutil.rmtree(d, ignore_errors=True)
        print(f"[r43] reusing {args.cases} cases in {in_dir}",
              file=sys.stderr)
    else:
        shutil.rmtree(wd, ignore_errors=True)
        in_dir.mkdir(parents=True)
        # ---- stage A: write the cases (compressed, deployment format) ----
        sizes = []
        for c in range(args.cases):
            t0 = time.time()
            sweep, _, _ = make_sweep(args.frames, H, W, seed=c)
            gen_t += time.time() - t0
            t0 = time.time()
            write_mha(in_dir / f"case{c:02d}.mha",
                      MetaImage(sweep, spacing=(0.28, 0.28, 0.28)),
                      compressed=True)
            write_t += time.time() - t0
            sizes.append((in_dir / f"case{c:02d}.mha").stat().st_size)
        print(f"[r43] {args.cases} cases, raw {raw_mb:.0f} MB each, "
              f"compressed {[round(s/1e6, 1) for s in sizes]} MB "
              f"(gen {gen_t:.1f}s host, deflate+write "
              f"{write_t/args.cases:.2f} s/case)", file=sys.stderr)

    # ---- stage B: decode in isolation ----
    ts = []
    for _ in range(3):
        t0 = time.time()
        img = read_mha(in_dir / "case00.mha")
        ts.append(time.time() - t0)
    decode = sorted(ts)[1]
    print(f"[r43] read_mha (inflate+frombuffer) {decode:.2f} s/case "
          f"({raw_mb/decode:.0f} MB/s decompressed)", file=sys.stderr)

    # ---- stage C: upload in isolation ----
    ts = []
    for i in range(3):
        # re-slice so each upload is a fresh buffer (no tunnel-side memo)
        arr = img.array.copy() if i else img.array
        t0 = time.time()
        d = jax.device_put(arr)
        d.block_until_ready()
        ts.append(time.time() - t0)
        del d
    upload = sorted(ts)[1]
    print(f"[r43] device_put {upload:.2f} s/case "
          f"({raw_mb/upload:.0f} MB/s)", file=sys.stderr)
    del img

    # ---- stage D: directory pass, read_ahead OFF vs ON ----
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
    walls = {}
    for mode, ra in (("sync", False), ("read_ahead", True)):
        out = wd / f"out_{mode}"
        t0 = time.time()
        rows = predict_directory(cfg, variables, in_dir, out,
                                 threshold=thr, read_ahead=ra,
                                 log=lambda *a: None)
        walls[mode] = time.time() - t0
        print(f"[r43] directory pass ({mode}): {walls[mode]:.1f} s "
              f"for {args.cases} cases "
              f"({args.cases/walls[mode]:.2f} cases/s); rows={rows}",
              file=sys.stderr)
    # same-process second pass reuses every compiled program, so the sync
    # run (first) carries the compile; run sync once more for a fair wall
    out = wd / "out_sync2"
    t0 = time.time()
    predict_directory(cfg, variables, in_dir, out, threshold=thr,
                      read_ahead=False, log=lambda *a: None)
    walls["sync_warm"] = time.time() - t0
    print(f"[r43] directory pass (sync, warm): {walls['sync_warm']:.1f} s",
          file=sys.stderr)
    import filecmp
    same = filecmp.cmp(wd / "out_sync/ac_results.csv",
                       wd / "out_read_ahead/ac_results.csv", shallow=False)
    print(f"[r43] ac_results.csv identical: {same}", file=sys.stderr)
    print(f"[r43] SUMMARY decode {decode:.2f}s upload {upload:.2f}s; "
          f"wall/case sync_warm {walls['sync_warm']/args.cases:.1f}s vs "
          f"read_ahead {walls['read_ahead']/args.cases:.1f}s "
          f"(x{walls['sync_warm']/walls['read_ahead']:.2f})",
          file=sys.stderr)
    print(json.dumps({
        "probe": "r43", "decode_s": round(decode, 3),
        "upload_s": round(upload, 3),
        "write_s_per_case": round(write_t / args.cases, 3),
        "csv_identical": bool(same),
        "walls": {k: round(v, 2) for k, v in walls.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
