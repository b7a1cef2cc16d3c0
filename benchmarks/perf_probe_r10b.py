#!/usr/bin/env python
"""Round-2 probe, part 9: refine_mask cost vs mask content on device.

Times _refine_mask_padded on (8, 576, 768) for: speckle masks (the bench's
random-weight 97th-percentile threshold load), one blobby ellipse per frame
(realistic anatomy), and blob+specks.  Also times the threshold→top-K
portion without refine to close the attribution.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def med(f, iters=5):
    ts = []
    for _ in range(iters):
        t0 = time.time()
        f()
        ts.append(time.time() - t0)
    return sorted(ts)[len(ts) // 2]


def main() -> int:
    from att_aspp_unet_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from att_aspp_unet_tpu.postprocess.refine import _refine_mask_padded

    print(f"backend={jax.default_backend()}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    H, W = 562, 744
    HB, WB = 576, 768
    yy, xx = np.mgrid[:H, :W]

    speck = (rng.random((8, H, W)) < 0.03).astype(np.uint8)
    blob = np.zeros((8, H, W), np.uint8)
    for i in range(8):
        cy, cx = 200 + 20 * i, 300 + 10 * i
        blob[i] = ((yy - cy) ** 2 / 120 ** 2 + (xx - cx) ** 2 / 90 ** 2
                   <= 1.0)
    mix = np.clip(blob + speck, 0, 1).astype(np.uint8)

    hw = jnp.asarray([H, W], jnp.int32)

    @jax.jit
    def run(m):
        padded = jnp.pad(m, ((0, 0), (0, HB - H), (0, WB - W)))
        out = _refine_mask_padded(padded, hw, 20, 0.0015, 7)
        return jnp.sum(out.astype(jnp.int32))

    for name, m in (("speckle", speck), ("blob", blob), ("blob+speck", mix)):
        md = jax.device_put(jnp.asarray(m))
        md.block_until_ready()
        t0 = time.time()
        v = int(run(md))
        comp = time.time() - t0
        t = med(lambda: int(run(md)))
        print(f"{name:10s} compile={comp:6.1f}s run={t:7.4f}s sum={v}",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
