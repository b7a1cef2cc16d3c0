"""NumPy reference oracles transcribed from the OpenCV algorithm specs.

These are intentionally written loop-wise/naively and independently of the
vectorised JAX kernels in ``att_aspp_unet_tpu.ops`` so the unit tests compare
two separate derivations of the same spec (SURVEY.md §4: every kernel gets a
NumPy oracle).
"""

import numpy as np


def minmax_u8_oracle(frame: np.ndarray) -> np.ndarray:
    f = frame.astype(np.float64)
    lo, hi = f.min(), f.max()
    if hi <= lo:
        return np.zeros_like(frame, dtype=np.uint8)
    y = (f - lo) * (255.0 / (hi - lo))
    return np.clip(np.round(y), 0, 255).astype(np.uint8)


def median3_oracle(frame: np.ndarray) -> np.ndarray:
    p = np.pad(frame, 1, mode="edge")
    H, W = frame.shape
    out = np.empty_like(frame)
    for i in range(H):
        for j in range(W):
            out[i, j] = np.median(p[i:i + 3, j:j + 3])
    return out


def clahe_oracle(frame: np.ndarray, clip_limit: float = 1.0,
                 grid=(8, 8)) -> np.ndarray:
    """cv2.createCLAHE(clipLimit, tileGridSize).apply — loopwise transcription."""
    tiles_x, tiles_y = grid  # cv2 order: (cols, rows)
    H, W = frame.shape
    pad_h = (-H) % tiles_y
    pad_w = (-W) % tiles_x
    ext = np.pad(frame, ((0, pad_h), (0, pad_w)), mode="reflect") \
        if (pad_h or pad_w) else frame
    He, We = ext.shape
    th, tw = He // tiles_y, We // tiles_x
    tile_area = th * tw
    clip = max(int(clip_limit * tile_area / 256), 1)

    luts = np.zeros((tiles_y, tiles_x, 256), np.int32)
    for ty in range(tiles_y):
        for tx in range(tiles_x):
            tile = ext[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
            hist = np.bincount(tile.ravel(), minlength=256).astype(np.int64)
            excess = int(np.maximum(hist - clip, 0).sum())
            hist = np.minimum(hist, clip)
            hist += excess // 256
            residual = excess % 256
            if residual:
                step = max(256 // residual, 1)
                i = 0
                while i < 256 and residual > 0:
                    hist[i] += 1
                    residual -= 1
                    i += step
            lut = np.rint(np.cumsum(hist) * (255.0 / tile_area))
            luts[ty, tx] = np.clip(lut, 0, 255)

    # cv2's interpolation body works in float32 — mirror that exactly.
    f32 = np.float32
    inv_th, inv_tw = f32(1.0 / th), f32(1.0 / tw)
    out = np.zeros_like(frame)
    for y in range(H):
        tyf = f32(y) * inv_th - f32(0.5)
        ty1 = int(np.floor(tyf))
        ya = f32(tyf - ty1)
        ty2 = min(ty1 + 1, tiles_y - 1)
        ty1 = max(ty1, 0)
        for x in range(W):
            txf = f32(x) * inv_tw - f32(0.5)
            tx1 = int(np.floor(txf))
            xa = f32(txf - tx1)
            tx2 = min(tx1 + 1, tiles_x - 1)
            tx1 = max(tx1, 0)
            v = frame[y, x]
            one = f32(1.0)
            r = (f32(luts[ty1, tx1, v]) * ((one - ya) * (one - xa))
                 + f32(luts[ty1, tx2, v]) * ((one - ya) * xa)
                 + f32(luts[ty2, tx1, v]) * (ya * (one - xa))
                 + f32(luts[ty2, tx2, v]) * (ya * xa))
            out[y, x] = np.clip(np.rint(r), 0, 255)
    return out.astype(np.uint8)


def gaussian5_oracle(frame: np.ndarray) -> np.ndarray:
    """cv2.GaussianBlur((5,5), 0): fixed kernel, reflect-101 border."""
    k = np.array([0.0625, 0.25, 0.375, 0.25, 0.0625])
    p = np.pad(frame.astype(np.float64), 2, mode="reflect")
    H, W = frame.shape
    tmp = np.zeros((H, W + 4))
    for i in range(H):
        tmp[i] = sum(k[d] * p[i + d, :] for d in range(5))
    out = np.zeros((H, W))
    for j in range(W):
        out[:, j] = sum(k[d] * tmp[:, j + d] for d in range(5))
    return out


def sobel_oracle(x: np.ndarray):
    kx = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float64)
    ky = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], np.float64)
    p = np.pad(x.astype(np.float64), 1)
    H, W = x.shape
    gx = np.zeros((H, W))
    gy = np.zeros((H, W))
    for i in range(H):
        for j in range(W):
            win = p[i:i + 3, j:j + 3]
            gx[i, j] = (win * kx).sum()
            gy[i, j] = (win * ky).sum()
    return gx, gy
