"""Postprocess kernels vs scipy oracles (SURVEY.md §4 test pyramid)."""

import numpy as np
import pytest
from scipy import ndimage as ndi

from att_aspp_unet_tpu.postprocess import (
    binary_closing, binary_dilation, binary_erosion, boundary_mask,
    circularity, fill_holes, label_components, largest_component,
    perimeter_estimate, postprocess_roi_stack, postprocess_softmax_stack,
    refine_mask, select_best_frame, select_max_area_frame, structuring_ellipse,
)

S8 = np.ones((3, 3), np.uint8)


def _random_blobs(rng, shape=(48, 48), p=0.35):
    m = (rng.random(shape) < p)
    return ndi.binary_closing(m).astype(np.uint8)


def _partition_equal(labels_a, labels_b):
    """Two labelings describe the same partition (bijective relabeling)."""
    a, b = labels_a.ravel(), labels_b.ravel()
    assert ((a > 0) == (b > 0)).all()
    fg = a > 0
    pairs = set(zip(a[fg].tolist(), b[fg].tolist()))
    assert len(pairs) == len({p[0] for p in pairs}) == len({p[1] for p in pairs})


def test_label_components_8conn(rng):
    for _ in range(3):
        m = _random_blobs(rng)
        got = np.asarray(label_components(m[None], connectivity=8))[0]
        want, _ = ndi.label(m, structure=S8)
        _partition_equal(got, want)


def test_label_components_4conn(rng):
    m = _random_blobs(rng)
    got = np.asarray(label_components(m[None], connectivity=4))[0]
    want, _ = ndi.label(m)  # scipy default = cross
    _partition_equal(got, want)


def test_label_components_3d(rng):
    vol = (rng.random((6, 24, 24)) < 0.3).astype(np.uint8)
    got = np.asarray(label_components(vol, connectivity=6, ndim=3))
    want, _ = ndi.label(vol)  # 3-D cross structure
    _partition_equal(got, want)


def test_label_spiral():
    # worst-case geometry for propagation: a long winding path
    m = np.zeros((31, 31), np.uint8)
    m[0, :] = 1
    for r in range(2, 31, 4):
        m[r, :] = 1
    for r in range(1, 30, 8):
        m[r:r + 2, -1] = 1
    for r in range(5, 30, 8):
        m[r:r + 2, 0] = 1
    got = np.asarray(label_components(m[None]))[0]
    want, n = ndi.label(m, structure=S8)
    _partition_equal(got, want)


def test_largest_component(rng):
    m = np.zeros((40, 40), np.uint8)
    m[2:10, 2:10] = 1          # 64 px
    m[20:36, 20:36] = 1        # 256 px
    m[15, 0:3] = 1             # 3 px
    got = np.asarray(largest_component(m[None]))[0]
    want = np.zeros_like(m)
    want[20:36, 20:36] = 1
    np.testing.assert_array_equal(got, want)


def test_largest_component_min_area():
    m = np.zeros((20, 20), np.uint8)
    m[2:4, 2:4] = 1            # 4 px < min_area
    got = np.asarray(largest_component(m[None], min_area=10))[0]
    assert got.sum() == 0


def test_fill_holes(rng):
    m = np.zeros((30, 30), np.uint8)
    m[5:25, 5:25] = 1
    m[10:18, 10:18] = 0        # hole
    m[0:3, 0:3] = 1            # touching border, no hole
    got = np.asarray(fill_holes(m))
    want = ndi.binary_fill_holes(m).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_fill_holes_random(rng):
    for _ in range(3):
        m = _random_blobs(rng, (40, 40), 0.45)
        got = np.asarray(fill_holes(m))
        want = ndi.binary_fill_holes(m).astype(np.uint8)
        np.testing.assert_array_equal(got, want)


def test_binary_dilation_matches_scipy(rng):
    m = _random_blobs(rng)
    got = np.asarray(binary_dilation(m, S8))
    want = ndi.binary_dilation(m, structure=S8).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_binary_erosion_border_fg():
    m = np.ones((10, 10), np.uint8)
    m[5, 5] = 0
    got = np.asarray(binary_erosion(m, S8, border_foreground=True))
    # edge survives (OpenCV closing semantics); ring around the pit erodes
    assert got[0, 0] == 1 and got[4, 4] == 0 and got[5, 5] == 0


def test_structuring_ellipse_7():
    el = structuring_ellipse(7)
    rows = el.sum(axis=1).tolist()
    assert rows == [1, 5, 7, 7, 7, 5, 1]
    np.testing.assert_array_equal(el, el[::-1])
    np.testing.assert_array_equal(el, el[:, ::-1])


def test_binary_closing_bridges_gap():
    m = np.zeros((20, 20), np.uint8)
    m[8:12, 2:9] = 1
    m[8:12, 11:18] = 1         # 2-px gap
    got = np.asarray(binary_closing(m, structuring_ellipse(7)))
    assert got[9, 9] == 1 and got[9, 10] == 1
    assert (got >= m).all()    # closing is extensive on the original


def test_refine_mask_scenario():
    m = np.zeros((64, 64), np.uint8)
    m[10:40, 10:40] = 1        # main blob (900 px)
    m[20:26, 20:26] = 0        # hole → filled
    m[50:52, 50:52] = 1        # 4 px speck → dropped
    got = np.asarray(refine_mask(m[None]))[0]
    assert got[22, 22] == 1    # hole filled
    assert got[50, 50] == 0    # speck gone
    assert got[15, 15] == 1


def test_refine_mask_all_small():
    m = np.zeros((64, 64), np.uint8)
    m[0:3, 0:3] = 1            # 9 px < max(20, 6) = 20
    got = np.asarray(refine_mask(m[None]))[0]
    assert got.sum() == 0


def test_postprocess_roi_stack():
    prob = np.zeros((4, 32, 32), np.float32)
    prob[1, 5:15, 5:15] = 0.9          # area 100
    prob[2, 5:25, 5:25] = 0.9          # area 400 ← winner
    prob[2, 28:30, 28:30] = 0.9        # secondary component on winner frame
    got = np.asarray(postprocess_roi_stack(prob, 0.05))
    assert got[0].sum() == 0 and got[1].sum() == 0 and got[3].sum() == 0
    assert got[2, 10, 10] == 1
    assert got[2, 28:30, 28:30].sum() == 0   # only largest CC kept
    # dilation by one: winner grew beyond 400
    assert got[2].sum() > 400


def test_postprocess_roi_stack_empty():
    prob = np.zeros((3, 16, 16), np.float32)
    got = np.asarray(postprocess_roi_stack(prob, 0.05))
    assert got.sum() == 0


def test_postprocess_softmax_stack():
    C, N, H, W = 3, 4, 24, 24
    sm = np.zeros((C, N, H, W), np.float32)
    sm[0] = 0.6
    # class 1: big 3-D blob frames 0-1 + small blob frame 3
    sm[1, 0:2, 4:12, 4:12] = 0.9
    sm[1, 3, 0:2, 0:2] = 0.9
    # class 2: single blob frame 2
    sm[2, 2, 10:20, 10:20] = 0.9
    sm[0, 1, 4:12, 4:12] = 0.0
    sm[0, 0, 4:12, 4:12] = 0.0
    got = np.asarray(postprocess_softmax_stack(sm, 0.5))
    assert (got[0, 5, 5] == 1) and (got[1, 5, 5] == 1)
    assert got[3].sum() == 0                  # small class-1 blob removed
    assert (got[2, 15, 15] == 2)


def test_select_max_area_frame():
    stack = np.zeros((5, 16, 16), np.uint8)
    stack[1, 2:6, 2:6] = 1
    stack[3, 2:12, 2:12] = 1
    sel, frame = select_max_area_frame(stack)
    assert int(frame) == 3
    np.testing.assert_array_equal(np.asarray(sel), stack[3])


def test_select_max_area_frame_empty():
    stack = np.zeros((4, 8, 8), np.uint8)
    sel, frame = select_max_area_frame(stack)
    assert int(frame) == -1
    assert np.asarray(sel).sum() == 0


def _disk(shape, cy, cx, r):
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.uint8)


def test_perimeter_estimate_disk():
    m = _disk((64, 64), 32, 32, 20)
    p = float(perimeter_estimate(m))
    assert abs(p - 2 * np.pi * 20) / (2 * np.pi * 20) < 0.06


def test_circularity_ranks_disk_over_bar():
    disk = _disk((64, 64), 32, 32, 12)
    bar = np.zeros((64, 64), np.uint8)
    bar[28:36, 2:62] = 1       # elongated, similar area (480 vs 452)
    c_disk = float(circularity(disk))
    c_bar = float(circularity(bar))
    assert c_disk > 0.85 and c_disk > c_bar


def test_select_best_frame_prefers_round():
    stack = np.zeros((6, 64, 64), np.uint8)
    stack[1] = _disk((64, 64), 32, 32, 12)           # round, area 452
    stack[4, 20:28, 2:62] = 1                        # bigger area 480, ragged
    idx = int(select_best_frame(stack, topk=5))
    assert idx == 1


def test_boundary_mask_ring():
    m = _disk((32, 32), 16, 16, 8)
    b = np.asarray(boundary_mask(m))
    inner = ndi.binary_erosion(m, structure=np.array([[0, 1, 0], [1, 1, 1],
                                                      [0, 1, 0]], np.uint8),
                               border_value=1)
    np.testing.assert_array_equal(b, (m & ~inner).astype(np.uint8))


# ---------------- baseline probability-map utilities ----------------

def test_get_binary_masks_and_positive_frames():
    from att_aspp_unet_tpu.postprocess import (get_binary_masks,
                                               get_positive_frames)

    sm = np.zeros((3, 4, 6, 6), np.float32)
    sm[1, 1, 2:4, 2:4] = 0.7
    sm[1, 3, 1, 1] = 0.4
    b = get_binary_masks(sm, 0.5, 1)
    assert b.shape == (4, 6, 6) and b.dtype == np.uint8
    assert b.sum() == 4 and b[1, 2, 2] == 1          # 0.4 < thr dropped
    assert get_positive_frames(b) == [1]
    assert get_positive_frames(np.zeros((3, 4, 4))) == []


def test_merge_annotations():
    from att_aspp_unet_tpu.postprocess import merge_annotations

    a = np.zeros((6, 6), np.uint8)
    b = np.zeros((6, 6), np.uint8)
    a[1:4, 1:4] = 1            # 9 px of label 1
    b[3:5, 3:5] = 2            # 4 px of label 2, overlaps at (3,3)
    m = merge_annotations(a, b)
    assert m.ndim == 2                        # 2-D in → 2-D out
    assert m[1, 1] == 1 and m[4, 4] == 2
    assert m[3, 3] == 1                       # label 1 has more pixels
    m2 = merge_annotations(a, b, priority_label=2)
    assert m2[3, 3] == 2
    # 3-D passthrough
    m3 = merge_annotations(a[None], b[None])
    assert m3.shape == (1, 6, 6)


def test_select_best_exact_vs_crofton_disagreement():
    """On elongated-rectangle vs diamond masks the Crofton estimate and the
    traced perimeter rank OPPOSITE ways; the exact selector must pick the
    cv2-semantics winner (VERDICT r1 weak #4)."""
    from att_aspp_unet_tpu.measure.contour import circularity_score
    from att_aspp_unet_tpu.postprocess.select import (
        circularity, select_best_frame, select_best_frame_exact)

    H = W = 64
    stack = np.zeros((2, H, W), np.uint8)
    stack[0, 20:30, 10:50] = 1                     # 10×40 rectangle
    yy, xx = np.mgrid[:H, :W]
    stack[1] = (np.abs(yy - 32) + np.abs(xx - 32) <= 13).astype(np.uint8)

    import jax.numpy as jnp

    exact = [circularity_score(m) for m in stack]
    crofton = np.asarray(circularity(jnp.asarray(stack)))
    # the two measures must actually disagree on the ranking for this test
    # to mean anything
    assert (exact[0] < exact[1]) and (crofton[0] > crofton[1])

    assert select_best_frame_exact(stack, topk=2) == 1      # diamond rounder
    assert int(select_best_frame(jnp.asarray(stack), topk=2)) == 0


def test_select_best_exact_tie_order_matches_reference():
    """Equal circularity → the larger-area candidate wins, and equal areas
    follow argsort[::-1]'s higher-index-first order."""
    from att_aspp_unet_tpu.postprocess.select import select_best_frame_exact

    stack = np.zeros((3, 32, 32), np.uint8)
    stack[0, 8:24, 8:24] = 1                       # 16×16 square
    stack[2, 8:24, 8:24] = 1                       # identical square
    stack[1, 10:14, 10:14] = 1                     # small square
    # frames 0 and 2 tie on area AND circularity; argsort[::-1] visits
    # index 2 first, max() keeps the first maximum → frame 2
    assert select_best_frame_exact(stack, topk=3) == 2


def test_refine_mask_bucketed_equivalence(rng):
    """Bucketed (zero-padded + runtime true_hw) refine must equal the
    true-shape refine exactly — including edge-touching masks, where the
    closing's virtual border matters, and the min-area threshold, which must
    use the TRUE image area."""
    from att_aspp_unet_tpu.postprocess import refine_mask, refine_mask_bucketed

    H, W = 50, 70
    masks = np.zeros((4, H, W), np.uint8)
    yy, xx = np.mgrid[:H, :W]
    masks[0] = (((yy - 25) / 12.0) ** 2 + ((xx - 30) / 20.0) ** 2 < 1)
    masks[0, 20:24, 28:34] = 0                       # hole
    masks[1, :10, :14] = 1                           # touches the true border
    masks[1, 40:42, 60:64] = 1                       # small speck
    masks[2] = (rng.random((H, W)) > 0.8)            # speckle
    # frame 3 left empty
    ref = np.asarray(refine_mask(masks, 20, 0.0015, 7))
    got = np.asarray(refine_mask_bucketed(masks, 20, 0.0015, 7))
    np.testing.assert_array_equal(got, ref)

    # min-area: a component below max(20, 0.0015·H·W) must vanish — with the
    # TRUE area, not the bucket area (bucket would raise the threshold)
    small = np.zeros((1, H, W), np.uint8)
    small[0, 2:6, 2:7] = 1                           # 20 px ≥ max(20, 5) keeps
    assert np.asarray(refine_mask_bucketed(small, 20, 0.0015, 7)).sum() > 0
    tiny = np.zeros((1, H, W), np.uint8)
    tiny[0, 2:5, 2:5] = 1                            # 9 px < 20 drops
    assert np.asarray(refine_mask_bucketed(tiny, 20, 0.0015, 7)).sum() == 0
