"""Challenge output contract writers.

Byte-layout-faithful to the reference's TWO writer paths:

- **Container** (``/root/reference/inference.py:208-255``): the mask is
  relabeled 1→2 inside ``convert_2d_mask_to_3d`` but then *re-binarised to
  {0, 1}* before writing (``inference.py:230-235``: ``np.where(array_3d >
  0.5, 1, 0)`` + binarity assert) — the written volume is uint8 ∈ {0, 1},
  isotropic 0.28 mm spacing, zlib-compressed, and the reference verifies the
  write by reading the file back (``inference.py:247-254``), replicated here.
- **Standalone predict CLI** (``attention_aspp_unet_pipeline_stage.py:526-
  536``): label 2 survives (ITK-SNAP green), geometry copied from the input
  volume, uncompressed.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..io import MetaImage, read_mha, write_json, write_mha


def convert_2d_mask_to_3d(mask_2d: np.ndarray, frame_number: int,
                          number_of_frames: int,
                          label: int = 2) -> np.ndarray:
    """Place the (relabeled 1→``label``) 2-D mask at ``frame_number`` of an
    otherwise zero (N, H, W) uint8 volume; −1 → all zeros; out-of-range →
    error (``/root/reference/inference.py:257-273``)."""
    m = np.where(np.asarray(mask_2d) > 0, label, 0).astype(np.uint8)
    vol = np.zeros((number_of_frames, *m.shape), np.uint8)
    if frame_number == -1:
        return vol
    if frame_number is not None and 0 <= frame_number < number_of_frames:
        vol[frame_number] = m
        return vol
    raise ValueError(
        f"frame_number must be between -1 and {number_of_frames - 1}, "
        f"got {frame_number}.")


def _verify_written(path: Path, expected: np.ndarray) -> None:
    """Write-then-read-back verification, as the reference does after every
    container write (``/root/reference/inference.py:247-254``)."""
    check = read_mha(path)
    arr = np.asarray(check.array)
    assert arr.shape == expected.shape, (
        f"read-back shape {arr.shape} != written {expected.shape}")
    assert arr.dtype == np.uint8, f"read-back dtype {arr.dtype} != uint8"
    assert np.array_equal(arr, expected), "read-back voxels differ from written"


def write_segmentation_output(location: Path, mask_2d: np.ndarray,
                              frame_number: int, number_of_frames: int,
                              filename: str = "output.mha",
                              spacing: Tuple[float, float, float] = (0.28, 0.28, 0.28),
                              reference: Optional[MetaImage] = None,
                              binarize: bool = True,
                              compressed: bool = True,
                              verify: bool = True) -> Path:
    """Write a segmentation .mha.

    ``binarize=True`` is the container contract: after the 1→2 relabel the
    reference re-binarises to {0, 1} and asserts it
    (``inference.py:230-235``).  ``binarize=False`` keeps label 2 — the
    standalone CLI contract (``…stage.py:526-529``)."""
    location = Path(location)
    location.mkdir(parents=True, exist_ok=True)
    # relabel/binarize on the 2-D mask BEFORE expanding to 3-D: the full
    # case volume is ~351 MB and the former np.where + np.unique over it
    # were two more full-volume passes per case (probe r43 host-wall
    # attribution).  The volume is zeros outside `frame_number` by
    # construction, so checking the single written frame checks it all.
    m2 = convert_2d_mask_to_3d(np.squeeze(mask_2d), 0, 1)[0]
    if binarize:
        m2 = (m2 > 0.5).astype(np.uint8)
        assert set(np.unique(m2)).issubset({0, 1}), "non-binary output mask"
    else:
        assert set(np.unique(m2)).issubset({0, 2}), "non-binary output mask"
    vol = np.zeros((number_of_frames, *m2.shape), np.uint8)
    if frame_number == -1:
        pass
    elif frame_number is not None and 0 <= frame_number < number_of_frames:
        vol[frame_number] = m2
    else:
        raise ValueError(
            f"frame_number must be between -1 and {number_of_frames - 1}, "
            f"got {frame_number}.")
    img = MetaImage(vol, spacing=tuple(spacing))
    if reference is not None:
        img.copy_information(reference)
    out = location / filename
    write_mha(out, img, compressed=compressed)
    if verify:
        _verify_written(out, vol)
    return out


def write_output_mha_and_json(out_dir: Path, case: str, mask_2d: np.ndarray,
                              frame_number: int, reference: MetaImage) -> None:
    """Per-case layout of the standalone predict CLI
    (``…stage.py:530-536``): ``<out>/<case>/images/fetal-abdomen-segmentation/
    output.mha`` + ``<out>/<case>/fetal-abdomen-frame-number.json``.  Keeps
    the 1→2 relabel and writes uncompressed, as the reference CLI does.

    ``verify=False`` also matches the reference: the write-then-read-back
    check is a CONTAINER-path behavior (``inference.py:247-254``); the
    reference CLI writes via ``sitk.WriteImage`` with no read-back
    (``…stage.py:504-511``), and re-reading the ~351 MB case volume was
    ~half the remaining per-case host wall after the probe-r43 write-path
    fixes."""
    case_dir = Path(out_dir) / case
    n_frames = reference.size[2] if len(reference.size) >= 3 else 1
    write_segmentation_output(case_dir / "images/fetal-abdomen-segmentation",
                              mask_2d, frame_number, n_frames,
                              reference=reference, binarize=False,
                              compressed=False, verify=False)
    write_json(case_dir / "fetal-abdomen-frame-number.json", int(frame_number),
               indent=2)
