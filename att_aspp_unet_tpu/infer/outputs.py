"""Challenge output contract writers.

Byte-layout-faithful to the reference container
(``/root/reference/inference.py:208-273`` and
``attention_aspp_unet_pipeline_stage.py:526-536``):

- ``<out>/images/fetal-abdomen-segmentation/<case>.mha``: uint8 volume,
  all-zero except the selected frame, mask relabeled 1→2 (ITK-SNAP green),
  isotropic 0.28 mm spacing (or geometry copied from the reference image),
  zlib-compressed;
- ``<out>/fetal-abdomen-frame-number.json``: the selected frame (−1 when no
  abdomen was found).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ..io import MetaImage, write_json, write_mha


def convert_2d_mask_to_3d(mask_2d: np.ndarray, frame_number: int,
                          number_of_frames: int) -> np.ndarray:
    """Place the (relabeled 1→2) 2-D mask at ``frame_number`` of an otherwise
    zero (N, H, W) uint8 volume; −1 → all zeros; out-of-range → error."""
    m = np.where(np.asarray(mask_2d) > 0, 2, 0).astype(np.uint8)
    vol = np.zeros((number_of_frames, *m.shape), np.uint8)
    if frame_number == -1:
        return vol
    if frame_number is not None and 0 <= frame_number < number_of_frames:
        vol[frame_number] = m
        return vol
    raise ValueError(
        f"frame_number must be between -1 and {number_of_frames - 1}, "
        f"got {frame_number}.")


def write_segmentation_output(location: Path, mask_2d: np.ndarray,
                              frame_number: int, number_of_frames: int,
                              filename: str = "output.mha",
                              spacing: Tuple[float, float, float] = (0.28, 0.28, 0.28),
                              reference: Optional[MetaImage] = None) -> Path:
    """Write the container's segmentation .mha (compressed uint8)."""
    location = Path(location)
    location.mkdir(parents=True, exist_ok=True)
    vol = convert_2d_mask_to_3d(np.squeeze(mask_2d), frame_number,
                                number_of_frames)
    # binarity guarantee of the contract (values ⊆ {0, 2} after relabel)
    assert set(np.unique(vol)).issubset({0, 2}), "non-binary output mask"
    img = MetaImage(vol, spacing=tuple(spacing))
    if reference is not None:
        img.copy_information(reference)
    out = location / filename
    write_mha(out, img, compressed=True)
    return out


def write_output_mha_and_json(out_dir: Path, case: str, mask_2d: np.ndarray,
                              frame_number: int, reference: MetaImage) -> None:
    """Per-case layout of the standalone predict CLI
    (``…stage.py:530-536``): ``<out>/<case>/images/fetal-abdomen-segmentation/
    output.mha`` + ``<out>/<case>/fetal-abdomen-frame-number.json``."""
    case_dir = Path(out_dir) / case
    n_frames = reference.size[2] if len(reference.size) >= 3 else 1
    write_segmentation_output(case_dir / "images/fetal-abdomen-segmentation",
                              mask_2d, frame_number, n_frames,
                              reference=reference)
    write_json(case_dir / "fetal-abdomen-frame-number.json", int(frame_number),
               indent=2)
