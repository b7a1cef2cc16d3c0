"""Train/val splitter.

``/root/reference/split_image.py`` capability: shuffle ``<raw>/{images,masks}``
pairs with a fixed seed and copy them into ``<out>/{train,val}/{images,masks}``
at the given fraction (reference: seed 42, 80/20).
"""

from __future__ import annotations

import random
import shutil
from pathlib import Path
from typing import Dict, List


def split_train_val(raw_root, out_root, train_frac: float = 0.8,
                    seed: int = 42, log=print) -> Dict[str, List[Path]]:
    raw_root, out_root = Path(raw_root), Path(out_root)
    img_dir, mask_dir = raw_root / "images", raw_root / "masks"

    images = sorted(img_dir.glob("*"))
    rng = random.Random(seed)
    rng.shuffle(images)
    split_idx = int(train_frac * len(images))
    splits = {"train": images[:split_idx], "val": images[split_idx:]}

    for split_name in splits:
        for sub in ("images", "masks"):
            (out_root / split_name / sub).mkdir(parents=True, exist_ok=True)

    for split_name, split_imgs in splits.items():
        for img_path in split_imgs:
            mask_path = mask_dir / img_path.name
            shutil.copy(img_path, out_root / split_name / "images" / img_path.name)
            if mask_path.exists():
                shutil.copy(mask_path, out_root / split_name / "masks" / mask_path.name)

    log(f"Train: {len(splits['train'])}  Val: {len(splits['val'])}")
    return splits
