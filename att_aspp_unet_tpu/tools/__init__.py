"""Dataset tooling: .mha→PNG builder, train/val split, leak checker."""

from .convert import (NegativeRule, PositiveRule, build_png_dataset,  # noqa: F401
                      convert_frames_with_negatives, window_to_u8)
from .split import split_train_val  # noqa: F401
from .leak_check import check_split_leak  # noqa: F401
