"""Dataset tooling: .mha→PNG builder, train/val split, leak checker."""

from .convert import convert_frames_with_negatives, normalize_slice_to_u8  # noqa: F401
from .split import split_train_val  # noqa: F401
from .leak_check import check_split_leak  # noqa: F401
