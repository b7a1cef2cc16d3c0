"""Offline evaluation + analysis suite (reference layer L5).

CSV-compatible with the reference's downstream scripts: ``seg_eval.csv``
columns match ``eval_segmentation_batch.py:152-158``; the AC analyzer
consumes/produces the same ``ac_results.csv`` / ``merged_ac_values.csv``
shapes as ``analyze_ac.py``.
"""

from .seg_metrics import dice, hd95, iou, evaluate_directories, show_metric  # noqa: F401
from .ac_analysis import analyze_ac  # noqa: F401
