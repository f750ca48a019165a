"""Evaluation: metrics toolbox (ADD / ADD-S / VOCap AUC / <2cm / success
rates) and the jitted estimate+refine inference pipeline.

The Python metrics replace the reference's offline MATLAB toolbox
(``replace_ycb_toolbox/*.m``) so the full YCB protocol is reproducible
in-repo (SURVEY.md §7.1); the pipeline replaces the per-iteration GPU<->CPU
quaternion round-trips of ``tools/eval_ycb.py:205-229`` with one on-device
``lax.scan``.
"""

from densefusion_tpu.eval.metrics import (
    add_distance, adds_distance, adi_distance, pose_distances, vocap_auc,
    accuracy_under_threshold, success_rate, rotation_error_deg,
    translation_error,
)
from densefusion_tpu.eval.pipeline import InferencePipeline
from densefusion_tpu.eval.bucketed import ShapeBucketedDispatcher
from densefusion_tpu.eval.ycb_toolbox import (
    KeyframeResults, score_keyframes, summarize, plot_accuracy,
)

__all__ = [
    "add_distance", "adds_distance", "adi_distance", "pose_distances",
    "vocap_auc", "accuracy_under_threshold", "success_rate",
    "rotation_error_deg", "translation_error", "InferencePipeline",
    "ShapeBucketedDispatcher",
    "KeyframeResults", "score_keyframes", "summarize", "plot_accuracy",
]
