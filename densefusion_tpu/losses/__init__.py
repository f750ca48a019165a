"""Loss functions: dense ADD(-S) pose-hypothesis loss with confidence
self-calibration, refiner residual loss, segmentation cross-entropy.

Functional re-design of ``lib/loss.py`` / ``lib/loss_refiner.py`` /
``vanilla_segmentation/loss.py`` — pure functions over batched arrays with
``stop_gradient`` replacing ``.detach()``, and the symmetric-object branch as
a per-sample boolean select over the (corrected) KNN target remap instead of a
python-side ``if`` (SURVEY.md §7.1).
"""

from densefusion_tpu.losses.pose_loss import (
    pose_loss, refiner_loss, PoseLossOutput, RefinerLossOutput,
)
from densefusion_tpu.losses.seg_loss import segmentation_loss

__all__ = [
    "pose_loss", "refiner_loss", "segmentation_loss",
    "PoseLossOutput", "RefinerLossOutput",
]
