"""Pose-estimation metrics toolbox.

In-repo Python replacement for the reference's MATLAB evaluation
(``replace_ycb_toolbox/evaluate_poses_keyframe.m`` ADD at :160-174, ADD-S via
KD-tree at :176-193; ``plot_accuracy_keyframe.m`` VOCap AUC at :150-170 and
<2cm at :45-54) and the LineMOD success-rate protocol
(``tools/eval_linemod.py:123-145``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from densefusion_tpu.geometry import quat_to_matrix
from densefusion_tpu.ops import adds_remap_targets


def add_distance(pred_points: jax.Array, gt_points: jax.Array) -> jax.Array:
    """ADD: mean distance between corresponding transformed model points
    (..., M, 3) x 2 -> (...,)."""
    return jnp.linalg.norm(pred_points - gt_points, axis=-1).mean(axis=-1)


def adds_distance(pred_points: jax.Array, gt_points: jax.Array,
                  backend: str = "auto") -> jax.Array:
    """ADD-S, LineMOD/CUDA-KNN direction: mean distance from each predicted
    point to its NEAREST gt point (``tools/eval_linemod.py:123-128``)."""
    remapped = adds_remap_targets(pred_points, gt_points, backend=backend)
    return jnp.linalg.norm(pred_points - remapped, axis=-1).mean(axis=-1)


def adi_distance(pred_points: jax.Array, gt_points: jax.Array,
                 backend: str = "auto") -> jax.Array:
    """ADD-S, YCB-toolbox ``adi`` direction: mean distance from each GT point
    to its NEAREST predicted point (KD-tree of estimated points queried with
    gt points, ``evaluate_poses_keyframe.m:176-193``) — the reverse of
    :func:`adds_distance`. Both directions exist in the reference; YCB scoring
    uses this one."""
    remapped = adds_remap_targets(gt_points, pred_points, backend=backend)
    return jnp.linalg.norm(gt_points - remapped, axis=-1).mean(axis=-1)


def rotation_error_deg(R_est: jax.Array, R_gt: jax.Array) -> jax.Array:
    """Angular error in degrees, ``re`` semantics
    (``evaluate_poses_keyframe.m:195-207``): arccos((tr(R_est R_gtᵀ) − 1)/2).
    Batched over leading dims: (..., 3, 3) x 2 -> (...,)."""
    rel = jnp.einsum("...ij,...kj->...ik", R_est, R_gt)  # R_est @ R_gt^-1
    cos = 0.5 * (jnp.trace(rel, axis1=-2, axis2=-1) - 1.0)
    return jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))


def translation_error(t_est: jax.Array, t_gt: jax.Array) -> jax.Array:
    """‖t_gt − t_est‖, ``te`` semantics (``evaluate_poses_keyframe.m:209-217``).
    (..., 3) x 2 -> (...,)."""
    return jnp.linalg.norm(t_gt - t_est, axis=-1)


def pose_distances(model_points: jax.Array, quat: jax.Array, trans: jax.Array,
                   target: jax.Array, sym: jax.Array,
                   backend: str = "auto") -> jax.Array:
    """Batched ADD(-S) of predicted poses: model (B, M, 3), quat (B, 4) wxyz,
    trans (B, 3), target (B, M, 3) gt-posed points, sym (B,) bool choosing
    ADD-S per sample -> (B,) distances."""
    R = quat_to_matrix(quat)
    pred = model_points @ jnp.swapaxes(R, -1, -2) + trans[..., None, :]
    add = add_distance(pred, target)
    adds = adds_distance(pred, target, backend=backend)
    return jnp.where(sym, adds, add)


def vocap_auc(distances: np.ndarray, max_threshold: float = 0.1) -> float:
    """Area under the accuracy-vs-threshold curve, exact MATLAB ``VOCap``
    semantics (``plot_accuracy_keyframe.m:150-170``): distances above
    ``max_threshold`` count as failures; the step integral is scaled by
    ``1/max_threshold`` to [0, 1]."""
    d = np.sort(np.asarray(distances, np.float64))
    n = d.size
    if n == 0:
        return 0.0
    accuracy = np.cumsum(np.ones(n)) / n
    keep = d <= max_threshold  # inf/clipped distances drop out (isfinite)
    d, accuracy = d[keep], accuracy[keep]
    mrec = np.concatenate([[0.0], d, [max_threshold]])
    mpre = np.concatenate([[0.0], accuracy,
                           [accuracy[-1] if accuracy.size else 0.0]])
    np.maximum.accumulate(mpre, out=mpre)
    step = np.flatnonzero(np.diff(mrec)) + 1
    return float(np.sum((mrec[step] - mrec[step - 1]) * mpre[step])
                 / max_threshold)


def accuracy_under_threshold(distances: np.ndarray,
                             threshold: float = 0.02) -> float:
    """Fraction of poses with distance < threshold (the <2cm metric,
    ``plot_accuracy_keyframe.m:45-54``)."""
    d = np.asarray(distances)
    return float((d < threshold).mean()) if d.size else 0.0


def success_rate(distances: np.ndarray, thresholds: np.ndarray) -> float:
    """LineMOD protocol: success when ADD(-S) < per-object threshold
    (0.1·diameter, ``tools/eval_linemod.py:57-62,132``)."""
    d = np.asarray(distances)
    t = np.asarray(thresholds)
    return float((d < t).mean()) if d.size else 0.0
