"""Dense pose-hypothesis losses (ADD / ADD-S) with confidence self-calibration.

Re-design of ``lib/loss.py:13-82`` and ``lib/loss_refiner.py:12-74``:

* Every per-point hypothesis ``(q_i, t_offset_i, c_i)`` transforms the model
  points; its distance to the ground-truth-posed target is averaged over mesh
  points (ADD). The per-point translation is an OFFSET from the observed 3D
  point: ``t_i = points_i + pred_t_i`` (``lib/loss.py:38``).
* For symmetric objects the target is remapped per predicted point to its
  nearest target point before the distance (ADD-S) — the CORRECTED semantics
  of the reference's broken ``nn_distance`` call (SURVEY.md §2.1): nearest
  target per predicted point, exactly as its CUDA-KNN eval path
  (``tools/eval_linemod.py:123-128``). Both branches run through the fused
  :func:`densefusion_tpu.ops.add_dist.hypothesis_mean_dist` (per-sample
  sym gating in-kernel, so one compiled program covers mixed batches, and
  the (B, N, M, 3) transformed-cloud tensor never exists in HBM).
* Confidence self-calibration: ``loss = mean(dis·c − w·log c)``
  (``lib/loss.py:50``).
* The best (argmax-confidence) hypothesis canonicalizes the observed cloud and
  target into the predicted pose frame for the refiner, stop-gradiented
  (``lib/loss.py:54-70``).

Everything is batched (B samples) — the reference computes bs=1 only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from densefusion_tpu.geometry import quat_normalize, quat_to_matrix
from densefusion_tpu.ops.add_dist import hypothesis_mean_dist


class PoseLossOutput(NamedTuple):
    loss: jax.Array          # scalar — optimize this
    dis: jax.Array           # (B,) distance of the argmax-confidence hypothesis
    new_points: jax.Array    # (B, N, 3) cloud in predicted-pose frame (stopgrad)
    new_target: jax.Array    # (B, M, 3) target in predicted-pose frame (stopgrad)
    best_r: jax.Array        # (B, 4) best hypothesis quaternion (normalized)
    best_t: jax.Array        # (B, 3) best hypothesis translation (absolute)


class RefinerLossOutput(NamedTuple):
    loss: jax.Array          # scalar mean distance — optimize this
    dis: jax.Array           # (B,) per-sample distance
    new_points: jax.Array    # (B, N, 3) further-canonicalized cloud (stopgrad)
    new_target: jax.Array    # (B, M, 3) further-canonicalized target (stopgrad)


def pose_loss(pred_r: jax.Array, pred_t: jax.Array, pred_c: jax.Array,
              target: jax.Array, model_points: jax.Array, points: jax.Array,
              sym: jax.Array, w: jax.Array, *, use_adds: bool = True,
              knn_backend: str = "auto",
              sample_weight: jax.Array | None = None,
              pred_c_logit: jax.Array | None = None) -> PoseLossOutput:
    """Dense per-point-hypothesis ADD(-S) loss (``loss_calculation``,
    ``lib/loss.py:13-70``).

    Args:
      pred_r: (B, N, 4) unnormalized quaternions per point.
      pred_t: (B, N, 3) translation offsets from the observed points.
      pred_c: (B, N) confidences in (0, 1).
      target: (B, M, 3) ground-truth-posed model points.
      model_points: (B, M, 3) canonical model points.
      points: (B, N, 3) observed cloud.
      sym: (B,) bool — symmetric-object flag per sample.
      w: confidence regularization weight (``opt.w``; 0.015 default).
      use_adds: statically disable the ADD-S branch (e.g. the refine-phase
        main loss never remaps, ``lib/loss.py:40``; datasets with an empty
        sym_list skip the KNN entirely).
      sample_weight: optional (B,) weights (e.g. the batch ``valid`` mask —
        lost detections contribute zero loss but keep static shapes).
      pred_c_logit: optional (B, N) raw confidence logits. When given, the
        ``-w·log c`` barrier is computed as ``-w·log_sigmoid(logit)`` whose
        gradient (1 - c) never saturates — computing it through the sigmoid
        probability underflows for collapsed confidences and silently kills
        the pose gradient.
    """
    q = quat_normalize(pred_r)
    R = quat_to_matrix(q)                                     # (B, N, 3, 3)
    t = points + pred_t                                       # (B, N, 3) absolute
    # mean_m ‖R_n model_m + t_n − tgt(m)‖ per hypothesis, fully fused —
    # the (B, N, M, 3) transformed cloud never exists in HBM and the ADD-S
    # remap runs in-kernel only for symmetric rows (lib/loss.py:33-48
    # semantics; see densefusion_tpu.ops.add_dist)
    dis = hypothesis_mean_dist(R, t, model_points, target, sym,
                               use_adds=use_adds, backend=knn_backend)
    if pred_c_logit is not None:
        log_c = jax.nn.log_sigmoid(pred_c_logit)
    else:
        log_c = jnp.log(jnp.maximum(pred_c, 1e-38))
    per_point = dis * pred_c - w * log_c
    if sample_weight is None:
        loss = jnp.mean(per_point)
    else:
        sw = sample_weight.astype(per_point.dtype)
        loss = jnp.sum(per_point.mean(axis=1) * sw) / jnp.maximum(sw.sum(), 1.0)

    best = jnp.argmax(pred_c, axis=1)                         # (B,)
    take = lambda x: jnp.take_along_axis(
        x, best.reshape((-1,) + (1,) * (x.ndim - 1)), axis=1)[:, 0]
    best_r, best_t, best_R = take(q), take(t), take(R)
    best_dis = take(dis)

    # Canonicalize for the refiner: p' = (p − t*) @ R*  (lib/loss.py:58-67).
    new_points = (points - best_t[:, None, :]) @ best_R
    new_target = (target - best_t[:, None, :]) @ best_R
    return PoseLossOutput(
        loss=loss,
        dis=best_dis,
        new_points=jax.lax.stop_gradient(new_points),
        new_target=jax.lax.stop_gradient(new_target),
        best_r=jax.lax.stop_gradient(best_r),
        best_t=jax.lax.stop_gradient(best_t),
    )


def refiner_loss(pred_r: jax.Array, pred_t: jax.Array, target: jax.Array,
                 model_points: jax.Array, points: jax.Array, sym: jax.Array,
                 *, use_adds: bool = True, knn_backend: str = "auto",
                 sample_weight: jax.Array | None = None) -> RefinerLossOutput:
    """Residual-pose refinement loss (``lib/loss_refiner.py:12-62``): a single
    hypothesis per sample, ADD(-S) distance without the confidence term
    (the ADD-S remap stays active here, unlike the main loss in refine phase),
    plus the next canonicalization of (points, target) by the residual pose.

    Args:
      pred_r: (B, 4), pred_t: (B, 3) residual pose in the current canonical
        frame. target/points arrive already canonicalized by the previous
        stage (``new_target``/``new_points``).
    """
    q = quat_normalize(pred_r)
    R = quat_to_matrix(q)                                     # (B, 3, 3)
    dis = hypothesis_mean_dist(R[:, None], pred_t[:, None], model_points,
                               target, sym, use_adds=use_adds,
                               backend=knn_backend)[:, 0]     # (B,)
    if sample_weight is None:
        loss = jnp.mean(dis)
    else:
        sw = sample_weight.astype(dis.dtype)
        loss = jnp.sum(dis * sw) / jnp.maximum(sw.sum(), 1.0)

    new_points = (points - pred_t[:, None, :]) @ R
    new_target = (target - pred_t[:, None, :]) @ R
    return RefinerLossOutput(
        loss=loss,
        dis=dis,
        new_points=jax.lax.stop_gradient(new_points),
        new_target=jax.lax.stop_gradient(new_target),
    )
