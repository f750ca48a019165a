"""Jitted estimate + iterative-refine inference pipeline.

The reference refines by round-tripping through numpy 4x4 matrices every
iteration (``tools/eval_ycb.py:205-229``, ``tools/eval_linemod.py:91-114``) —
a GPU<->CPU sync per step. Here the whole program (PoseNet forward, argmax-
confidence hypothesis selection, K refinement iterations with on-device
quaternion composition) is ONE compiled XLA graph: refinement is a
``lax.scan`` carrying ``(quat, trans)`` (SURVEY.md §7.1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from densefusion_tpu.geometry import (
    quat_normalize, quat_to_matrix, quat_multiply, quat_rotate,
)


class InferencePipeline:
    """Bundles PoseNet + PoseRefineNet apply functions into jitted
    (batched) pose inference.

    Usage::

        pipe = InferencePipeline(posenet, refiner, refine_iters=2)
        quat, trans, conf = pipe(pose_params, refine_params,
                                 img, points, choose, obj)
    """

    def __init__(self, posenet, refiner=None, refine_iters: int = 0,
                 return_unrefined: bool = False):
        """``return_unrefined=True`` makes calls return
        ``(q0, t0, q, t, conf)`` — the argmax-confidence hypothesis BEFORE
        refinement alongside the refined pose — in ONE compiled program, so
        protocol evals that publish both methods (``tools/eval_ycb.py``'s
        wo_refine + iterative results) cost one device dispatch."""
        self.posenet = posenet
        self.refiner = refiner
        self.refine_iters = refine_iters
        self.return_unrefined = return_unrefined
        if refine_iters > 0 and refiner is None:
            raise ValueError("refine_iters > 0 requires a refiner")
        self._jitted = jax.jit(self._infer)

    def _infer(self, pose_params, refine_params, img, points, choose, obj):
        out = self.posenet.apply(pose_params, img, points, choose, obj)
        q_all = quat_normalize(out["pred_r"])                # (B, N, 4)
        t_all = points + out["pred_t"]                       # (B, N, 3)
        conf = out["pred_c"]                                 # (B, N)
        emb = out["emb"]

        best = jnp.argmax(conf, axis=1)
        take = lambda x: jnp.take_along_axis(
            x, best.reshape((-1,) + (1,) * (x.ndim - 1)), axis=1)[:, 0]
        q0, t0 = take(q_all), take(t_all)
        best_conf = take(conf)

        if self.refine_iters == 0:
            if self.return_unrefined:
                return q0, t0, q0, t0, best_conf
            return q0, t0, best_conf

        def body(carry, _):
            q, t = carry
            # canonicalize the observed cloud into the current pose frame:
            # p' = (p - t) @ R == R^T (p - t)
            R = quat_to_matrix(q)
            new_points = (points - t[:, None, :]) @ R
            res = self.refiner.apply(refine_params, new_points, emb, obj)
            q2 = quat_normalize(res["pred_r"])
            t2 = res["pred_t"]
            # pose composition T <- T @ T2 (tools/eval_ycb.py:221), natively:
            q_next = quat_multiply(q, q2)
            t_next = quat_rotate(q, t2) + t
            return (q_next, t_next), None

        (q, t), _ = jax.lax.scan(body, (q0, t0), None,
                                 length=self.refine_iters)
        if self.return_unrefined:
            return q0, t0, q, t, best_conf
        return q, t, best_conf

    def __call__(self, pose_params, refine_params, img, points, choose, obj):
        return self._jitted(pose_params, refine_params, img, points, choose,
                            obj)
