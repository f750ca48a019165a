"""Jitted train / eval steps for both curriculum phases.

Phase 1 (``tools/train.py:152-161``, estimator training): PoseNet forward,
dense hypothesis loss, Adam update on PoseNet params.

Phase 2 (``tools/train.py:155-159``, refiner training): PoseNet runs frozen
(eval mode), then K refiner iterations each contributing its own loss on
stop-gradiented inputs — summing the per-iteration losses reproduces the
reference's per-iteration ``dis.backward()`` gradient accumulation exactly
(each iteration's loss depends only on the refiner applied to detached
inputs, so grad(sum) == sum of per-step grads).

All steps donate the TrainState buffers and are shardable over a device mesh
(batch-dim sharding via the arguments' shardings; XLA inserts the grad psum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from densefusion_tpu.losses import pose_loss, refiner_loss
from densefusion_tpu.train.state import TrainState


def _unpack(batch):
    return (batch.img, batch.points, batch.choose, batch.obj_idx,
            batch.target, batch.model_points, batch.sym,
            batch.valid.astype(jnp.float32))


def make_pose_train_step(posenet, tx: optax.GradientTransformation,
                         use_adds: bool, knn_backend: str = "auto"):
    """Phase-1 step: (state, batch, w) -> (state, metrics)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, w):
        img, points, choose, obj, target, model_points, sym, valid = \
            _unpack(batch)
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(params):
            out = posenet.apply(params, img, points, choose, obj, train=True,
                                rngs={"dropout": dropout_rng})
            lo = pose_loss(out["pred_r"], out["pred_t"], out["pred_c"],
                           target, model_points, points, sym, w,
                           use_adds=use_adds, knn_backend=knn_backend,
                           sample_weight=valid,
                           pred_c_logit=out.get("pred_c_logit"))
            return lo.loss, lo

        (loss, lo), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params_pose)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params_pose)
        params = optax.apply_updates(state.params_pose, updates)
        new_state = state.replace(
            step=state.step + 1, params_pose=params, opt_state=opt_state,
            rng=rng)
        metrics = {
            "loss": loss,
            "dis": jnp.sum(lo.dis * valid) / jnp.maximum(valid.sum(), 1.0),
        }
        return new_state, metrics

    return step


def make_refine_train_step(posenet, refiner, tx: optax.GradientTransformation,
                           refine_iters: int, knn_backend: str = "auto"):
    """Phase-2 step: frozen PoseNet + K refiner iterations, refiner update."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, w):
        img, points, choose, obj, target, model_points, sym, valid = \
            _unpack(batch)
        rng, _ = jax.random.split(state.rng)

        out = posenet.apply(state.params_pose, img, points, choose, obj,
                            train=False)
        lo = pose_loss(out["pred_r"], out["pred_t"], out["pred_c"],
                       target, model_points, points, sym, w,
                       use_adds=False,  # refine-phase main loss skips ADD-S
                       knn_backend=knn_backend, sample_weight=valid,
                       pred_c_logit=out.get("pred_c_logit"))
        emb = out["emb"]

        def loss_fn(params_refine):
            total = 0.0
            pts, tgt = lo.new_points, lo.new_target
            last_dis = None
            for _ in range(refine_iters):
                res = refiner.apply(params_refine, pts, emb, obj)
                rl = refiner_loss(res["pred_r"], res["pred_t"], tgt,
                                  model_points, pts, sym,
                                  use_adds=True, knn_backend=knn_backend,
                                  sample_weight=valid)
                total = total + rl.loss
                pts, tgt, last_dis = rl.new_points, rl.new_target, rl.dis
            return total, last_dis

        (loss, last_dis), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params_refine)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.params_refine)
        params = optax.apply_updates(state.params_refine, updates)
        new_state = state.replace(
            step=state.step + 1, params_refine=params, opt_state=opt_state,
            rng=rng)
        metrics = {
            "loss": loss,
            "dis": jnp.sum(last_dis * valid) / jnp.maximum(valid.sum(), 1.0),
        }
        return new_state, metrics

    return step


def make_eval_step(posenet, refiner, refine_iters: int, use_adds: bool,
                   knn_backend: str = "auto"):
    """Test-phase distance (``tools/train.py:188-209``): PoseNet + loss (for
    dis/new_points), then refiner iterations when active. Returns per-sample
    distances and validity for host-side averaging."""

    @jax.jit
    def step(params_pose, params_refine, batch, w):
        img, points, choose, obj, target, model_points, sym, valid = \
            _unpack(batch)
        out = posenet.apply(params_pose, img, points, choose, obj,
                            train=False)
        lo = pose_loss(out["pred_r"], out["pred_t"], out["pred_c"],
                       target, model_points, points, sym, w,
                       use_adds=use_adds and refine_iters == 0,
                       knn_backend=knn_backend, sample_weight=valid,
                       pred_c_logit=out.get("pred_c_logit"))
        dis = lo.dis
        pts, tgt = lo.new_points, lo.new_target
        for _ in range(refine_iters):
            res = refiner.apply(params_refine, pts, out["emb"], obj)
            rl = refiner_loss(res["pred_r"], res["pred_t"], tgt,
                              model_points, pts, sym, use_adds=use_adds,
                              knn_backend=knn_backend, sample_weight=valid)
            dis, pts, tgt = rl.dis, rl.new_points, rl.new_target
        return dis, valid

    return step
