"""SegNet segmentation training (re-design of
``vanilla_segmentation/train.py:24-106``): Adam + per-pixel CE over 22
classes, per-epoch train/test with best-checkpoint selection. BatchNorm
statistics ride in the train state (flax mutable collection)."""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from densefusion_tpu.losses import segmentation_loss


@struct.dataclass
class SegTrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_seg_train_state(segnet, rng, sample_rgb, lr: float = 1e-4):
    variables = segnet.init(rng, sample_rgb, train=False)
    tx = optax.adam(lr)
    return SegTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    ), tx


def _fg_weights(label, fg_weight):
    """Per-pixel CE weights: ``fg_weight`` on foreground (label > 0), 1 on
    background. ``None``/1 keeps the reference's unweighted CE
    (``vanilla_segmentation/loss.py:24-30``); >1 counteracts the extreme
    bg:fg pixel imbalance of small-object frames (e.g. LineMOD-style crops
    where the object covers a few % of the 480x640 frame)."""
    if fg_weight is None or fg_weight == 1:
        return None
    return jnp.where(label > 0, jnp.float32(fg_weight), jnp.float32(1.0))


def make_seg_train_step(segnet, tx, fg_weight: float | None = None):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: SegTrainState, rgb, label):
        def loss_fn(params):
            logits, mutated = segnet.apply(
                {"params": params, "batch_stats": state.batch_stats},
                rgb, train=True, mutable=["batch_stats"])
            return (segmentation_loss(logits, label,
                                      _fg_weights(label, fg_weight)),
                    mutated["batch_stats"])

        (loss, batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=batch_stats,
                             opt_state=opt_state), loss

    return step


def make_seg_eval_step(segnet, fg_weight: float | None = None):
    """Test metrics; ``fg_weight`` applies the same weighting as the train
    step so best-checkpoint selection (by test loss) tracks the trained
    objective."""
    @jax.jit
    def step(params, batch_stats, rgb, label):
        logits = segnet.apply({"params": params, "batch_stats": batch_stats},
                              rgb, train=False)
        loss = segmentation_loss(logits, label, _fg_weights(label, fg_weight))
        pred = jnp.argmax(logits, -1)
        acc = jnp.mean((pred == label).astype(jnp.float32))
        # foreground IoU: pixel accuracy is dominated by background on
        # full frames, so also report |pred∩gt| / |pred∪gt| over the
        # exact-class foreground (the metric that matters for the masks
        # LineModDataset(mode='eval') consumes)
        inter = jnp.sum(((pred == label) & (label > 0)).astype(jnp.float32))
        union = jnp.sum(((pred > 0) | (label > 0)).astype(jnp.float32))
        fg_iou = inter / jnp.maximum(union, 1.0)
        return loss, acc, fg_iou

    return step
