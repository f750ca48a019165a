"""Train state and curriculum bookkeeping.

``TrainState`` is the on-device pytree (donated through the jitted step);
``Curriculum`` is host-side python state driving phase decisions — which phase
runs is a *compile-time* property (different step functions), so it must not
live inside the jitted graph. Together with the data cursor they form the
complete restartable state the reference lacks (it checkpoints bare
``state_dict`` only, ``tools/train.py:172-176``; SURVEY.md §5.3-5.4).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array                 # () int32 global optimizer steps
    params_pose: Any
    params_refine: Any
    opt_state: Any                  # optimizer state for the ACTIVE phase
    rng: jax.Array                  # PRNG key (dropout etc.)


@dataclasses.dataclass
class Curriculum:
    """Host-side curriculum flags (``tools/train.py:86-97,219-251``)."""

    epoch: int = 1
    rep_in_epoch: int = 0           # repeat_epoch repetition cursor
    batch_in_epoch: int = 0         # data cursor for mid-epoch resume
    best_test: float = float("inf")
    lr: float = 1e-4
    w: float = 0.015
    decay_started: bool = False
    refine_started: bool = False
    # phase-2 train steps taken so far; distinguishes "gate just flipped,
    # refiner still random-init" checkpoints (refine_started=True,
    # refine_steps=0) from genuinely trained refiners — see
    # checkpoint.refiner_is_trained
    refine_steps: int = 0

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "Curriculum":
        # tolerate unknown keys (checkpoints written by newer versions)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


def make_optimizer(lr: float) -> optax.GradientTransformation:
    """Adam with torch-default betas/eps (``optim.Adam``,
    ``tools/train.py:93,97``)."""
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)


def create_train_state(posenet, refiner, cfg, rng: jax.Array,
                       sample_batch) -> TrainState:
    """Initialize parameters from a sample batch and the phase-1 optimizer.

    Inits run under jit: un-jitted flax init dispatches every op eagerly,
    which on a remote-TPU link costs one RTT per op (minutes for the CNN).
    """
    rng, k1, k2 = jax.random.split(rng, 3)
    img, points, choose, obj = (sample_batch.img, sample_batch.points,
                                sample_batch.choose, sample_batch.obj_idx)
    params_pose = jax.jit(posenet.init)(k1, img, points, choose, obj)
    out = jax.jit(posenet.apply)(params_pose, img, points, choose, obj)
    params_refine = jax.jit(refiner.init)(k2, points, out["emb"], obj)
    tx = make_optimizer(cfg.lr)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params_pose=params_pose,
        params_refine=params_refine,
        opt_state=tx.init(params_pose),
        rng=rng,
    )
