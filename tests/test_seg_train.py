"""SegNet training-step tests: loss decreases on a tiny overfit problem,
batch stats update, eval step accuracy metric."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from densefusion_tpu.models import SegNet
from densefusion_tpu.train.seg import (
    create_seg_train_state, make_seg_train_step, make_seg_eval_step,
)


@pytest.fixture()  # function scope: train steps DONATE the state buffers
def seg_setup(rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    segnet = SegNet(num_classes=4)
    rgb = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    # labels correlated with input so it can learn
    label = jnp.asarray((np.asarray(rgb)[..., 0] > 0).astype(np.int32))
    state, tx = create_seg_train_state(segnet, jax.random.key(0), rgb,
                                       lr=1e-3)
    return segnet, state, tx, rgb, label


@pytest.mark.slow
def test_seg_train_loss_decreases(seg_setup):
    segnet, state, tx, rgb, label = seg_setup
    step = make_seg_train_step(segnet, tx)
    state, first = step(state, rgb, label)
    for _ in range(14):
        state, loss = step(state, rgb, label)
    assert float(loss) < float(first)


def test_seg_batch_stats_update(seg_setup):
    segnet, state, tx, rgb, label = seg_setup
    step = make_seg_train_step(segnet, tx)
    before = jax.tree.leaves(state.batch_stats)[0].copy()
    state, _ = step(state, rgb, label)
    after = jax.tree.leaves(state.batch_stats)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_seg_eval_step(seg_setup):
    segnet, state, tx, rgb, label = seg_setup
    eval_step = make_seg_eval_step(segnet)
    loss, acc = eval_step(state.params, state.batch_stats, rgb, label)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(acc) <= 1.0
