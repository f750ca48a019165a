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
    loss, acc, fg_iou = eval_step(state.params, state.batch_stats, rgb, label)
    assert np.isfinite(float(loss))
    assert 0.0 <= float(acc) <= 1.0
    assert 0.0 <= float(fg_iou) <= 1.0


def test_seg_eval_fg_iou_semantics():
    """fg_iou = |pred∩gt|/|pred∪gt| over exact-class foreground, computed on
    a hand-built logits/label pair via a stub module."""
    import flax.linen as nn

    class Stub(nn.Module):
        logits: np.ndarray

        @nn.compact
        def __call__(self, x, train=False):
            self.param("dummy", nn.initializers.zeros, (1,))
            return jnp.asarray(self.logits)

    # 1x2x2 frame, 3 classes: pred = [[1, 0], [2, 2]], gt = [[1, 0], [2, 1]]
    logits = np.zeros((1, 2, 2, 3), np.float32)
    for (y, x), c in {(0, 0): 1, (0, 1): 0, (1, 0): 2, (1, 1): 2}.items():
        logits[0, y, x, c] = 1.0
    label = jnp.asarray([[[1, 0], [2, 1]]], jnp.int32)
    stub = Stub(logits)
    variables = stub.init(jax.random.key(0), jnp.zeros((1, 2, 2, 3)))
    step = make_seg_eval_step(stub)
    _, acc, fg_iou = step(variables["params"], {}, jnp.zeros((1, 2, 2, 3)),
                          label)
    # matches: 3/4 pixels; fg intersection {(0,0),(1,0)}=2, union (pred>0 |
    # gt>0) = 3 pixels
    assert float(acc) == 0.75
    assert float(fg_iou) == pytest.approx(2.0 / 3.0)


def test_seg_fg_weighted_step_matches_manual(seg_setup):
    """fg_weight routes a per-pixel weighted CE through the train/eval
    steps: the eval loss equals the manually weighted segmentation_loss,
    and fg_weight=1 reproduces the unweighted reference objective."""
    from densefusion_tpu.losses import segmentation_loss

    segnet, state, tx, rgb, label = seg_setup
    eval_w = make_seg_eval_step(segnet, fg_weight=7.0)
    loss_w, _, _ = eval_w(state.params, state.batch_stats, rgb, label)
    logits = segnet.apply({"params": state.params,
                           "batch_stats": state.batch_stats},
                          rgb, train=False)
    w = jnp.where(label > 0, 7.0, 1.0)
    want = segmentation_loss(logits, label, weights=w)
    np.testing.assert_allclose(float(loss_w), float(want), rtol=1e-6)

    eval_1 = make_seg_eval_step(segnet, fg_weight=1.0)
    loss_1, _, _ = eval_1(state.params, state.batch_stats, rgb, label)
    np.testing.assert_allclose(float(loss_1),
                               float(segmentation_loss(logits, label)),
                               rtol=1e-6)

    # weighted train step runs and trains
    step = make_seg_train_step(segnet, tx, fg_weight=7.0)
    state2, first = step(state, rgb, label)
    assert np.isfinite(float(first))


def test_train_seg_recipe_defaults():
    """--format linemod resolves to the measured short-budget recipe
    (lr 5e-4, fg_weight 30, batch 8 — docs/PERF.md round 4); ycb keeps the
    reference's 600-epoch recipe; explicit flags always win."""
    from densefusion_tpu.cli.train_seg import (
        build_parser, resolve_recipe_defaults,
    )

    lm = resolve_recipe_defaults(build_parser().parse_args(
        ["--dataset_root", "/x", "--format", "linemod"]))
    assert (lm.lr, lm.fg_weight, lm.batch_size) == (5e-4, 30.0, 8)

    ycb = resolve_recipe_defaults(build_parser().parse_args(
        ["--dataset_root", "/x"]))
    assert (ycb.lr, ycb.fg_weight, ycb.batch_size) == (1e-4, 1.0, 3)

    explicit = resolve_recipe_defaults(build_parser().parse_args(
        ["--dataset_root", "/x", "--format", "linemod",
         "--lr", "1e-3", "--fg_weight", "2", "--batch_size", "4"]))
    assert (explicit.lr, explicit.fg_weight, explicit.batch_size) == \
        (1e-3, 2.0, 4)


@pytest.mark.slow
def test_train_seg_cli_resume(tmp_path):
    """segnet_latest.msgpack carries params+batch_stats+optimizer+epoch:
    a --resume run continues at the next epoch with best preserved (the
    leak-guard exec-restart in cli.train_seg depends on this)."""
    import json
    import os

    from densefusion_tpu.data import generate_linemod_style_dataset
    from densefusion_tpu.cli import train_seg as train_seg_cli

    root = str(tmp_path / "ds")
    # full-size frames: the generator's pose sampling assumes the LineMOD
    # camera's 640x480 principal point; tiny frames lose the object
    generate_linemod_style_dataset(root, objlist=(1,), n_train=2,
                                   n_test=10, seed=3)
    out = str(tmp_path / "seg")
    log = str(tmp_path / "logs")
    common = ["--dataset_root", root, "--format", "linemod",
              "--objlist", "1", "--batch_size", "2", "--workers", "1",
              "--seed", "0", "--out_dir", out, "--log_dir", log]
    train_seg_cli.main(common + ["--n_epochs", "2"])
    assert os.path.exists(os.path.join(out, "segnet_latest.msgpack"))

    train_seg_cli.main(common + ["--n_epochs", "3", "--resume"])
    with open(os.path.join(log, "metrics.jsonl")) as f:
        rows = [json.loads(ln) for ln in f if ln.strip()]
    epochs = [r["epoch"] for r in rows if r.get("kind") == "seg_epoch"]
    # first run logged 1,2; the resumed run logged ONLY epoch 3
    assert epochs == [1, 2, 3]
