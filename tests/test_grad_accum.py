"""Gradient accumulation: optax.MultiSteps-wrapped steps only apply updates
every k micro-steps, and the inspect_sample CLI works on synthetic data."""

import numpy as np
import jax
import pytest

from densefusion_tpu.data import PoseSample
from densefusion_tpu.models import PoseNet, PoseRefineNet
from densefusion_tpu.train import create_train_state, make_pose_train_step
from densefusion_tpu.train.state import make_optimizer
from densefusion_tpu.utils.config import RunConfig


def _batch(b=2, n=16, m=16, crop=32, seed=0):
    r = np.random.default_rng(seed)
    return PoseSample(
        points=r.standard_normal((b, n, 3)).astype(np.float32) * 0.05,
        choose=r.integers(0, crop * crop, (b, n)).astype(np.int32),
        img=r.standard_normal((b, crop, crop, 3)).astype(np.float32),
        target=r.standard_normal((b, m, 3)).astype(np.float32) * 0.05,
        model_points=r.standard_normal((b, m, 3)).astype(np.float32) * 0.05,
        obj_idx=r.integers(0, 2, (b,)).astype(np.int32),
        sym=np.zeros((b,), bool), valid=np.ones((b,), bool),
    )


@pytest.mark.slow
def test_multisteps_applies_every_k():
    import optax
    cfg = RunConfig(num_objects=2, num_points=16, crop_size=32, lr=1e-3)
    posenet, refiner = PoseNet(num_obj=2), PoseRefineNet(num_obj=2)
    batch = _batch()
    state = create_train_state(posenet, refiner, cfg, jax.random.key(0),
                               batch)
    tx = optax.MultiSteps(make_optimizer(1e-3), every_k_schedule=2)
    state = state.replace(opt_state=tx.init(state.params_pose))
    step = make_pose_train_step(posenet, tx, use_adds=False,
                                knn_backend="xla")
    p0 = np.asarray(jax.tree.leaves(state.params_pose)[0]).copy()
    state, _ = step(state, batch, np.float32(0.015))
    p1 = np.asarray(jax.tree.leaves(state.params_pose)[0])
    np.testing.assert_array_equal(p0, p1)  # accumulating, no update yet
    state, _ = step(state, batch, np.float32(0.015))
    p2 = np.asarray(jax.tree.leaves(state.params_pose)[0])
    assert not np.array_equal(p1, p2)  # k=2 reached -> update applied


def test_inspect_sample_cli(tmp_path):
    from densefusion_tpu.data import generate_linemod_style_dataset
    from densefusion_tpu.cli import inspect_sample
    root = str(tmp_path / "lm")
    generate_linemod_style_dataset(root, objlist=(1,), n_train=2, n_test=10,
                                   seed=2)
    import densefusion_tpu.data.linemod as lm

    # restrict to the single generated object
    class DS(lm.LineModDataset):
        def __init__(self, root, **kw):
            kw["objlist"] = [1]
            super().__init__(root, **kw)

    orig = inspect_sample.main.__globals__  # run with objlist=1 via monkeypatch
    import densefusion_tpu.data as data_mod
    saved = data_mod.LineModDataset
    try:
        data_mod.LineModDataset = DS
        d = inspect_sample.main([
            "--dataset", "linemod", "--dataset_root", root,
            "--index", "0", "--num_points", "128",
            "--out_dir", str(tmp_path / "qa"),
        ])
    finally:
        data_mod.LineModDataset = saved
    assert d < 0.005
    assert (tmp_path / "qa" / "depth_projected.ply").exists()
