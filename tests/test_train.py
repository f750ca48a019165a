"""End-to-end training tests on the synthetic LineMOD-format fixture: one
full epoch of each curriculum phase on tiny shapes, checkpoint save/resume
round-trip, eval-step sanity (SURVEY.md §4 integration tier)."""

import os

import numpy as np
import jax
import pytest

from densefusion_tpu.data import generate_linemod_style_dataset
from densefusion_tpu.models import PoseNet, PoseRefineNet
from densefusion_tpu.train import Trainer, save_checkpoint, load_checkpoint
from densefusion_tpu.utils.config import RunConfig


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lm_train"))
    generate_linemod_style_dataset(root, objlist=(1,), n_train=4, n_test=20,
                                   seed=9)
    out = str(tmp_path_factory.mktemp("out"))
    return RunConfig(
        dataset="linemod", dataset_root=root, num_objects=1, num_points=64,
        num_mesh_points=64, refine_mesh_points=64, crop_size=64,
        batch_size=2, num_workers=1, repeat_epoch=1, nepoch=1,
        refine_iters=2, out_dir=out, log_dir=os.path.join(out, "logs"),
        sym_list=(), seed=0, knn_backend="xla", checkpoint_every_steps=10**9,
    )


@pytest.fixture(scope="module")
def trainer(tiny_cfg):
    def factory(cfg, mode, refine):
        from densefusion_tpu.data import LineModDataset
        return LineModDataset(
            root=cfg.dataset_root, mode=mode, num_points=cfg.num_points,
            crop_size=cfg.crop_size, refine=refine, seed=cfg.seed,
            num_mesh_points=cfg.num_mesh_points, objlist=[1],
            add_noise=(mode == "train"), noise_trans=cfg.noise_trans)

    tr = Trainer(tiny_cfg, posenet=PoseNet(num_obj=1),
                 refiner=PoseRefineNet(num_obj=1), dataset_factory=factory)
    tr.setup()
    return tr


def test_build_dataset_objlist_subset(tiny_cfg):
    """cfg.objlist restricts the default dataset factory to a subset with
    per-subset symmetric positions (train CLI --objlist path)."""
    import dataclasses
    from densefusion_tpu.train.loop import build_dataset

    cfg = dataclasses.replace(tiny_cfg, objlist=(1,), num_objects=1)
    ds = build_dataset(cfg, "train", refine=False)
    assert ds.objlist == [1]
    assert ds.sym_list == []  # no eggbox/glue in the subset
    assert len(ds) == 4
    # config JSON round-trips the tuple
    back = RunConfig.from_json(cfg.to_json())
    assert back.objlist == (1,)


def test_pose_phase_epoch_runs(trainer):
    avg = trainer.train_epoch()
    assert np.isfinite(avg) and avg > 0
    assert int(trainer.state.step) == 2  # 4 samples / batch 2


def test_eval_step_and_test_epoch(trainer):
    avg = trainer.test_epoch()
    assert np.isfinite(avg) and avg > 0


def test_loss_decreases_over_steps(trainer):
    """A few more epochs on 4 samples should overfit downwards."""
    first = trainer.train_epoch()
    for _ in range(3):
        last = trainer.train_epoch()
    assert np.isfinite(last)
    assert last < first * 1.5  # loose: not diverging


def test_checkpoint_roundtrip(trainer, tiny_cfg):
    path = os.path.join(tiny_cfg.out_dir, "checkpoint_test")
    save_checkpoint(path, trainer.state, trainer.curriculum, tiny_cfg)
    state2, cur2, cfg_json = load_checkpoint(path, trainer.state)
    assert cur2.epoch == trainer.curriculum.epoch
    assert cfg_json is not None
    for a, b in zip(jax.tree.leaves(trainer.state.params_pose),
                    jax.tree.leaves(state2.params_pose)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_refine_phase_epoch_runs(trainer):
    """Force the curriculum into phase 2 and run an epoch + test epoch."""
    trainer.curriculum.refine_started = True
    trainer._build_data(refine=True)
    trainer._rebuild_steps(reset_opt=True)
    before = jax.tree.leaves(trainer.state.params_refine)[0].copy()
    avg = trainer.train_epoch()
    assert np.isfinite(avg)
    after = jax.tree.leaves(trainer.state.params_refine)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # pose params frozen in phase 2
    avg_test = trainer.test_epoch()
    assert np.isfinite(avg_test)


def test_refine_phase_freezes_posenet(trainer):
    # self-sufficient phase-2 setup: under pytest-xdist the module's tests
    # may not share one worker's fixture history, so don't rely on
    # test_refine_phase_epoch_runs having flipped the curriculum already
    if not trainer.curriculum.refine_started:
        trainer.curriculum.refine_started = True
        trainer._build_data(refine=True)
        trainer._rebuild_steps(reset_opt=True)
    pose_before = [np.asarray(x).copy()
                   for x in jax.tree.leaves(trainer.state.params_pose)]
    trainer.train_epoch()
    pose_after = jax.tree.leaves(trainer.state.params_pose)
    for a, b in zip(pose_before, pose_after):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_stop_file_graceful_stop(tiny_cfg, tmp_path):
    """`touch <out_dir>/STOP` ends run() at the next epoch boundary with a
    resumable checkpoint_current saved (operator/preemption control)."""
    import dataclasses
    from densefusion_tpu.train import Trainer

    cfg = dataclasses.replace(tiny_cfg, nepoch=3, objlist=(1,),
                              out_dir=str(tmp_path),
                              log_dir=str(tmp_path / "logs"))
    tr = Trainer(cfg, posenet=PoseNet(num_obj=1),
                 refiner=PoseRefineNet(num_obj=1))
    tr.setup()
    open(os.path.join(cfg.out_dir, "STOP"), "w").close()
    tr.run()
    # stopped after epoch 1 of 3, with the resume checkpoint on disk
    assert tr.curriculum.epoch == 2
    assert os.path.isdir(os.path.join(cfg.out_dir, "checkpoint_current"))


def test_rss_restart_guard(tiny_cfg, tmp_path):
    """With rss_restart_gb set below the process's real RSS, run() stops at
    the first epoch boundary with restart_requested and a resumable
    checkpoint_current — the leak guard for multi-hour runs on transports
    that retain per-dispatch host buffers (cli.train exec-restarts on the
    flag). The STOP file also consumes correctly alongside it."""
    import dataclasses
    from densefusion_tpu.train import Trainer

    cfg = dataclasses.replace(tiny_cfg, nepoch=3, objlist=(1,),
                              rss_restart_gb=0.001,
                              out_dir=str(tmp_path),
                              log_dir=str(tmp_path / "logs"))
    tr = Trainer(cfg, posenet=PoseNet(num_obj=1),
                 refiner=PoseRefineNet(num_obj=1))
    tr.setup()
    tr.run()
    assert tr.restart_requested is True
    assert tr.curriculum.epoch == 2  # stopped after epoch 1 of 3
    assert os.path.isdir(os.path.join(cfg.out_dir, "checkpoint_current"))

    # a resume from that checkpoint picks up at epoch 2 (restart loop
    # converges instead of replaying epoch 1 forever)
    tr2 = Trainer(dataclasses.replace(cfg, rss_restart_gb=0.0),
                  posenet=PoseNet(num_obj=1),
                  refiner=PoseRefineNet(num_obj=1))
    tr2.setup(resume=os.path.join(cfg.out_dir, "checkpoint_current"))
    assert tr2.curriculum.epoch == 2
    assert tr2.restart_requested is False
