"""Serving API tests: checkpoint -> PoseEstimator -> pose from raw RGB-D, on
the synthetic LineMOD fixture (where gt is exact, so a trained-free model
still validates plumbing: output shapes, unit quat, lost-detection path)."""

import os

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow

from densefusion_tpu.data import generate_linemod_style_dataset, collate
from densefusion_tpu.data.linemod import LineModDataset, _load_image
from densefusion_tpu.geometry.camera import LINEMOD_CAM
from densefusion_tpu.models import PoseNet, PoseRefineNet
from densefusion_tpu.serve import PoseEstimator
from densefusion_tpu.train import create_train_state, save_checkpoint
from densefusion_tpu.train.state import Curriculum
from densefusion_tpu.utils.config import RunConfig


@pytest.fixture(scope="module")
def estimator(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lm_serve"))
    generate_linemod_style_dataset(root, objlist=(1,), n_train=2, n_test=10,
                                   seed=6)
    ds = LineModDataset(root, "train", num_points=64, crop_size=64,
                        num_mesh_points=64, objlist=[1], add_noise=False)
    batch = collate([ds[0]])
    posenet, refiner = PoseNet(num_obj=1), PoseRefineNet(num_obj=1)
    cfg = RunConfig(num_objects=1, num_points=64, crop_size=64)
    state = create_train_state(posenet, refiner, cfg, jax.random.key(0),
                               batch)
    ckpt = str(tmp_path_factory.mktemp("ck") / "ckpt")
    # refine_started=True: the fixture exercises the 2-iteration path (a
    # phase-1 checkpoint would be clamped to 0 by the untrained-refiner
    # guard, tested in test_from_checkpoint_untrained_refiner_guard)
    save_checkpoint(ckpt, state, Curriculum(refine_started=True, refine_steps=1), cfg)
    est = PoseEstimator.from_checkpoint(ckpt, num_obj=1, num_points=64,
                                        crop_size=64, refine_iters=2)
    return est, root


def test_estimate_from_raw_frame(estimator):
    est, root = estimator
    base = os.path.join(root, "data", "01")
    rgb = _load_image(os.path.join(base, "rgb", "0000.png"))
    depth = _load_image(os.path.join(base, "depth", "0000.png"))
    mask = _load_image(os.path.join(base, "mask", "0000.png"))[..., 0] == 255

    def pinhole_mm(cam):
        return cam

    out = est.estimate(rgb, depth, mask, obj_idx=0, intrinsics=LINEMOD_CAM,
                       unit_scale=1e-3)
    assert out is not None
    q, t, c = out
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, rtol=1e-4)
    assert 0.0 < c < 1.0
    assert 0.2 < t[2] < 2.0  # translation near the rendered depth range


def test_estimate_lost_detection(estimator):
    est, _ = estimator
    rgb = np.zeros((480, 640, 3), np.uint8)
    depth = np.zeros((480, 640), np.uint16)
    mask = np.zeros((480, 640), bool)
    assert est.estimate(rgb, depth, mask, 0, LINEMOD_CAM) is None


def test_estimate_batch(estimator):
    est, root = estimator
    base = os.path.join(root, "data", "01")
    samples = []
    for i in range(2):
        rgb = _load_image(os.path.join(base, "rgb", f"{i:04d}.png"))
        depth = _load_image(os.path.join(base, "depth", f"{i:04d}.png"))
        mask = _load_image(os.path.join(base, "mask",
                                        f"{i:04d}.png"))[..., 0] == 255
        samples.append(est.make_sample(rgb, depth, mask, 0, LINEMOD_CAM,
                                       unit_scale=1e-3))
    q, t, c, valid = est.estimate_batch(samples)
    assert q.shape == (2, 4) and t.shape == (2, 3)
    assert valid.all()


def test_estimate_frame(estimator):
    """Whole-frame API: every labeled object becomes one detection in a
    single batch; ids below min_pixels or absent are dropped."""
    est, root = estimator
    base = os.path.join(root, "data", "01")
    rgb = _load_image(os.path.join(base, "rgb", "0000.png"))
    depth = _load_image(os.path.join(base, "depth", "0000.png"))
    mask = _load_image(os.path.join(base, "mask", "0000.png"))[..., 0] == 255
    label = np.where(mask, 1, 0).astype(np.uint8)
    # single-pixel phantom object: must be filtered by min_pixels
    label[0, 0] = 7

    out = est.estimate_frame(rgb, depth, label, LINEMOD_CAM,
                             unit_scale=1e-3,
                             label_to_class=lambda i: 0)
    assert set(out) == {1}
    q, t, c = out[1]
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, rtol=1e-4)
    assert 0.0 < c < 1.0

    assert 0.2 < t[2] < 2.0

    assert est.estimate_frame(rgb, np.zeros_like(depth), label,
                              LINEMOD_CAM) == {}


def test_from_checkpoint_refine_phase(tmp_path, estimator):
    """Serving must load refine-phase checkpoints (params-only restore)."""
    from densefusion_tpu.train.state import make_optimizer
    est, root = estimator
    ds = LineModDataset(root, "train", num_points=64, crop_size=64,
                        num_mesh_points=64, objlist=[1], add_noise=False)
    batch = collate([ds[0]])
    posenet, refiner = PoseNet(num_obj=1), PoseRefineNet(num_obj=1)
    cfg = RunConfig(num_objects=1, num_points=64, crop_size=64)
    state = create_train_state(posenet, refiner, cfg, jax.random.key(1),
                               batch)
    tx = make_optimizer(cfg.lr)
    state = state.replace(opt_state=tx.init(state.params_refine))
    ckpt = str(tmp_path / "refine_ck")
    save_checkpoint(ckpt, state, Curriculum(refine_started=True, refine_steps=1), cfg)
    est2 = PoseEstimator.from_checkpoint(ckpt, num_obj=1, num_points=64,
                                         crop_size=64, refine_iters=2)
    base = os.path.join(root, "data", "01")
    rgb = _load_image(os.path.join(base, "rgb", "0000.png"))
    depth = _load_image(os.path.join(base, "depth", "0000.png"))
    mask = _load_image(os.path.join(base, "mask", "0000.png"))[..., 0] == 255
    out = est2.estimate(rgb, depth, mask, 0, LINEMOD_CAM, unit_scale=1e-3)
    assert out is not None
    q, t, c = out
    np.testing.assert_allclose(np.linalg.norm(q), 1.0, rtol=1e-4)


def test_from_checkpoint_untrained_refiner_guard(tmp_path, estimator):
    """A phase-1 checkpoint bundles a random-init refiner; serving must
    clamp to 0 refinement iterations (with a warning) instead of applying
    it."""
    import warnings as _warnings
    est, root = estimator
    ds = LineModDataset(root, "train", num_points=64, crop_size=64,
                        num_mesh_points=64, objlist=[1], add_noise=False)
    batch = collate([ds[0]])
    posenet, refiner = PoseNet(num_obj=1), PoseRefineNet(num_obj=1)
    cfg = RunConfig(num_objects=1, num_points=64, crop_size=64)
    state = create_train_state(posenet, refiner, cfg, jax.random.key(1),
                               batch)
    ckpt = str(tmp_path / "phase1_ck")
    save_checkpoint(ckpt, state, Curriculum(), cfg)
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        est2 = PoseEstimator.from_checkpoint(ckpt, num_obj=1, num_points=64,
                                             crop_size=64, refine_iters=2)
    assert any("untrained" in str(w.message) for w in rec)
    assert est2.pipeline.refine_iters == 0


def test_estimate_batch_mesh_sharded(estimator):
    """mesh= shards serving batches over the 8-device CPU mesh; a
    non-divisible batch is padded with invalid samples and results match
    the single-device path."""
    from densefusion_tpu.parallel import make_mesh

    est, root = estimator
    ds = LineModDataset(root, "test", num_points=64, crop_size=64,
                        num_mesh_points=64, objlist=[1], add_noise=False)
    samples = [ds[i] for i in range(min(5, len(ds)))]

    est_mesh = PoseEstimator(est.posenet, est.refiner, est.params_pose,
                             est.params_refine, num_points=64, crop_size=64,
                             refine_iters=2, mesh=make_mesh())
    q1, t1, c1, v1 = est.estimate_batch(samples)
    q2, t2, c2, v2 = est_mesh.estimate_batch(samples)
    assert q2.shape == (len(samples), 4)
    np.testing.assert_allclose(q2, q1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(t2, t1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(c2, c1, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(v2, v1)
