"""Native (ladder-shape) crop eval mode — the reference's exact input
geometry for imported torch weights (``datasets/ycb/dataset.py:247-289``,
``tools/eval_ycb.py:150-163``; SURVEY.md §7.4 flagged the resize option's
parity as unvalidated)."""

import numpy as np
import pytest

from densefusion_tpu.data.schema import PoseSample
from densefusion_tpu.data.common import assemble_sample
from densefusion_tpu.eval.bucketed import ShapeBucketedDispatcher
from densefusion_tpu.geometry.bbox import snap_bbox


def _frame(rng, h=480, w=640):
    rgb = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    depth = (rng.random((h, w)) * 5000 + 1000).astype(np.uint16)
    mask = np.zeros((h, w), bool)
    mask[100:160, 200:290] = True
    return rgb, depth, mask


class _Cam:
    fx = fy = 572.4
    cx, cy = 325.3, 242.0


def _point_fn(depth):
    def fn(rows, cols):
        z = depth[rows, cols].astype(np.float32) / 1000.0
        x = (cols - _Cam.cx) * z / _Cam.fx
        y = (rows - _Cam.cy) * z / _Cam.fy
        return np.stack([x, y, z], -1)
    return fn


def _sample(rng, native):
    rgb, depth, mask = _frame(rng)
    model = rng.standard_normal((64, 3)).astype(np.float32) * 0.03
    return assemble_sample(
        rgb=rgb, mask=mask, bbox=(100, 160, 200, 290),
        point_fn=_point_fn(depth), model_points=model, target=model,
        obj_idx=1, sym=False, num_points=32, crop_size=192,
        rng=rng, native_crop=native)


def test_native_crop_keeps_ladder_shape(rng):
    s = _sample(rng, native=True)
    rmin, rmax, cmin, cmax = snap_bbox(100, 160, 200, 290)
    assert s.img.shape == (rmax - rmin, cmax - cmin, 3)
    # ladder shapes are 40-px multiples (datasets/ycb/dataset.py:247)
    assert s.img.shape[0] % 40 == 0 and s.img.shape[1] % 40 == 0
    # choose indexes the NATIVE crop
    assert s.choose.max() < s.img.shape[0] * s.img.shape[1]

    # the native crop's pixels are the frame's own pixels (no resampling):
    # the resized sample differs, the native one is an exact window
    rgb, _, _ = _frame(np.random.default_rng(rng.bit_generator.state[
        "state"]["state"] % 2**32))


def test_native_vs_resized_same_geometry(rng):
    """Cloud/target/model are resize-independent; only img/choose differ."""
    s_nat = _sample(np.random.default_rng(0), native=True)
    s_res = _sample(np.random.default_rng(0), native=False)
    np.testing.assert_array_equal(s_nat.points, s_res.points)
    np.testing.assert_array_equal(s_nat.target, s_res.target)
    assert s_res.img.shape == (192, 192, 3)
    assert s_nat.img.shape != s_res.img.shape
    # same mask pixel at the same native position: the native choose is the
    # unmapped crop index
    h, w = s_nat.img.shape[:2]
    rows, cols = s_nat.choose // w, s_nat.choose % w
    assert ((rows >= 0) & (rows < h)).all()


def _mk(shape, val, rng):
    return PoseSample(
        points=rng.standard_normal((8, 3)).astype(np.float32),
        choose=np.zeros((8,), np.int32),
        img=np.full(shape + (3,), val, np.float32),
        target=np.zeros((4, 3), np.float32),
        model_points=np.zeros((4, 3), np.float32),
        obj_idx=np.asarray(0, np.int32),
        sym=np.asarray(False),
        valid=np.asarray(True),
    )


def test_shape_bucketed_dispatcher(rng):
    """Every key gets exactly its own sample's result; padding rows are
    dropped; batches are shape-pure."""
    calls = []

    def run(batch):
        calls.append(batch.img.shape)
        assert batch.img.shape[0] == 3  # always padded to batch_size
        return (batch.img.mean(axis=(1, 2, 3)),)

    disp = ShapeBucketedDispatcher(run, batch_size=3)
    shapes = [(40, 40), (80, 40), (40, 40), (40, 40), (80, 40), (120, 80)]
    done = {}
    for i, shp in enumerate(shapes):
        for key, (v,) in disp.add(i, _mk(shp, float(i), rng)):
            done[key] = float(v)
    for key, (v,) in disp.flush_all():
        done[key] = float(v)

    assert set(done) == set(range(len(shapes)))
    for i in range(len(shapes)):
        np.testing.assert_allclose(done[i], float(i))
    # 3x(40,40) flushed full; (80,40) x2 and (120,80) x1 padded at the end
    assert sorted(disp.shapes_dispatched) == [(40, 40), (80, 40), (120, 80)]
    assert len(calls) == 3


@pytest.mark.slow
def test_eval_linemod_native_batch_invariance(tmp_path):
    """The native-crop eval's shape-bucketed dispatch gives identical rates
    at batch size 1 and 4 (padding/bucketing can't change results)."""
    import json
    import jax
    from densefusion_tpu.data import (
        generate_linemod_style_dataset, LineModDataset, collate,
    )
    from densefusion_tpu.models import PoseNet, PoseRefineNet
    from densefusion_tpu.train import create_train_state, save_checkpoint
    from densefusion_tpu.train.state import Curriculum
    from densefusion_tpu.utils.config import RunConfig
    from densefusion_tpu.cli import eval_linemod as eval_linemod_cli

    root = str(tmp_path / "lm")
    generate_linemod_style_dataset(root, objlist=(1, 10), n_train=2,
                                   n_test=3, seed=0)
    ds = LineModDataset(root, mode="eval", num_points=64, crop_size=64,
                        num_mesh_points=64, objlist=[1, 10])
    sample = collate([ds[0]])
    posenet, refiner = PoseNet(num_obj=2), PoseRefineNet(num_obj=2)
    cfg = RunConfig.preset("linemod", num_points=64, crop_size=64)
    state = create_train_state(posenet, refiner, cfg, jax.random.key(0),
                               sample)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, Curriculum(), cfg)

    results = {}
    for bs in (1, 4):
        out = str(tmp_path / f"eval_b{bs}")
        eval_linemod_cli.main([
            "--dataset_root", root, "--checkpoint", ckpt,
            "--iterations", "0", "--num_points", "64", "--num_mesh", "64",
            "--crop_size", "64", "--batch_size", str(bs), "--mode", "eval",
            "--objlist", "1", "10", "--native_crops", "on",
            "--output_dir", out,
        ])
        with open(f"{out}/result.json") as f:
            results[bs] = json.load(f)
    assert results[1]["native_crops"] and results[4]["native_crops"]
    for k in ("rate_per_pixel", "rate_refined", "lost_detections"):
        assert results[1][k] == results[4][k], k
    for a, b in zip(results[1]["per_object"], results[4]["per_object"]):
        assert a == b
