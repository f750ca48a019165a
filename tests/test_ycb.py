"""YCB-Video reader tests on synthetic multi-object YCB-format scenes:
sample schema, geometric consistency, augmentation paths (background
compositing / front paste / gaussian noise), PoseCNN-driven eval dataset,
segmentation dataset."""

import os

import numpy as np
import pytest

from densefusion_tpu.data import YCBDataset, SegDataset, collate
from densefusion_tpu.data.ycb import YCBPoseCNNEvalDataset, YCB_SYM
from densefusion_tpu.data.synthetic import generate_ycb_style_dataset


@pytest.fixture(scope="module")
def ycb_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ycb_synth"))
    posecnn = os.path.join(root, "posecnn_results")
    generate_ycb_style_dataset(root, n_classes=3, n_real=4, n_syn=2,
                               n_test=3, seed=7, posecnn_dir=posecnn)
    return root, posecnn


def test_ycb_train_sample_schema(ycb_root):
    root, _ = ycb_root
    ds = YCBDataset(root, mode="train", num_points=200, crop_size=96)
    assert len(ds) == 6  # 4 real + 2 syn
    s = ds[0]
    assert s.valid
    assert s.points.shape == (200, 3)
    assert s.img.shape == (96, 96, 3)
    assert s.target.shape == (500, 3)
    assert 0 <= int(s.obj_idx) < 3
    assert bool(s.sym) == (int(s.obj_idx) in YCB_SYM)


def test_ycb_geometric_consistency(ycb_root):
    root, _ = ycb_root
    ds = YCBDataset(root, mode="test", num_points=200, crop_size=96,
                    add_noise=False)
    for i in range(len(ds)):
        s = ds[i]
        assert s.valid
        d = np.linalg.norm(s.points[:, None] - s.target[None], axis=-1).min(1)
        assert d.mean() < 0.006, f"sample {i}: {d.mean():.4f} m"


def test_ycb_synthetic_frame_augmentation_runs(ycb_root):
    """data_syn frames exercise background compositing + front paste +
    gaussian pixel noise (dataset.py:114-167 equivalents)."""
    root, _ = ycb_root
    ds = YCBDataset(root, mode="train", num_points=200, crop_size=96, seed=3)
    syn_indices = [i for i, fr in enumerate(ds.frames)
                   if not fr.startswith("data/")]
    assert syn_indices
    s = ds[syn_indices[0]]
    assert s.valid
    assert np.isfinite(s.img).all()


def test_ycb_refine_mesh_points(ycb_root):
    root, _ = ycb_root
    ds = YCBDataset(root, mode="train", num_points=100, crop_size=96,
                    refine=True)
    s = ds[0]
    assert s.model_points.shape == (2600, 3)  # dataset.py:91


def test_ycb_posecnn_eval_dataset(ycb_root):
    root, posecnn = ycb_root
    ds = YCBPoseCNNEvalDataset(root, posecnn, num_points=200, crop_size=96,
                               num_keyframes=3)
    assert len(ds) == 3
    dets = ds.detections(0)
    assert len(dets) >= 1
    for sample, frame_idx, itemid in dets:
        assert frame_idx == 0
        assert 1 <= itemid <= 3
        if sample.valid:
            d = np.linalg.norm(sample.points[:, None] - sample.target[None],
                               axis=-1).min(1)
            assert d.mean() < 0.006


def test_seg_dataset(ycb_root):
    root, _ = ycb_root
    ds = SegDataset(root, mode="train", seed=1)
    s = ds[0]
    assert s.rgb.shape == (480, 640, 3)
    assert s.label.shape == (480, 640)
    assert s.label.max() <= 3
    ds_test = SegDataset(root, mode="test")
    s2 = ds_test[0]
    assert np.isfinite(s2.rgb).all()
