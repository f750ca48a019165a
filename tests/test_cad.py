"""customCAD reader tests on a synthetic Unity-format dataset: z-buffer
decode + ray-map unprojection consistency, pose decode (left-handed quats +
y-180 fixup), sample schema."""

import os
import numpy as np
import pytest

from densefusion_tpu.data.cad import CADDataset, UnityDepthRayMap
from densefusion_tpu.data.synthetic import generate_cad_style_dataset

DIMS = (260, 554)


@pytest.fixture(scope="module")
def cad_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cad_synth"))
    generate_cad_style_dataset(root, n_train=3, n_test=20, img_h=DIMS[0],
                               img_w=DIMS[1], seed=11)
    return root


def test_cad_sample_schema(cad_root):
    ds = CADDataset(cad_root, mode="train", num_points=256, crop_size=96,
                    num_mesh_points=256, image_dims=DIMS, add_noise=False)
    assert len(ds) == 3
    s = ds[0]
    assert s.valid
    assert s.points.shape == (256, 3)
    assert s.img.shape == (96, 96, 3)
    assert s.target.shape == (256, 3)
    assert not s.sym


def test_cad_geometric_consistency(cad_root):
    """Unprojected cloud must land on the gt-posed model: the full Unity
    z-buffer + ray-map + transforms.txt decode chain is consistent."""
    ds = CADDataset(cad_root, mode="train", num_points=256, crop_size=96,
                    num_mesh_points=512, image_dims=DIMS, add_noise=False)
    for i in range(3):
        s = ds[i]
        d = np.linalg.norm(s.points[:, None] - s.target[None], axis=-1).min(1)
        # splat + z-buffer + raymap half-pixel quantization at ~1 m depth
        # gives ~4-6 mm mean NN error
        assert d.mean() < 0.008, f"sample {i}: mean NN {d.mean():.4f} m"
        assert 0.5 < s.points[:, 2].mean() < 1.1  # z range of the renderer


def test_cad_test_split_subsampled(cad_root):
    ds = CADDataset(cad_root, mode="test", num_points=128, crop_size=64,
                    image_dims=DIMS)
    assert len(ds) == 2  # 20 test frames / 10


def test_raymap_linearize_roundtrip(cad_root):
    import os
    rm = UnityDepthRayMap.from_file(
        os.path.join(cad_root, "data", "01", "meta", "proj_mat.txt"), DIMS)
    z = np.array([2000.0, 7000.0, 15000.0])
    dval = -rm.proj_mat[2, 3] / z - rm.proj_mat[2, 2]
    png = np.round((1.0 - dval) * 65534.0).astype(np.uint16)
    z_back = rm.linearize(png)
    np.testing.assert_allclose(z_back, z, rtol=1e-3)


def test_cad_prep_tools_regenerate_masks_and_split(tmp_path):
    """Standalone prep CLIs (mask_generator/train_test_generator parity):
    wipe the generated masks + split files, regenerate them with cad_prep,
    and check the dataset still loads valid samples."""
    import shutil
    from densefusion_tpu.cli import cad_prep
    from densefusion_tpu.data.cad import CADDataset

    root = str(tmp_path / "cad")
    generate_cad_style_dataset(root, n_train=3, n_test=2, seed=1)
    base = os.path.join(root, "data", "01")
    shutil.rmtree(os.path.join(base, "mask"))
    os.remove(os.path.join(base, "train.txt"))
    os.remove(os.path.join(base, "test.txt"))

    n = cad_prep.main(["masks", "--root", root])
    assert n == 5
    split = cad_prep.main(["split", "--root", root,
                           "--train_percent", "60", "--seed", "3"])
    assert split["01"] == (3, 2)
    ds = CADDataset(root, mode="train", add_noise=False,
                    image_dims=(260, 554))
    assert len(ds) == 3
    s = ds[0]
    assert bool(s.valid)
    d = np.linalg.norm(s.points[:, None] - s.target[None], axis=-1).min(1)
    assert d.mean() < 0.01


def test_cad_hole_augmentation(tmp_path):
    """cad_to_dataset.py:137-164 parity: radius-hole deletion drops points
    but every remaining depth pixel still backprojects onto the target."""
    from densefusion_tpu.data.synthetic import delete_point_holes
    from densefusion_tpu.data.cad import CADDataset

    rng = np.random.default_rng(5)
    pts = rng.uniform(-0.05, 0.05, (5000, 3))
    keeps = [delete_point_holes(pts, np.random.default_rng(s))
             for s in range(8)]
    assert any(k.sum() < len(pts) for k in keeps)  # some seed carves a hole
    assert all(k.any() for k in keeps)

    root = str(tmp_path / "cad")
    generate_cad_style_dataset(root, n_train=3, n_test=2, seed=2,
                               hole_augment=True)
    ds = CADDataset(root, mode="train", add_noise=False,
                    image_dims=(260, 554))
    ok = 0
    for i in range(len(ds)):
        s = ds[i]
        if not bool(s.valid):
            continue
        d = np.linalg.norm(s.points[:, None] - s.target[None], axis=-1).min(1)
        assert d.mean() < 0.01
        ok += 1
    assert ok >= 2
