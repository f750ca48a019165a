"""FallingThings support tests: format decode + the geometric verification
check on an exact-ground-truth synthetic FAT scene (the reference's QA
mechanism, datasets/FallingThings/README.md:1-9)."""

import numpy as np
import pytest

from densefusion_tpu.data.fat import (
    FATScene, fat_pose, verify_scene, FAT_PERMUTATION,
)
from densefusion_tpu.data.synthetic import generate_fat_style_scene


@pytest.fixture(scope="module")
def fat_scene(tmp_path_factory):
    scene_dir = str(tmp_path_factory.mktemp("fat_scene"))
    model = generate_fat_style_scene(scene_dir, n_frames=2, seed=5)
    return scene_dir, model


def test_fat_scene_parses(fat_scene):
    scene_dir, model = fat_scene
    scene = FATScene(scene_dir)
    assert len(scene.frames) == 2
    assert "left" in scene.cameras.cams
    fr = scene.frame(scene.frames[0])
    assert fr["depth"].dtype == np.uint16 or fr["depth"].dtype == np.int32
    assert fr["seg"].max() == 255
    R, t = fat_pose(fr["annotation"]["objects"][0])
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert 0.5 < t[2] < 1.0


def test_fat_permutation_is_orthogonal():
    # orthogonal with det -1: the FAT axis permutation includes a handedness
    # flip (verify_fat.py prints det(p) == -1); composed with the transposed
    # annotation matrix it yields proper rotations (checked in
    # test_fat_scene_parses).
    np.testing.assert_allclose(FAT_PERMUTATION @ FAT_PERMUTATION.T,
                               np.eye(3), atol=1e-12)
    assert abs(np.linalg.det(FAT_PERMUTATION)) == pytest.approx(1.0)


def test_fat_verification_passes_on_exact_scene(fat_scene):
    """model · fixed_transform · pose must land on the back-projected cloud
    to within rendering quantization (~2-3 mm)."""
    scene_dir, model = fat_scene
    results = verify_scene(scene_dir, model)
    assert len(results) == 2
    for r in results:
        assert r["status"] == "ok"
        assert r["mean_nn_dist_m"] < 0.005, r


def test_fat_verification_detects_bad_pose(fat_scene, tmp_path):
    """Corrupting the annotation must blow up the NN distance — the check has
    teeth."""
    import json
    import os
    import shutil
    scene_dir, model = fat_scene
    bad_dir = str(tmp_path / "bad_scene")
    shutil.copytree(scene_dir, bad_dir)
    key = FATScene(bad_dir).frames[0]
    ann_path = os.path.join(bad_dir, key + ".json")
    with open(ann_path) as f:
        ann = json.load(f)
    ann["objects"][0]["pose_transform_permuted"][3][0] += 10.0  # +10 cm
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    results = verify_scene(bad_dir, model)
    bad = [r for r in results if r["frame"] == key][0]
    assert bad["mean_nn_dist_m"] > 0.02
