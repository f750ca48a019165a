"""FallingThings support tests: format decode + the geometric verification
check on an exact-ground-truth synthetic FAT scene (the reference's QA
mechanism, datasets/FallingThings/README.md:1-9)."""

import os
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


def test_fat_plain_pose_matches_permuted(tmp_path):
    """pose_transform + location decode (test_randomize.py convention) must
    agree with the permuted decode on the synthetic scene."""
    from densefusion_tpu.data.fat import FATScene, fat_pose, fat_pose_plain
    from densefusion_tpu.data.synthetic import generate_fat_style_scene
    scene_dir = str(tmp_path / "scene")
    generate_fat_style_scene(scene_dir, n_frames=1, seed=3)
    scene = FATScene(scene_dir)
    obj = scene.frame(scene.frames[0])["annotation"]["objects"][0]
    R1, t1 = fat_pose(obj)
    R2, t2 = fat_pose_plain(obj)
    np.testing.assert_allclose(R1, R2, atol=1e-12)
    np.testing.assert_allclose(t1, t2, atol=1e-12)


def test_fat_quaternion_consistency(tmp_path):
    """quaternion_xyzw must reproduce the permuted pose matrix (the
    test_randomize.py QA; getPoseTransPermuted == P @ R.T)."""
    from densefusion_tpu.data.fat import (
        FATScene, check_quaternion_consistency, verify_scene,
    )
    from densefusion_tpu.data.synthetic import generate_fat_style_scene
    scene_dir = str(tmp_path / "scene")
    model = generate_fat_style_scene(scene_dir, n_frames=2, seed=4)
    scene = FATScene(scene_dir)
    obj = scene.frame(scene.frames[0])["annotation"]["objects"][0]
    res = check_quaternion_consistency(obj)
    assert res["consistent"], res
    # a corrupted quaternion must be caught
    obj_bad = dict(obj)
    obj_bad["quaternion_xyzw"] = [0.0, 0.0, 0.0, 1.0]
    assert not check_quaternion_consistency(obj_bad)["consistent"]
    # end-to-end through verify_scene
    rows = verify_scene(scene_dir, model, check_quaternion=True)
    assert all(r["quaternion"]["consistent"] for r in rows
               if r["status"] == "ok")


def test_fat_reconstruct_frame_writes_plys(tmp_path):
    """3d_reconstruct_combo parity: full-scene cloud + posed model + the
    three PLY dumps; the posed model must land on the object cloud."""
    from densefusion_tpu.data.fat import FATScene, reconstruct_frame
    from densefusion_tpu.data.ply import read_ply_vertices
    from densefusion_tpu.data.synthetic import generate_fat_style_scene
    scene_dir = str(tmp_path / "scene")
    model = generate_fat_style_scene(scene_dir, n_frames=1, seed=5)
    scene = FATScene(scene_dir)
    out_dir = str(tmp_path / "recon")
    out = reconstruct_frame(scene, scene.frames[0], model, out_dir=out_dir)
    h_w = scene.frame(scene.frames[0])["depth"].size
    assert out["scene_cloud"].shape == (h_w, 3)
    obj = out["objects"][0]
    # posed model vs segmentation cloud: nearest-neighbour distance small
    cloud = obj["object_cloud"][::7]
    posed = obj["posed_model"][::11]
    d = np.sqrt(((cloud[:, None] - posed[None]) ** 2).sum(-1)).min(1)
    assert d.mean() < 0.01
    for name in ("projected.ply", "target.ply", "identity.ply"):
        pts = read_ply_vertices(os.path.join(out_dir, name))
        assert pts.shape[1] == 3 and len(pts) > 0


def test_reconstruct_fat_cli(tmp_path):
    from densefusion_tpu.cli import reconstruct_fat
    from densefusion_tpu.data.synthetic import generate_fat_style_scene
    from densefusion_tpu.data.ply import write_ply
    scene_dir = str(tmp_path / "scene")
    model = generate_fat_style_scene(scene_dir, n_frames=1, seed=6)
    model_path = str(tmp_path / "model.ply")
    write_ply(model_path, model)
    out_dir = str(tmp_path / "out")
    reconstruct_fat.main(["--scene", scene_dir, "--model", model_path,
                          "--out_dir", out_dir])
    assert os.path.exists(os.path.join(out_dir, "target.ply"))


def test_verify_fat_cli_plain_and_quaternion(tmp_path):
    from densefusion_tpu.cli import verify_fat as vf
    from densefusion_tpu.data.synthetic import generate_fat_style_scene
    from densefusion_tpu.data.ply import write_ply
    scene_dir = str(tmp_path / "scene")
    model = generate_fat_style_scene(scene_dir, n_frames=1, seed=7)
    model_path = str(tmp_path / "model.ply")
    write_ply(model_path, model)
    rc = vf.main(["--scene", scene_dir, "--model", model_path,
                  "--pose_source", "plain", "--check_quaternion"])
    assert rc == 0
