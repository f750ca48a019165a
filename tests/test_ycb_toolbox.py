"""Golden test for the toolbox-exact YCB keyframe scorer.

A hand-constructed keyframe set (exact detection, missed gt object, false
positive, perturbed pose) must reproduce hand-computed ADD/ADD-S(adi)/re/te
values and VOCap AUC / <2cm exactly — mirroring
``replace_ycb_toolbox/evaluate_poses_keyframe.m`` +
``plot_accuracy_keyframe.m`` semantics (VERDICT round-1 item 1)."""

import os

import numpy as np
import pytest
import scipy.io as scio

from densefusion_tpu.eval.ycb_toolbox import (
    add_error, adi_error, rotation_error_deg, translation_error,
    quat_to_matrix_np, score_keyframes, summarize, plot_accuracy,
)


def _write_xyz(path, pts):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savetxt(path, pts)


def _cube(scale):
    c = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                  for sz in (-1, 1)], np.float64)
    return c * scale


@pytest.fixture
def golden_setup(tmp_path):
    """2 keyframes, 3 classes; rows = (cls1 exact), (cls2 miss), (cls1 off by
    10° about z + 3 cm); a cls3 false-positive roi must be skipped."""
    root = str(tmp_path / "ycb")
    cfg = os.path.join(root, "dataset_config")
    os.makedirs(cfg)
    classes = ["cls1", "cls2", "cls3"]
    with open(os.path.join(cfg, "classes.txt"), "w") as f:
        f.write("\n".join(classes) + "\n")
    frames = ["data/0000/000001", "data/0000/000002"]
    with open(os.path.join(cfg, "test_data_list.txt"), "w") as f:
        f.write("\n".join(frames) + "\n")

    models = {1: _cube(0.05), 2: _cube(0.03),
              3: np.array([[0.01, 0.0, 0.0], [0.0, 0.02, 0.0]])}
    for cid, cls in enumerate(classes, start=1):
        _write_xyz(os.path.join(root, "models", cls, "points.xyz"),
                   models[cid])

    t1 = np.array([0.0, 0.0, 1.0])
    t2 = np.array([0.1, 0.0, 1.0])
    ang = np.radians(10.0)
    R10 = np.array([[np.cos(ang), -np.sin(ang), 0],
                    [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    q10 = np.array([np.cos(ang / 2), 0.0, 0.0, np.sin(ang / 2)])  # wxyz
    dt = np.array([0.03, 0.0, 0.0])

    # frame 0: gt = [cls1 @ (I, t1), cls2 @ (I, t2)]
    os.makedirs(os.path.join(root, "data/0000"))
    scio.savemat(os.path.join(root, frames[0] + "-meta.mat"), {
        "cls_indexes": np.array([[1], [2]], np.float64),
        "poses": np.stack([np.c_[np.eye(3), t1],
                           np.c_[np.eye(3), t2]], axis=-1),
    })
    # frame 1: gt = [cls1 @ (I, t1)]
    scio.savemat(os.path.join(root, frames[1] + "-meta.mat"), {
        "cls_indexes": np.array([[1]], np.float64),
        "poses": np.c_[np.eye(3), t1][..., None],
    })

    posecnn = str(tmp_path / "posecnn")
    os.makedirs(posecnn)
    # frame 0 rois: cls1 detected + cls3 FALSE POSITIVE; cls2 missed
    scio.savemat(os.path.join(posecnn, "000000.mat"),
                 {"rois": np.array([[0, 1, 0, 0, 0, 0, 0],
                                    [0, 3, 0, 0, 0, 0, 0]], np.float64)})
    scio.savemat(os.path.join(posecnn, "000001.mat"),
                 {"rois": np.array([[0, 1, 0, 0, 0, 0, 0]], np.float64)})

    res = str(tmp_path / "results")
    os.makedirs(res)
    # frame 0 poses (roi order): exact cls1 pose, junk cls3 pose
    scio.savemat(os.path.join(res, "0000.mat"), {
        "poses": np.array([[1, 0, 0, 0, *t1], [1, 0, 0, 0, 9, 9, 9]],
                          np.float64)})
    # frame 1: cls1 rotated 10° about z, translated +3 cm in x
    scio.savemat(os.path.join(res, "0001.mat"), {
        "poses": np.array([[*q10, *(t1 + dt)]], np.float64)})

    return dict(root=root, posecnn=posecnn, res=res, models=models,
                R10=R10, dt=dt, t1=t1, classes=classes)


def test_error_primitives_hand_computed(golden_setup):
    g = golden_setup
    pts, R10, dt = g["models"][1], g["R10"], g["dt"]
    # ADD: mean ‖(R10 − I)p + dt‖ computed with independent numpy
    expect_add = np.mean(np.linalg.norm(pts @ R10.T + dt - pts, axis=1))
    assert add_error(R10, g["t1"] + dt, np.eye(3), g["t1"], pts) == \
        pytest.approx(expect_add, abs=1e-12)
    # adi: brute-force double loop, gt -> nearest est
    est = pts @ R10.T + g["t1"] + dt
    gt = pts + g["t1"]
    expect_adi = np.mean([np.linalg.norm(est - p, axis=1).min() for p in gt])
    assert adi_error(R10, g["t1"] + dt, np.eye(3), g["t1"], pts) == \
        pytest.approx(expect_adi, abs=1e-12)
    assert rotation_error_deg(R10, np.eye(3)) == pytest.approx(10.0, abs=1e-9)
    assert translation_error(g["t1"] + dt, g["t1"]) == \
        pytest.approx(0.03, abs=1e-12)
    # quat -> matrix matches the hand-built axis-angle matrix
    q10 = np.array([np.cos(np.radians(5)), 0, 0, np.sin(np.radians(5))])
    np.testing.assert_allclose(quat_to_matrix_np(q10), R10, atol=1e-12)


def test_score_keyframes_golden(golden_setup):
    g = golden_setup
    results = score_keyframes(g["root"], g["posecnn"], {"m": g["res"]})

    # three gt rows (cls1, cls2-miss, cls1); the cls3 false positive is
    # never scored (evaluate_poses_keyframe.m iterates gt objects only)
    np.testing.assert_array_equal(results.cls_ids, [1, 2, 1])
    np.testing.assert_array_equal(results.frame_ids, [0, 0, 1])

    pts, R10, dt, t1 = g["models"][1], g["R10"], g["dt"], g["t1"]
    expect_add = np.mean(np.linalg.norm(pts @ R10.T + dt - pts, axis=1))
    est = pts @ R10.T + t1 + dt
    expect_adi = np.mean([np.linalg.norm(est - p, axis=1).min()
                          for p in pts + t1])

    np.testing.assert_allclose(
        results.distances_non[:, 0], [0.0, np.inf, expect_add], atol=1e-12)
    np.testing.assert_allclose(
        results.distances_sys[:, 0], [0.0, np.inf, expect_adi], atol=1e-12)
    np.testing.assert_allclose(
        results.errors_rotation[:, 0], [0.0, np.inf, 10.0], atol=1e-9)
    np.testing.assert_allclose(
        results.errors_translation[:, 0], [0.0, np.inf, 0.03], atol=1e-12)

    # ---- summary: hand-computed VOCap AUC and <2cm --------------------
    # all rows: distances [0, inf, d]; accuracy curve n=3 ->
    # VOCap = (d·2/3 + (0.1−d)·2/3)/0.1 = 2/3 for any 0 < d ≤ 0.1
    table = summarize(results, g["classes"])["m"]
    assert table["all"]["add_auc"] == pytest.approx(100 * 2 / 3, abs=1e-9)
    assert table["all"]["adds_auc"] == pytest.approx(100 * 2 / 3, abs=1e-9)
    # only the exact pose is < 2cm
    assert table["all"]["adds_under_2cm"] == pytest.approx(100 / 3, abs=1e-9)
    assert table["all"]["detected"] == 2 and table["all"]["total"] == 3
    assert table["all"]["mean_rotation_err_deg"] == pytest.approx(5.0)
    assert table["all"]["mean_translation_err_m"] == pytest.approx(0.015)
    # per-class cls1: [0, d] -> AUC 100 (right-edge step integral), <2cm 50
    assert table["cls1"]["add_auc"] == pytest.approx(100.0, abs=1e-9)
    assert table["cls1"]["adds_under_2cm"] == pytest.approx(50.0, abs=1e-9)
    # cls2: all-miss -> AUC 0
    assert table["cls2"]["add_auc"] == 0.0
    assert table["cls2"]["detected"] == 0

    # results_keyframe.mat round-trips
    mat_path = os.path.join(g["root"], "results_keyframe.mat")
    results.save_mat(mat_path)
    mat = scio.loadmat(mat_path)
    assert mat["distances_sys"].shape == (3, 1)


def test_plot_accuracy_writes_figures(golden_setup, tmp_path):
    g = golden_setup
    results = score_keyframes(g["root"], g["posecnn"], {"m": g["res"]})
    out = str(tmp_path / "plots")
    paths = plot_accuracy(results, g["classes"], out)
    # one figure per class + the all-objects figure
    assert len(paths) == len(g["classes"]) + 1
    assert all(os.path.exists(p) and os.path.getsize(p) > 0 for p in paths)


def test_jnp_metric_directions_match_toolbox(golden_setup):
    """eval/metrics.py adi_distance (jnp) == toolbox adi (scipy KD-tree), and
    rotation/translation errors agree with the numpy primitives."""
    import jax.numpy as jnp
    from densefusion_tpu.eval.metrics import (
        adi_distance, adds_distance, rotation_error_deg as re_j,
        translation_error as te_j,
    )
    g = golden_setup
    pts, R10, dt, t1 = g["models"][1], g["R10"], g["dt"], g["t1"]
    pred = pts @ R10.T + t1 + dt
    gt = pts + t1
    expect_adi = adi_error(R10, t1 + dt, np.eye(3), t1, pts)
    got = float(adi_distance(jnp.asarray(pred), jnp.asarray(gt)))
    assert got == pytest.approx(expect_adi, abs=1e-6)
    # the reverse (LineMOD) direction against its own brute force
    expect_adds = np.mean([np.linalg.norm(gt - p, axis=1).min()
                           for p in pred])
    other = float(adds_distance(jnp.asarray(pred), jnp.asarray(gt)))
    assert other == pytest.approx(expect_adds, abs=1e-6)
    assert float(re_j(jnp.asarray(R10), jnp.eye(3))) == \
        pytest.approx(10.0, abs=1e-4)
    assert float(te_j(jnp.asarray(t1 + dt), jnp.asarray(t1))) == \
        pytest.approx(0.03, abs=1e-7)
