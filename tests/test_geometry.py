"""Geometry layer tests: property tests against independent numpy references
(quaternion algebra identities, scipy cross-checks) per SURVEY.md §4."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from densefusion_tpu.geometry import (
    quat_normalize, quat_to_matrix, matrix_to_quat, quat_multiply,
    quat_rotate, quat_from_euler, euler_matrix, random_quaternion,
    pose_compose, invert_pose, apply_pose, transform_points,
    untransform_points, CameraIntrinsics, backproject_pixels,
    backproject_depth_map, snap_bbox, bbox_from_mask, BORDER_LADDER,
    remap_choose_to_resized,
)


def _random_unit_quats(rng, n):
    q = rng.standard_normal((n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_matrix_matches_scipy(rng):
    q = _random_unit_quats(rng, 32)
    R = np.asarray(quat_to_matrix(jnp.asarray(q)))
    # scipy uses xyzw ordering
    R_ref = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-6)


def test_matrix_roundtrip(rng):
    q = _random_unit_quats(rng, 64)
    q = q * np.where(q[:, :1] < 0, -1.0, 1.0)  # canonical w>=0
    R = quat_to_matrix(jnp.asarray(q))
    q2 = np.asarray(matrix_to_quat(R))
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_quat_multiply_is_matrix_product(rng):
    q1 = jnp.asarray(_random_unit_quats(rng, 16))
    q2 = jnp.asarray(_random_unit_quats(rng, 16))
    R12 = quat_to_matrix(quat_multiply(q1, q2))
    np.testing.assert_allclose(
        np.asarray(R12),
        np.asarray(quat_to_matrix(q1) @ quat_to_matrix(q2)),
        atol=1e-6,
    )


def test_quat_rotate_matches_matrix(rng):
    q = jnp.asarray(_random_unit_quats(rng, 8))
    v = jnp.asarray(rng.standard_normal((8, 3)), dtype=jnp.float32)
    got = quat_rotate(q, v)
    want = jnp.einsum("bij,bj->bi", quat_to_matrix(q), v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pose_compose_and_invert(rng):
    q1 = jnp.asarray(_random_unit_quats(rng, 8))
    q2 = jnp.asarray(_random_unit_quats(rng, 8))
    t1 = jnp.asarray(rng.standard_normal((8, 3)))
    t2 = jnp.asarray(rng.standard_normal((8, 3)))
    p = jnp.asarray(rng.standard_normal((8, 10, 3)))
    # compose == apply twice
    qc, tc = pose_compose(q1, t1, q2, t2)
    np.testing.assert_allclose(
        np.asarray(apply_pose(p, qc, tc)),
        np.asarray(apply_pose(apply_pose(p, q2, t2), q1, t1)),
        atol=1e-5,
    )
    # invert ∘ pose == identity
    qi, ti = invert_pose(q1, t1)
    np.testing.assert_allclose(
        np.asarray(apply_pose(apply_pose(p, q1, t1), qi, ti)),
        np.asarray(p), atol=1e-5,
    )


def test_untransform_inverts_transform(rng):
    q = jnp.asarray(_random_unit_quats(rng, 4))
    R = quat_to_matrix(q)
    t = jnp.asarray(rng.standard_normal((4, 3)))
    p = jnp.asarray(rng.standard_normal((4, 20, 3)))
    fwd = transform_points(p, R, t)
    np.testing.assert_allclose(
        np.asarray(untransform_points(fwd, R, t)), np.asarray(p), atol=1e-5
    )


def test_euler_matrix_matches_scipy():
    ai, aj, ak = 0.3, -1.1, 2.0
    R = np.asarray(euler_matrix(ai, aj, ak))
    R_ref = Rotation.from_euler("xyz", [ai, aj, ak]).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-6)
    q = np.asarray(quat_from_euler(ai, aj, ak))
    q_ref = Rotation.from_euler("xyz", [ai, aj, ak]).as_quat()[[3, 0, 1, 2]]
    np.testing.assert_allclose(np.abs(q), np.abs(q_ref), atol=1e-6)


def test_random_quaternion_is_unit_and_covers():
    q = random_quaternion(jax.random.key(0), (256,))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0,
                               atol=1e-5)
    # rotations should average near identity-free (mean matrix far from any
    # single rotation) — crude uniformity check
    R = np.asarray(quat_to_matrix(q))
    assert np.abs(R.mean(axis=0)).max() < 0.2


def test_backprojection_pinhole_roundtrip(rng):
    cam = CameraIntrinsics(fx=600.0, fy=610.0, cx=320.0, cy=240.0,
                           depth_scale=1000.0)
    pts = rng.uniform(0.3, 2.0, size=(50, 3)).astype(np.float32)
    pts[:, :2] -= 1.0
    # project
    u = pts[:, 0] / pts[:, 2] * cam.fx + cam.cx
    v = pts[:, 1] / pts[:, 2] * cam.fy + cam.cy
    depth = pts[:, 2] * cam.depth_scale
    back = backproject_pixels(jnp.asarray(depth), jnp.asarray(v),
                              jnp.asarray(u), cam.as_array())
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-5, atol=1e-5)


def test_backproject_depth_map_shape():
    cam = CameraIntrinsics(fx=500.0, fy=500.0, cx=32.0, cy=24.0)
    depth = jnp.ones((48, 64))
    cloud = backproject_depth_map(depth, cam.as_array())
    assert cloud.shape == (48, 64, 3)
    np.testing.assert_allclose(np.asarray(cloud[..., 2]), 1.0)


def test_snap_bbox_on_ladder():
    rmin, rmax, cmin, cmax = snap_bbox(100, 171, 200, 322)
    assert rmax - rmin in BORDER_LADDER and cmax - cmin in BORDER_LADDER
    assert rmax - rmin == 80 and cmax - cmin == 160
    assert 0 <= rmin and rmax <= 480 and 0 <= cmin and cmax <= 640


def test_snap_bbox_clamps_at_edges():
    r0, r1, c0, c1 = snap_bbox(0, 30, 600, 640)
    assert r0 >= 0 and c1 <= 640
    # 30 snaps up to 40; 40 sits exactly on a rung and stays (reference's
    # strict-inequality ladder scan leaves it unchanged).
    assert r1 - r0 == 40 and c1 - c0 == 40


def test_bbox_from_mask_largest_component():
    mask = np.zeros((64, 64), bool)
    mask[10:30, 10:30] = True   # large blob
    mask[50:52, 50:52] = True   # speckle
    assert bbox_from_mask(mask) == (10, 30, 10, 30)
    assert bbox_from_mask(np.zeros((8, 8), bool)) is None


def test_remap_choose_identity():
    choose = np.arange(0, 100, 7, dtype=np.int64)
    out = remap_choose_to_resized(choose, 10, 10, 10, 10)
    np.testing.assert_array_equal(out, choose)


def test_remap_choose_downscale_bounds():
    choose = np.array([0, 37, 99, 399], dtype=np.int64)
    out = remap_choose_to_resized(choose, 20, 20, 8, 8)
    assert out.min() >= 0 and out.max() < 64
