"""Quaternion / rotation math as pure jnp functions.

Conventions (matching the reference's semantics so checkpoints / metrics are
comparable):

* Quaternions are ``(w, x, y, z)`` (scalar first), as used by the vendored
  Gohlke library in the reference (``lib/transformations.py:1254``) and by the
  hand-written rotation-matrix construction in its loss
  (``lib/loss.py:18-26`` — which expands to the standard
  ``quaternion_matrix(q)[:3, :3]``).
* Points are row vectors; a pose ``(q, t)`` maps model point ``p`` to
  ``R(q) @ p + t``, evaluated in batch form as ``points @ R.T + t``
  (``lib/loss.py:38``, ``tools/eval_linemod.py:120``).
* ``untransform_points`` is the reference's canonicalization
  ``(points - t) @ R`` (``lib/loss.py:63``), i.e. the inverse rigid transform.

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize quaternion(s) to unit norm. q: (..., 4)."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion(s) (..., 4) wxyz -> rotation matrix (..., 3, 3).

    Equals the reference's per-hypothesis ``base`` matrix (``lib/loss.py:18-26``)
    and ``quaternion_matrix(q)[:3,:3]`` (``lib/transformations.py:1254``) for
    unit quaternions.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    r = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz),       2.0 * (wy + xz),
            2.0 * (xy + wz),       1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy),       2.0 * (wx + yz),       1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4) wxyz, w >= 0.

    Branchless Shepperd's method: compute all four candidate quaternions and
    select the best-conditioned one (replaces ``quaternion_from_matrix``,
    ``lib/transformations.py:1281``, used in refinement composition
    ``tools/eval_ycb.py:224``).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates, each valid when its pivot (4q_i^2) is largest.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    pivots = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    case = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 cases, 4 comps)
    q = jnp.take_along_axis(cands, case[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    q = quat_normalize(q)
    # Canonical sign: w >= 0 (matches quaternion_from_matrix(..., isprecise=True)).
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product: R(quat_multiply(q1, q2)) == R(q1) @ R(q2)."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v (..., 3) by quaternion(s) q (..., 4) without
    materializing the matrix: v' = v + 2*cross(q_vec, cross(q_vec, v) + w*v)."""
    qv = q[..., 1:]
    w = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def quat_from_euler(ai, aj, ak) -> jax.Array:
    """'sxyz' Euler angles -> quaternion wxyz (parity with the used default of
    ``quaternion_from_euler``, ``lib/transformations.py:1181``)."""
    ai, aj, ak = jnp.asarray(ai) / 2.0, jnp.asarray(aj) / 2.0, jnp.asarray(ak) / 2.0
    ci, si = jnp.cos(ai), jnp.sin(ai)
    cj, sj = jnp.cos(aj), jnp.sin(aj)
    ck, sk = jnp.cos(ak), jnp.sin(ak)
    return jnp.stack(
        [
            ci * cj * ck + si * sj * sk,
            si * cj * ck - ci * sj * sk,
            ci * sj * ck + si * cj * sk,
            ci * cj * sk - si * sj * ck,
        ],
        axis=-1,
    )


def euler_matrix(ai, aj, ak) -> jax.Array:
    """'sxyz' Euler angles -> 3x3 rotation (used subset of ``euler_matrix``,
    ``lib/transformations.py:1049``)."""
    return quat_to_matrix(quat_from_euler(ai, aj, ak))


def random_quaternion(key: jax.Array, shape=()) -> jax.Array:
    """Uniform random unit quaternion(s), wxyz (replaces
    ``random_quaternion``, ``lib/transformations.py:1472``)."""
    k1, k2, k3 = jax.random.split(key, 3)
    u1 = jax.random.uniform(k1, shape)
    u2 = jax.random.uniform(k2, shape, minval=0.0, maxval=2.0 * jnp.pi)
    u3 = jax.random.uniform(k3, shape, minval=0.0, maxval=2.0 * jnp.pi)
    a, b = jnp.sqrt(1.0 - u1), jnp.sqrt(u1)
    return jnp.stack(
        [b * jnp.cos(u3), a * jnp.sin(u2), a * jnp.cos(u2), b * jnp.sin(u3)],
        axis=-1,
    )


def pose_compose(q1: jax.Array, t1: jax.Array, q2: jax.Array, t2: jax.Array):
    """Compose rigid transforms: (q1,t1) ∘ (q2,t2) applied as p -> R1(R2 p + t2) + t1.

    This is the refinement composition ``my_mat_final = my_mat @ my_mat_2``
    (``tools/eval_ycb.py:221``) done natively on-device, without the 4x4
    numpy round-trip.
    """
    return quat_multiply(q1, q2), quat_rotate(q1, t2) + t1


def invert_pose(q: jax.Array, t: jax.Array):
    qc = quat_conjugate(q)
    return qc, -quat_rotate(qc, t)


def apply_pose(points: jax.Array, q: jax.Array, t: jax.Array) -> jax.Array:
    """points (..., N, 3) -> R(q) @ p + t per point."""
    R = quat_to_matrix(q)
    return points @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def transform_points(points: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """points @ R.T + t  (forward rigid transform, row-vector convention)."""
    return points @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def untransform_points(points: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """(points - t) @ R  — the inverse transform / canonicalization used to
    re-express clouds in the predicted pose frame (``lib/loss.py:63-67``)."""
    return (points - t[..., None, :]) @ R
