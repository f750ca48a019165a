"""Pinhole camera model and depth back-projection.

TPU-native form of the back-projection scattered through the reference's
dataset classes and eval drivers (``datasets/ycb/dataset.py:191-195``,
``tools/eval_ycb.py:170-173``): given masked depth pixels at image coordinates
``(row, col)``, the 3D point is::

    z = depth / depth_scale
    x = (col - cx) * z / fx
    y = (row - cy) * z / fy

(the reference's ``ymap`` holds column indices and ``xmap`` row indices —
``datasets/ycb/dataset.py:81-82`` — so ``pt0`` is the x axis from columns).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CameraIntrinsics:
    """Pinhole intrinsics. ``depth_scale`` converts stored depth units to the
    working metric unit (e.g. 10000 for YCB's ``factor_depth``,
    ``datasets/ycb/dataset.py:191``; LineMOD uses 1.0 then /1000 to meters)."""

    fx: float
    fy: float
    cx: float
    cy: float
    depth_scale: float = 1.0

    def as_array(self) -> jnp.ndarray:
        return jnp.array([self.fx, self.fy, self.cx, self.cy, self.depth_scale],
                         dtype=jnp.float32)


# Canonical intrinsics from the reference datasets.
YCB_CAM_1 = CameraIntrinsics(fx=1066.778, fy=1067.487, cx=312.9869, cy=241.3109,
                             depth_scale=10000.0)  # datasets/ycb/dataset.py:71-74
YCB_CAM_2 = CameraIntrinsics(fx=1077.836, fy=1078.189, cx=323.7872, cy=279.6921,
                             depth_scale=10000.0)  # datasets/ycb/dataset.py:76-79
LINEMOD_CAM = CameraIntrinsics(fx=572.41140, fy=573.57043, cx=325.26110,
                               cy=242.04899, depth_scale=1.0)  # linemod/dataset.py:73-76


def backproject_pixels(depth: jax.Array, rows: jax.Array, cols: jax.Array,
                       cam: jax.Array, unit_scale: float = 1.0) -> jax.Array:
    """Back-project selected pixels to 3D points.

    Args:
      depth: (..., N) raw depth values at the selected pixels.
      rows, cols: (..., N) integer/float pixel coordinates.
      cam: (..., 5) array ``[fx, fy, cx, cy, depth_scale]`` (``CameraIntrinsics
        .as_array()``); batched per sample so mixed-intrinsics batches work.
      unit_scale: extra metric conversion applied at the end (e.g. 1/1000 for
        LineMOD mm->m, ``datasets/linemod/dataset.py:157``).

    Returns:
      (..., N, 3) cloud in camera frame, x right / y down / z forward.
    """
    fx, fy = cam[..., 0:1], cam[..., 1:2]
    cx, cy = cam[..., 2:3], cam[..., 3:4]
    dscale = cam[..., 4:5]
    z = depth.astype(jnp.float32) / dscale
    x = (cols.astype(jnp.float32) - cx) * z / fx
    y = (rows.astype(jnp.float32) - cy) * z / fy
    return jnp.stack([x, y, z], axis=-1) * unit_scale


def backproject_depth_map(depth: jax.Array, cam: jax.Array,
                          unit_scale: float = 1.0) -> jax.Array:
    """Back-project a full (H, W) depth map to an (H, W, 3) cloud."""
    h, w = depth.shape[-2], depth.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return backproject_pixels(depth, rows, cols, cam, unit_scale)
