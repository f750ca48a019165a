"""Geometry layer: quaternion/rotation math, camera models, bbox utilities.

TPU-native replacement for the reference's vendored ``lib/transformations.py``
(only the used subset) plus the depth back-projection and bbox-ladder logic
embedded in its dataset classes (``datasets/ycb/dataset.py:191-195,251-289``).
Everything here is pure ``jnp`` (vmappable, jittable) unless noted host-side.
"""

from densefusion_tpu.geometry.quaternion import (
    quat_normalize,
    quat_to_matrix,
    matrix_to_quat,
    quat_multiply,
    quat_conjugate,
    quat_rotate,
    quat_from_euler,
    euler_matrix,
    random_quaternion,
    pose_compose,
    apply_pose,
    invert_pose,
    transform_points,
    untransform_points,
)
from densefusion_tpu.geometry.camera import (
    CameraIntrinsics,
    backproject_pixels,
    backproject_depth_map,
)
from densefusion_tpu.geometry.bbox import (
    BORDER_LADDER,
    snap_bbox,
    bbox_from_mask,
    remap_choose_to_resized,
)

__all__ = [
    "quat_normalize", "quat_to_matrix", "matrix_to_quat", "quat_multiply",
    "quat_conjugate", "quat_rotate", "quat_from_euler", "euler_matrix",
    "random_quaternion", "pose_compose", "apply_pose", "invert_pose",
    "transform_points", "untransform_points",
    "CameraIntrinsics", "backproject_pixels", "backproject_depth_map",
    "BORDER_LADDER", "snap_bbox", "bbox_from_mask", "remap_choose_to_resized",
]
