"""FallingThings (FAT) dataset support: reader, PoseSample adapter, and the
geometric verification tool.

Covers the capabilities of the reference's ``datasets/FallingThings/``
scripts (``verify_fat.py``, ``testfat_rescale.py``, ``3d_reconstruct_combo
.py`` — SURVEY.md §2.1): parsing FAT scene annotations and checking that
``model_points · fixed_model_transform · pose`` lands on the depth-
back-projected object cloud (the fork's main QA mechanism,
``datasets/FallingThings/README.md:1-9``).

Format facts (from the committed fixtures and scripts):
* ``_object_settings.json``: per-class ``fixed_model_transform`` — a 4x4 in
  TRANSPOSED convention (translation in the last ROW) and centimeter x100
  scale; ``segmentation_class_id`` labels the seg PNG.
* ``_camera_settings.json``: left/right pinhole intrinsics.
* ``{frame:06d}.{side}.json``: per-object ``pose_transform_permuted`` (also
  transposed; the rotation needs ``R = M[:3,:3].T @ P`` with the fixed axis
  permutation ``P = [[0,0,1],[1,0,0],[0,-1,0]]`` — ``verify_fat.py:55-58,113``),
  translation in cm, plus ``bounding_box`` in (y, x) order.
* ``.depth.png``: 16-bit depth in 0.1 mm units (/10000 -> meters).
"""

from __future__ import annotations

import json
import os

import numpy as np

# the FAT pose axis permutation (verify_fat.py:55-58)
FAT_PERMUTATION = np.array([[0.0, 0.0, 1.0],
                            [1.0, 0.0, 0.0],
                            [0.0, -1.0, 0.0]])
FAT_DEPTH_SCALE = 10000.0  # 0.1 mm units -> meters
FAT_CM = 100.0             # annotation translations are in cm


def _load_image(path: str) -> np.ndarray:
    from PIL import Image
    return np.array(Image.open(path))


class FATObjectSettings:
    def __init__(self, scene_dir: str):
        with open(os.path.join(scene_dir, "_object_settings.json")) as f:
            data = json.load(f)
        self.classes = data["exported_object_classes"]
        self.objects = {}
        for obj in data["exported_objects"]:
            m = np.asarray(obj["fixed_model_transform"], np.float64)
            # transposed convention: rotation = M[:3,:3].T, translation row 3
            self.objects[obj["class"]] = {
                "seg_id": obj["segmentation_class_id"],
                "fixed_rotation": m[:3, :3].T / FAT_CM,
                "fixed_translation": m[3, :3] / FAT_CM,
                "cuboid_dimensions": np.asarray(
                    obj.get("cuboid_dimensions", [0, 0, 0])),
            }


class FATCameraSettings:
    def __init__(self, scene_dir: str):
        with open(os.path.join(scene_dir, "_camera_settings.json")) as f:
            data = json.load(f)
        self.cams = {}
        for cam in data["camera_settings"]:
            s = cam["intrinsic_settings"]
            self.cams[cam["name"]] = dict(
                fx=float(s["fx"]), fy=float(s["fy"]),
                cx=float(s["cx"]), cy=float(s["cy"]),
                width=cam["captured_image_size"]["width"],
                height=cam["captured_image_size"]["height"])


def fat_pose(obj_annotation: dict) -> tuple[np.ndarray, np.ndarray]:
    """(R, t): rotation (world->cam of the FIXED model) and translation in
    meters, decoded from ``pose_transform_permuted``
    (``verify_fat.py:113-118,229``)."""
    m = np.asarray(obj_annotation["pose_transform_permuted"], np.float64)
    R = m[:3, :3].T @ FAT_PERMUTATION
    t = m[3, :3] / FAT_CM
    return R, t


def backproject_fat_depth(depth: np.ndarray, mask: np.ndarray,
                          cam: dict) -> np.ndarray:
    """Masked FAT depth -> (n, 3) cloud in meters. Note the reference's
    convention: image row drives y via cy/fy, column drives x via cx/fx
    (``verify_fat.py:148-157`` get_xprime with (u, v) swapped args)."""
    vs, us = np.nonzero(mask)
    z = depth[vs, us].astype(np.float64)
    x = (us - cam["cx"]) / cam["fx"] * z
    y = (vs - cam["cy"]) / cam["fy"] * z
    return np.stack([x, y, z], -1) / FAT_DEPTH_SCALE


class FATScene:
    """One FAT scene directory (e.g. ``power_drill_with_model``,
    ``RoomDemo_*``): frames ``{idx:06d}.{side}`` with .jpg/.depth.png/.seg.png
    /.json plus the two settings files."""

    def __init__(self, scene_dir: str):
        self.dir = scene_dir
        self.objects = FATObjectSettings(scene_dir)
        self.cameras = FATCameraSettings(scene_dir)
        self.frames = sorted({
            fname.rsplit(".", 2)[0] + "." + fname.rsplit(".", 2)[1]
            for fname in os.listdir(scene_dir)
            if fname.endswith(".json") and not fname.startswith("_")
        })

    def frame(self, key: str) -> dict:
        """key like '000005.right' -> dict(rgb, depth, seg, annotation, cam)."""
        side = key.split(".")[-1]
        rgb_path = os.path.join(self.dir, key + ".jpg")
        if not os.path.exists(rgb_path):
            rgb_path = os.path.join(self.dir, key + ".png")
        return {
            "rgb": _load_image(rgb_path),
            "depth": _load_image(os.path.join(self.dir, key + ".depth.png")),
            "seg": _load_image(os.path.join(self.dir, key + ".seg.png")),
            "annotation": json.load(
                open(os.path.join(self.dir, key + ".json"))),
            "cam": self.cameras.cams[side],
        }


def verify_frame(scene: FATScene, key: str, model_points: np.ndarray,
                 max_points: int = 2000, seed: int = 0) -> list[dict]:
    """The FallingThings QA check: for every annotated object, transform the
    model by ``fixed_model_transform`` then the frame pose, and measure the
    mean nearest-neighbour distance to the depth-back-projected segmentation
    cloud. Small (<~1 cm) distances validate the annotation/intrinsics
    pipeline (``datasets/FallingThings/README.md:1-9``)."""
    fr = scene.frame(key)
    rng = np.random.default_rng(seed)
    results = []
    for obj in fr["annotation"]["objects"]:
        cls = obj["class"]
        settings = scene.objects.objects.get(cls)
        if settings is None:
            continue
        mask = fr["seg"] == settings["seg_id"]
        if mask.sum() < 10:
            results.append({"class": cls, "status": "no_mask"})
            continue
        cloud = backproject_fat_depth(fr["depth"], mask, fr["cam"])
        if len(cloud) > max_points:
            cloud = cloud[rng.choice(len(cloud), max_points, replace=False)]
        R, t = fat_pose(obj)
        fixed = model_points @ settings["fixed_rotation"].T \
            + settings["fixed_translation"]
        target = fixed @ R.T + t
        if len(target) > max_points:
            target = target[rng.choice(len(target), max_points,
                                       replace=False)]
        # mean NN distance cloud -> target
        d = np.sqrt(((cloud[:, None, :] - target[None, :, :]) ** 2)
                    .sum(-1)).min(1)
        results.append({
            "class": cls,
            "status": "ok",
            "mean_nn_dist_m": float(d.mean()),
            "median_nn_dist_m": float(np.median(d)),
            "n_cloud": int(len(cloud)),
        })
    return results


def verify_scene(scene_dir: str, model_points: np.ndarray,
                 max_frames: int | None = None) -> list[dict]:
    scene = FATScene(scene_dir)
    out = []
    for key in scene.frames[:max_frames]:
        for r in verify_frame(scene, key, model_points):
            out.append({"frame": key, **r})
    return out
