"""Shared object-crop sample assembly used by all pose dataset readers.

Factors out the identical 40-line block the reference repeats in each dataset
class and eval driver (mask -> bbox ladder -> choose sampling -> depth
back-projection -> crop normalization; e.g. ``datasets/ycb/dataset.py:152-197``,
``tools/eval_ycb.py:150-181``), with one TPU-first change: the crop is resized
to a single canonical size (``crop_size``) and the ``choose`` indices are
remapped to it, so every sample compiles to ONE static shape (SURVEY.md §7.4).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from densefusion_tpu import native
from densefusion_tpu.geometry.bbox import snap_bbox, remap_choose_to_resized
from densefusion_tpu.data.schema import (
    PoseSample, normalize_image, IMAGENET_MEAN_255, IMAGENET_STD_255,
)
from densefusion_tpu.data.augment import resize_bilinear_np


def pinhole_point_fn(depth: np.ndarray, cam, depth_scale: float,
                     unit_scale: float = 1.0):
    """Returns point_fn(rows, cols) back-projecting via the native data-plane
    when available (bit-identical numpy fallback). ``cam`` needs
    fx/fy/cx/cy attributes; ``depth_scale`` converts raw depth units,
    ``unit_scale`` converts to meters."""
    if native.available():
        def point_fn(rows, cols):
            return native.backproject(
                depth[rows, cols], rows, cols, cam.fx, cam.fy, cam.cx,
                cam.cy, depth_scale, unit_scale)
    else:
        def point_fn(rows, cols):
            z = depth[rows, cols].astype(np.float32) / depth_scale
            x3 = (cols.astype(np.float32) - cam.cx) * z / cam.fx
            y3 = (rows.astype(np.float32) - cam.cy) * z / cam.fy
            return np.stack([x3, y3, z], -1) * unit_scale
    return point_fn


def choose_mask_pixels(mask_crop: np.ndarray, num_points: int,
                       rng: np.random.Generator) -> np.ndarray | None:
    """Flat indices of up to ``num_points`` True pixels of a crop mask:
    a uniform subsample when there are more, wrap-padding when fewer
    (``datasets/ycb/dataset.py:177-184``). None for an empty mask."""
    choose = np.flatnonzero(mask_crop.reshape(-1))
    if choose.size == 0:
        return None
    if choose.size > num_points:
        choose = rng.choice(choose, size=num_points, replace=False)
        choose.sort()
    else:
        choose = np.pad(choose, (0, num_points - choose.size), "wrap")
    return choose.astype(np.int64)


def assemble_sample(
    *,
    rgb: np.ndarray | None = None,   # (H, W, 3) full frame, jitter applied
    mask: np.ndarray | None = None,  # (H, W) bool valid-object pixels
    bbox: tuple[int, int, int, int],  # tight (rmin, rmax, cmin, cmax), pre-snap
    point_fn: Callable[[np.ndarray, np.ndarray], np.ndarray],
    model_points: np.ndarray,        # (M, 3) canonical, meters
    target: np.ndarray,              # (M, 3) gt-posed, meters
    obj_idx: int,
    sym: bool,
    num_points: int,
    crop_size: int,
    rng: np.random.Generator,
    add_t: np.ndarray | None = None,  # (3,) translation noise, meters
    rgb_transform=None,               # applied to the CROP (e.g. ColorJitter)
    crop_fn=None,                     # (rmin, rmax, cmin, cmax) -> crop rgb
    mask_fn=None,                     # (rmin, rmax, cmin, cmax) -> bool window
    frame_hw: tuple[int, int] | None = None,  # (H, W), required with mask_fn
    native_crop: bool = False,        # keep the snapped ladder shape (no
                                      # resize): the reference's exact input
                                      # geometry, for imported torch weights
) -> PoseSample:
    """Build one PoseSample. ``point_fn(rows, cols) -> (n, 3)`` back-projects
    absolute pixel coordinates to metric 3D (pinhole or ray-map).

    ``rgb_transform`` runs on the snapped crop only — the reference jitters
    whole frames before cropping (``datasets/ycb/dataset.py:149-150``), which
    wastes ~8x the pixels; per-crop jitter is the loader's hottest op on
    few-core hosts. ``crop_fn`` generalizes this: the caller produces the
    finished crop for the snapped window (compositing/noise/jitter restricted
    to the consumed pixels), mutually exclusive with ``rgb``. ``mask_fn``
    likewise replaces the full-frame ``mask`` with a producer of just the
    snapped window (the only region ever read) — the native loader path
    computes it in one windowed C pass instead of a frame-sized one.
    """
    h, w = frame_hw if mask is None else mask.shape
    rmin, rmax, cmin, cmax = snap_bbox(*bbox, img_h=h, img_w=w)
    crop_h, crop_w = rmax - rmin, cmax - cmin

    mask_win = (mask[rmin:rmax, cmin:cmax] if mask is not None
                else mask_fn(rmin, rmax, cmin, cmax))
    choose = choose_mask_pixels(mask_win, num_points, rng)
    if choose is None:
        return PoseSample.invalid(num_points, model_points.shape[0], crop_size)

    rows = rmin + choose // crop_w
    cols = cmin + choose % crop_w
    cloud = point_fn(rows, cols).astype(np.float32)

    tgt = np.asarray(target, np.float32)
    if add_t is not None:
        cloud = cloud + add_t
        tgt = tgt + add_t

    if crop_fn is not None:
        crop_rgb = crop_fn(rmin, rmax, cmin, cmax)
    else:
        crop_rgb = rgb[rmin:rmax, cmin:cmax]
    if rgb_transform is not None:
        crop_rgb = rgb_transform(crop_rgb)
    if native_crop:
        # variable ladder shape, choose already in crop coordinates — the
        # network sees exactly what the reference fed it
        # (datasets/ycb/dataset.py:247-289, tools/eval_ycb.py:150-163);
        # samples of one snapped shape batch together (eval/bucketed.py)
        img = normalize_image(crop_rgb)
        choose = (rows - rmin) * crop_w + (cols - cmin)
    elif native.available():
        # fused normalize+resize in the native data-plane (runtime/dfnative)
        img = native.normalize_resize(crop_rgb, crop_size, crop_size,
                                      IMAGENET_MEAN_255, IMAGENET_STD_255)
        if (crop_h, crop_w) != (crop_size, crop_size):
            choose = native.remap_choose(
                (rows - rmin) * crop_w + (cols - cmin),
                crop_h, crop_w, crop_size, crop_size)
    else:
        img = normalize_image(crop_rgb)
        if (crop_h, crop_w) != (crop_size, crop_size):
            img = resize_bilinear_np(img, crop_size, crop_size)
            choose = remap_choose_to_resized(
                (rows - rmin) * crop_w + (cols - cmin),
                crop_h, crop_w, crop_size, crop_size)

    return PoseSample(
        points=cloud,
        choose=choose.astype(np.int32),
        img=img.astype(np.float32),
        target=tgt,
        model_points=np.asarray(model_points, np.float32),
        obj_idx=np.asarray(obj_idx, np.int32),
        sym=np.asarray(sym, bool),
        valid=np.ones((), bool),
    )


def subsample_model_points(points: np.ndarray, num: int,
                           rng: np.random.Generator) -> np.ndarray:
    """Random subset of ``num`` model points (reference deletes a random
    complement, ``datasets/ycb/dataset.py:204-209`` — same distribution)."""
    if len(points) <= num:
        reps = -(-num // len(points))
        return np.tile(points, (reps, 1))[:num]
    idx = rng.choice(len(points), size=num, replace=False)
    return points[idx]
