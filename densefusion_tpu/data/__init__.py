"""Data pipeline: dataset readers (YCB-Video / LineMOD / customCAD /
segmentation), augmentation, synthetic fixture generation, and a host-side
prefetching batch loader that lands sharded arrays on device.

The sample schema is the reference's de-facto 6-tensor contract
(``datasets/ycb/dataset.py:227-232``; SURVEY.md §3.5) plus explicit
``sym``/``valid`` flags so the jitted loss never needs python-side branching:

    points (N, 3) f32 meters | choose (N,) i32 | img (H, W, 3) f32 normalized
    target (M, 3) f32 | model_points (M, 3) f32 | obj_idx () i32
    sym () bool | valid () bool

All images are resized to ONE canonical crop size with `choose` remapped
accordingly — a single compiled shape instead of the reference's per-crop
shapes (SURVEY.md §7.4).
"""

from densefusion_tpu.data.schema import PoseSample, collate, IMAGENET_MEAN, IMAGENET_STD
from densefusion_tpu.data.ply import read_ply_vertices, write_ply
from densefusion_tpu.data.linemod import LineModDataset, LINEMOD_OBJLIST, LINEMOD_SYM
from densefusion_tpu.data.ycb import YCBDataset, YCB_SYM
from densefusion_tpu.data.cad import CADDataset
from densefusion_tpu.data.seg import (
    SegSample, SegDataset, LinemodSegDataset, collate_seg,
)
from densefusion_tpu.data.loader import BatchLoader, PrefetchIterator
from densefusion_tpu.data.fat import FATScene, verify_scene as verify_fat_scene
from densefusion_tpu.data.synthetic import (
    generate_linemod_style_dataset, generate_fat_style_scene,
)

__all__ = [
    "PoseSample", "collate", "IMAGENET_MEAN", "IMAGENET_STD",
    "read_ply_vertices", "write_ply",
    "LineModDataset", "LINEMOD_OBJLIST", "LINEMOD_SYM",
    "YCBDataset", "YCB_SYM", "CADDataset",
    "SegSample", "SegDataset", "LinemodSegDataset", "collate_seg",
    "BatchLoader", "PrefetchIterator",
    "FATScene", "verify_fat_scene",
    "generate_linemod_style_dataset", "generate_fat_style_scene",
]
