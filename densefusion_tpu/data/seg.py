"""Segmentation dataset (full 480x640 frames + per-pixel labels).

Covers ``vanilla_segmentation/data_controller.py:17-97``: YCB frames with
22-class labels, synthetic-frame background compositing using the label-0
mask, random horizontal/vertical flips (applied jointly to rgb and label),
ColorJitter on training frames.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Sequence

import numpy as np

from densefusion_tpu.data.schema import normalize_image
from densefusion_tpu.data.augment import color_jitter


class SegSample(NamedTuple):
    rgb: np.ndarray    # (H, W, 3) f32 normalized
    label: np.ndarray  # (H, W) int32


def collate_seg(samples: Sequence[SegSample]) -> SegSample:
    return SegSample(np.stack([s.rgb for s in samples]),
                     np.stack([s.label for s in samples]))


def _load_image(path: str):
    from PIL import Image
    return np.array(Image.open(path))


class LinemodSegDataset:
    """LineMOD-format segmentation frames: rgb + binary object mask ->
    object-id label maps.

    Enables training ONE multi-object SegNet whose per-class argmax masks
    (written by ``cli.segment --binary_class <obj>``) fill the
    ``segnet_results/`` directory that ``LineModDataset(mode='eval')``
    consumes — the reference shipped those masks precomputed
    (``datasets/linemod/dataset.py:57-58``) with no in-repo trainer for
    them; this closes that loop. Labels are the raw LineMOD object ids
    (so ``num_classes`` must be ``max(objlist) + 1``; 16 for the full set).
    Train-mode augmentation matches :class:`SegDataset` (ColorJitter +
    joint flips, ``vanilla_segmentation/data_controller.py:53-82``).
    """

    def __init__(self, root: str, mode: str = "train",
                 objlist: Sequence[int] | None = None, seed: int = 0,
                 use_noise: bool | None = None):
        from densefusion_tpu.data.linemod import LINEMOD_OBJLIST
        self.root = root
        self.mode = mode
        self.use_noise = (mode == "train") if use_noise is None else use_noise
        self.seed = seed
        self._epoch = 0
        self.objlist = (list(objlist) if objlist is not None
                        else list(LINEMOD_OBJLIST))
        self.items: list[tuple[int, int]] = []
        for obj in self.objlist:
            list_file = os.path.join(
                root, "data", f"{obj:02d}",
                "train.txt" if mode == "train" else "test.txt")
            with open(list_file) as f:
                self.items += [(obj, int(ln)) for ln in f if ln.strip()]

    @property
    def num_classes(self) -> int:
        return max(self.objlist) + 1

    def __len__(self):
        return len(self.items)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __getitem__(self, index: int) -> SegSample:
        rng = np.random.default_rng((self.seed, self._epoch, index))
        obj, frame = self.items[index]
        base = os.path.join(self.root, "data", f"{obj:02d}")
        rgb = _load_image(
            os.path.join(base, "rgb", f"{frame:04d}.png"))[..., :3]
        mask = _load_image(os.path.join(base, "mask", f"{frame:04d}.png"))
        mask = mask == 255
        if mask.ndim == 3:
            mask = mask[..., 0]
        label = mask.astype(np.int32) * obj

        if self.use_noise:
            rgb = color_jitter(rgb, rng)
            if rng.random() < 0.5:
                rgb, label = rgb[:, ::-1], label[:, ::-1]
            if rng.random() < 0.5:
                rgb, label = rgb[::-1], label[::-1]

        return SegSample(rgb=normalize_image(np.ascontiguousarray(rgb)),
                         label=np.ascontiguousarray(label))


class SegDataset:
    def __init__(self, root: str, mode: str = "train",
                 config_dir: str | None = None, seed: int = 0,
                 use_noise: bool | None = None):
        self.root = root
        self.mode = mode
        self.use_noise = (mode == "train") if use_noise is None else use_noise
        self.seed = seed
        self._epoch = 0
        cfg = config_dir or os.path.join(root, "dataset_config")
        list_file = os.path.join(
            cfg, "train_data_list.txt" if mode == "train"
            else "test_data_list.txt")
        with open(list_file) as f:
            self.frames = [ln.strip() for ln in f if ln.strip()]
        self.real = [fr for fr in self.frames if fr.startswith("data/")]

    def __len__(self):
        return len(self.frames)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __getitem__(self, index: int) -> SegSample:
        rng = np.random.default_rng((self.seed, self._epoch, index))
        frame = self.frames[index]
        base = os.path.join(self.root, frame)
        rgb = _load_image(base + "-color.png")[..., :3]
        label = _load_image(base + "-label.png").astype(np.int32)
        is_syn = not frame.startswith("data/")

        if self.use_noise:
            rgb = color_jitter(rgb, rng)
            if is_syn and self.real:
                back_frame = self.real[rng.integers(len(self.real))]
                back = _load_image(
                    os.path.join(self.root, back_frame) + "-color.png")[..., :3]
                rgb = np.where((label == 0)[..., None], back, rgb)
            # joint flips (data_controller.py:70-82)
            if rng.random() < 0.5:
                rgb, label = rgb[:, ::-1], label[:, ::-1]
            if rng.random() < 0.5:
                rgb, label = rgb[::-1], label[::-1]

        return SegSample(rgb=normalize_image(np.ascontiguousarray(rgb)),
                         label=np.ascontiguousarray(label))
