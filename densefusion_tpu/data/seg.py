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
