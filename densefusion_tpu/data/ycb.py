"""YCB-Video dataset reader.

Covers the capabilities of ``datasets/ycb/dataset.py:18-244``: real+synthetic
frame lists, two intrinsics sets selected by video index, random object pick
per frame (≥50 valid depth pixels), synthetic-frame augmentation (real
background compositing behind the render, two foreground object crops pasted
from another synthetic frame, gaussian pixel noise), ColorJitter, translation
noise, 1000-point clouds, 500 (train) / 2600 (refine) mesh points, symmetric
classes {12, 15, 18, 19, 20}.
"""

from __future__ import annotations

import os

import numpy as np

from densefusion_tpu.geometry.bbox import bbox_from_mask
from densefusion_tpu.geometry.camera import YCB_CAM_1, YCB_CAM_2
from densefusion_tpu.data.schema import PoseSample
from densefusion_tpu.data.common import (
    assemble_sample, subsample_model_points, pinhole_point_fn,
)
from densefusion_tpu.data.augment import (
    jitter_params, apply_color_jitter, translation_noise,
    gaussian_pixel_noise,
)
from densefusion_tpu.data.cache import ImageCache

YCB_SYM = [12, 15, 18, 19, 20]  # datasets/ycb/dataset.py:89
YCB_NUM_OBJECTS = 21


def _load_image(path: str) -> np.ndarray:
    from PIL import Image
    return np.array(Image.open(path))


def _load_mat(path: str):
    import scipy.io as scio
    return scio.loadmat(path)


class YCBDataset:
    def __init__(self, root: str, mode: str = "train", num_points: int = 1000,
                 add_noise: bool | None = None, noise_trans: float = 0.03,
                 refine: bool = False, crop_size: int = 192,
                 config_dir: str | None = None, seed: int = 0,
                 minimum_num_pt: int = 50, cache_frames: int = 2048):
        self.root = root
        self.mode = mode
        self.num_points = num_points
        self.add_noise = (mode == "train") if add_noise is None else add_noise
        self.noise_trans = noise_trans
        self.refine = refine
        self.crop_size = crop_size
        self.minimum_num_pt = minimum_num_pt
        self.seed = seed
        self._epoch = 0
        self.cache = ImageCache(cache_frames)
        self._label_ids: dict[str, list] = {}
        self._meta_cache: dict[str, tuple] = {}
        self._meta_cap = max(4 * cache_frames, 256)
        # 500 normal / 2600 once refinement starts (dataset.py:90-91)
        self.num_mesh = 2600 if refine else 500

        cfg = config_dir or os.path.join(root, "dataset_config")
        list_file = os.path.join(
            cfg, "train_data_list.txt" if mode == "train"
            else "test_data_list.txt")
        with open(list_file) as f:
            self.frames = [ln.strip() for ln in f if ln.strip()]
        # real frames start with 'data/', synthetic are 'data_syn/...'
        self.real = [fr for fr in self.frames if fr.startswith("data/")]
        self.syn = [fr for fr in self.frames if not fr.startswith("data/")]

        with open(os.path.join(cfg, "classes.txt")) as f:
            self.classes = [ln.strip() for ln in f if ln.strip()]
        self.models: dict[int, np.ndarray] = {}
        for cid, cls in enumerate(self.classes, start=1):
            pts_file = os.path.join(root, "models", cls, "points.xyz")
            self.models[cid] = np.loadtxt(pts_file, dtype=np.float32)

    def __len__(self):
        return len(self.frames)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _rng(self, index: int) -> np.random.Generator:
        """Per-(seed, epoch, sample) generator: thread-safe under the loader
        pool and bit-reproducible regardless of worker scheduling."""
        return np.random.default_rng((self.seed, self._epoch, index))

    @property
    def sym_list(self) -> list[int]:
        return list(YCB_SYM)

    @property
    def num_points_mesh(self) -> int:
        return self.num_mesh

    def _intrinsics(self, frame: str):
        """Video index >= 60 switches cameras (dataset.py:103-112)."""
        if frame.startswith("data/") and int(frame[5:9]) >= 60:
            return YCB_CAM_2
        return YCB_CAM_1

    def _frame_paths(self, frame: str):
        base = os.path.join(self.root, frame)
        return (base + "-color.png", base + "-depth.png",
                base + "-label.png", base + "-meta.mat")

    def frame_info(self, index: int):
        """(rgb_path, intrinsics) behind sample ``index`` — for qualitative
        overlay rendering (``cli.visualize``)."""
        frame = self.frames[index]
        return self._frame_paths(frame)[0], self._intrinsics(frame)

    def _load_meta(self, path: str) -> tuple:
        """Cached (cls_indexes, poses, factor_depth) — the .mat parse was
        ~8% of the warm sample time and the result is static per frame."""
        got = self._meta_cache.get(path)
        if got is not None:
            return got
        meta = _load_mat(path)
        got = (meta["cls_indexes"].flatten().astype(np.int32),
               meta["poses"], float(meta["factor_depth"].flatten()[0]))
        if len(self._meta_cache) >= self._meta_cap:   # FIFO-ish bound
            self._meta_cache.pop(next(iter(self._meta_cache)), None)
        self._meta_cache[path] = got
        return got

    def _composite_front(self, label: np.ndarray, depth: np.ndarray,
                         rng: np.random.Generator):
        """Paste two object masks from another synthetic frame as occluders
        (dataset.py:116-137): their pixels are removed from the current label
        so the occluded object's visible mask shrinks. Jitter is applied once
        on the final crop (assemble_sample) rather than per source frame —
        full-frame HSV jitter x3 was the loader's dominant cost.

        Returns (label, mask_front, front, counts, bboxes); with the v4
        native kernels the per-id depth-valid counts and tight bboxes of the
        occluded label come out of the SAME frame pass (counts/bboxes are
        None on the fallback paths or when no occluder was accepted)."""
        from densefusion_tpu import native
        fused = (native.fused_scan_supported()
                 and depth.dtype == np.uint16 and label.dtype == np.uint8)
        use_native = fused or native.loader_kernels_supported()
        for _ in range(5):
            seed_frame = self.syn[rng.integers(len(self.syn))]
            c_path, _, l_path, _ = self._frame_paths(seed_frame)
            front = self.cache.load(c_path)[..., :3]
            f_label = self.cache.load(l_path)
            ids = self._label_ids.get(l_path)
            if ids is None:   # per-path object-id cache (np.unique was hot)
                ids = [i for i in np.unique(f_label) if i != 0]
                self._label_ids[l_path] = ids
            if len(ids) < 2:
                continue
            pick = rng.choice(ids, size=2, replace=False)
            if fused:        # one GIL-free pass incl. hist+bbox (dfnative v4)
                t_label, mask_front, count, counts, bboxes = \
                    native.apply_front_hist_bbox(
                        label, f_label, depth, int(pick[0]), int(pick[1]))
                if count > 1000:
                    return t_label, mask_front, front, counts, bboxes
            elif use_native:   # v3: separate hist pass follows
                t_label, mask_front, count = native.apply_front(
                    label, f_label, int(pick[0]), int(pick[1]))
                if count > 1000:
                    return t_label, mask_front, front, None, None
            else:
                mask_front = ~np.isin(f_label, pick)  # True = NOT occluded
                t_label = label * mask_front
                if (t_label != 0).sum() > 1000:
                    return t_label, mask_front, front, None, None
        return label, None, None, None, None

    def __getitem__(self, index: int) -> PoseSample:
        rng = self._rng(index)
        frame = self.frames[index]
        c_path, d_path, l_path, m_path = self._frame_paths(frame)
        rgb = self.cache.load(c_path)[..., :3]
        depth = self.cache.load(d_path)
        label = self.cache.load(l_path)
        objs, poses, cam_scale = self._load_meta(m_path)
        is_syn = not frame.startswith("data/")

        from densefusion_tpu import native
        kernels_ok = depth.dtype == np.uint16 and label.dtype == np.uint8
        fused = native.fused_scan_supported() and kernels_ok
        use_native = fused or (native.loader_kernels_supported()
                               and kernels_ok)

        mask_front = None
        front = None
        counts = bboxes = None
        if self.add_noise:
            label, mask_front, front, counts, bboxes = \
                self._composite_front(label, depth, rng)

        # random object with enough valid pixels (dataset.py:141-147)
        order = rng.permutation(len(objs))
        pick = None
        if fused:
            if counts is None:   # no accepted occluder: one hist+bbox pass
                counts, bboxes = native.label_hist_bbox(label, depth)
            for k in order:
                if counts[objs[k]] > self.minimum_num_pt:
                    pick = k
                    break
        elif use_native:
            counts = native.label_depth_hist(label, depth)
            for k in order:
                if counts[objs[k]] > self.minimum_num_pt:
                    pick = k
                    break
        else:
            mask_depth = depth != 0
            for k in order:
                mask_label = label == objs[k]
                if (mask_label & mask_depth).sum() > self.minimum_num_pt:
                    pick = k
                    break
        if pick is None:
            return PoseSample.invalid(self.num_points, self.num_mesh,
                                      self.crop_size)
        obj_id = int(objs[pick])
        mask = None
        mask_fn = None
        if fused:
            # bbox came out of the hist pass; the mask is produced later for
            # just the snapped crop window (the only region ever read)
            bb = bboxes[obj_id]
            bbox = None if bb[0] < 0 else tuple(int(v) for v in bb)

            def mask_fn(rmin, rmax, cmin, cmax, _label=label):
                return native.object_mask_window(
                    _label, depth, obj_id, rmin, rmax, cmin, cmax)
        elif use_native:
            # one pass: label mask, depth-valid mask, tight bbox
            mask_label, mask, bbox, _ = native.object_mask(label, depth,
                                                           obj_id)
        else:
            mask_label = label == obj_id
            mask = mask_label & (depth != 0)
            bbox = bbox_from_mask(mask_label, largest_component=False)

        back = None
        if is_syn:  # real background behind the render (dataset.py:155-159)
            back_frame = self.real[rng.integers(len(self.real))]
            back = self.cache.load(self._frame_paths(back_frame)[0])[..., :3]

        if bbox is None:
            return PoseSample.invalid(self.num_points, self.num_mesh,
                                      self.crop_size)

        # the consumed pixels are the snapped CROP — compositing / noise /
        # jitter run on the crop window only (full-frame np.where + full-frame
        # gaussian draws were the loader's top costs; same pixels, ~8x less
        # work than the reference's whole-frame ops, dataset.py:155-167)
        noise_seed = int(rng.integers(2 ** 63)) if is_syn else 0
        jitter = (jitter_params(rng) if self.add_noise else None)

        def crop_fn(rmin, rmax, cmin, cmax):
            win = np.s_[rmin:rmax, cmin:cmax]
            crop = rgb[win]
            if use_native and (back is not None or mask_front is not None):
                crop = native.compose_crop(
                    crop, None if back is None else back[win],
                    None if back is None else label[win],
                    None if mask_front is None else front[win],
                    None if mask_front is None else mask_front[win])
            else:
                if back is not None:
                    crop = np.where((label[win] == 0)[..., None], back[win],
                                    crop)
                if mask_front is not None:
                    crop = np.where(mask_front[win][..., None], crop,
                                    front[win])
            if jitter is not None:
                crop = apply_color_jitter(crop, jitter)
            if is_syn:
                crop = gaussian_pixel_noise(crop, rng, 7.0, seed=noise_seed)
            return crop

        pose = poses[:, :, pick]
        R_gt = pose[:, :3].astype(np.float64)
        t_gt = pose[:, 3].astype(np.float64)

        cam = self._intrinsics(frame)

        add_t = (translation_noise(rng, self.noise_trans)
                 if self.add_noise else None)

        model = subsample_model_points(self.models[obj_id], self.num_mesh,
                                       rng)
        target = model @ R_gt.T + t_gt
        point_fn = pinhole_point_fn(depth, cam, cam_scale)

        return assemble_sample(
            crop_fn=crop_fn, mask=mask, mask_fn=mask_fn,
            frame_hw=label.shape, bbox=bbox, point_fn=point_fn,
            model_points=model, target=target,
            obj_idx=obj_id - 1,  # 0-based class (dataset.py:232)
            sym=(obj_id - 1) in YCB_SYM,
            num_points=self.num_points, crop_size=self.crop_size,
            rng=rng, add_t=add_t,
        )


class YCBPoseCNNEvalDataset:
    """YCB keyframe eval set driven by PoseCNN detections.

    Capability parity with the inline preprocessing of ``tools/eval_ycb.py``
    (:54-190): for each of the 2949 keyframes, each PoseCNN roi becomes one
    sample — bbox from the roi (snapped to the ladder), mask from the PoseCNN
    label image ∧ valid depth, 1000-point cloud at cam_scale 10000. The
    ground-truth pose from the frame meta rides along so ADD(-S) metrics are
    computed in-repo (replacing the MATLAB toolbox).

    Iteration yields ``(PoseSample, frame_index, itemid)`` per detection.
    """

    def __init__(self, root: str, posecnn_results_dir: str,
                 num_points: int = 1000, crop_size: int = 192,
                 config_dir: str | None = None, num_keyframes: int = 2949,
                 seed: int = 0, native_crop: bool = False):
        self.root = root
        self.posecnn_dir = posecnn_results_dir
        self.native_crop = native_crop
        self.num_points = num_points
        self.crop_size = crop_size
        self.rng = np.random.default_rng(seed)
        cfg = config_dir or os.path.join(root, "dataset_config")
        with open(os.path.join(cfg, "test_data_list.txt")) as f:
            self.frames = [ln.strip() for ln in f if ln.strip()]
        self.frames = self.frames[:num_keyframes]
        with open(os.path.join(cfg, "classes.txt")) as f:
            self.classes = [ln.strip() for ln in f if ln.strip()]
        self.models: dict[int, np.ndarray] = {}
        for cid, cls in enumerate(self.classes, start=1):
            pts_file = os.path.join(root, "models", cls, "points.xyz")
            self.models[cid] = np.loadtxt(pts_file, dtype=np.float32)

    def __len__(self):
        return len(self.frames)

    def detections(self, frame_idx: int):
        """All PoseCNN detections of one keyframe."""
        frame = self.frames[frame_idx]
        base = os.path.join(self.root, frame)
        rgb = _load_image(base + "-color.png")[..., :3]
        depth = _load_image(base + "-depth.png")
        meta = _load_mat(base + "-meta.mat")
        posecnn = _load_mat(os.path.join(self.posecnn_dir,
                                         f"{frame_idx:06d}.mat"))
        label = np.asarray(posecnn["labels"])
        rois = np.asarray(posecnn["rois"])

        cam = YCB_CAM_1  # keyframes are all video < 60 (tools/eval_ycb.py:37)
        cam_scale = 10000.0
        gt_ids = meta["cls_indexes"].flatten().astype(np.int32)

        out = []
        for k in range(rois.shape[0]):
            itemid = int(rois[k, 1])
            # roi bbox (tools/eval_ycb.py:55-58)
            rmin, rmax = int(rois[k][3]) + 1, int(rois[k][5]) - 1
            cmin, cmax = int(rois[k][2]) + 1, int(rois[k][4]) - 1
            mask = (label == itemid) & (depth != 0)

            model = subsample_model_points(self.models[itemid], 500, self.rng)
            point_fn = pinhole_point_fn(depth, cam, cam_scale)
            # gt pose rides along for in-loop diagnostics; protocol scoring
            # pairs detections with gt by class in eval/ycb_toolbox.py
            # (evaluate_poses_keyframe.m:75) using the FULL model cloud
            which = np.flatnonzero(gt_ids == itemid)
            if which.size:
                pose = meta["poses"][:, :, which[0]]
                target = model @ pose[:, :3].astype(np.float64).T + \
                    pose[:, 3].astype(np.float64)
            else:
                target = model  # false positive: no gt — scorer skips it

            # a false positive with a usable mask still gets a pose estimate
            # (the reference zeroes poses only on empty masks,
            # tools/eval_ycb.py:234-237); only unusable masks are invalid
            sample = assemble_sample(
                rgb=rgb, mask=mask, bbox=(rmin, rmax, cmin, cmax),
                point_fn=point_fn, model_points=model, target=target,
                obj_idx=itemid - 1, sym=(itemid - 1) in YCB_SYM,
                num_points=self.num_points, crop_size=self.crop_size,
                rng=self.rng, native_crop=self.native_crop)
            out.append((sample, frame_idx, itemid))
        return out
