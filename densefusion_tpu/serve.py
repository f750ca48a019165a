"""Serving API: checkpoint -> pose estimates from raw RGB-D inputs.

The library-call face of the framework (the reference only exposes eval
scripts): wraps host-side sample assembly (mask -> bbox ladder -> choose ->
back-projection -> canonical crop) and the jitted estimate+refine pipeline
behind one object. Batch calls pipeline multiple detections per device
dispatch; inputs with the same configuration reuse the compiled program.

Example::

    est = PoseEstimator.from_checkpoint("trained_models/linemod/"
                                        "checkpoint_best_refine", num_obj=13)
    quat, trans, conf = est.estimate(rgb, depth, mask, obj_idx=0,
                                     intrinsics=LINEMOD_CAM,
                                     unit_scale=1e-3)
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from densefusion_tpu.geometry.camera import CameraIntrinsics
from densefusion_tpu.geometry.bbox import bbox_from_mask
from densefusion_tpu.data.common import assemble_sample
from densefusion_tpu.data.schema import PoseSample, collate


class PoseEstimator:
    def __init__(self, posenet, refiner, params_pose, params_refine,
                 num_points: int = 500, crop_size: int = 192,
                 refine_iters: int = 2, seed: int = 0, mesh=None):
        """``mesh`` (a ``jax.sharding.Mesh`` with a ``data`` axis) enables
        multi-chip serving: params replicate once, every batch shards over
        the axis (padded to the device count with invalid samples), and XLA
        runs the one compiled program SPMD — the serving analog of the
        training data parallelism."""
        from densefusion_tpu.eval import InferencePipeline
        self.posenet = posenet
        self.refiner = refiner
        self.params_pose = params_pose
        self.params_refine = params_refine
        self.num_points = num_points
        self.crop_size = crop_size
        self.pipeline = InferencePipeline(posenet, refiner,
                                          refine_iters=refine_iters)
        self.rng = np.random.default_rng(seed)
        self.mesh = mesh
        self._shard_batch = None
        if mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P
            from densefusion_tpu.parallel import make_shard_batch_fn
            self._shard_batch = make_shard_batch_fn(mesh)
            rep = NamedSharding(mesh, P())
            self.params_pose = jax.device_put(self.params_pose, rep)
            if self.params_refine is not None:
                self.params_refine = jax.device_put(self.params_refine, rep)

    @classmethod
    def from_checkpoint(cls, path: str, num_obj: int,
                        num_points: int = 500, crop_size: int = 192,
                        refine_iters: int | None = None, bf16: bool = False,
                        **kwargs) -> "PoseEstimator":
        """``refine_iters=None`` (default) uses the checkpoint's TRAINED
        composition depth (falling back to 2): running a refiner deeper at
        serve time than it was trained diverges on predicted-mask clouds
        (measured, docs/PERF.md round 5)."""
        import jax
        import jax.numpy as jnp
        from densefusion_tpu.models import PoseNet, PoseRefineNet
        from densefusion_tpu.train import create_train_state, load_checkpoint
        from densefusion_tpu.utils.config import RunConfig

        from densefusion_tpu.train.checkpoint import peek_config

        dtype = jnp.bfloat16 if bf16 else None
        from densefusion_tpu.train.checkpoint import clamp_refine_iters
        ck_cfg = peek_config(path)
        if refine_iters is None:
            refine_iters = getattr(ck_cfg, "refine_iters", None) or 2
        refine_iters = clamp_refine_iters(path, refine_iters)
        flags = ck_cfg.decoder_flags() if ck_cfg is not None else {}
        posenet = PoseNet(num_obj=num_obj, dtype=dtype, **flags)
        refiner = PoseRefineNet(num_obj=num_obj, dtype=dtype)
        dummy = collate([PoseSample.invalid(num_points, 8, crop_size)])
        cfg = RunConfig(num_objects=num_obj, num_points=num_points,
                        crop_size=crop_size)
        state = create_train_state(posenet, refiner, cfg, jax.random.key(0),
                                   dummy)
        state, _, _ = load_checkpoint(path, state, restore_opt=False)
        return cls(posenet, refiner, state.params_pose, state.params_refine,
                   num_points=num_points, crop_size=crop_size,
                   refine_iters=refine_iters, **kwargs)

    # -- host-side assembly ----------------------------------------------

    def make_sample(self, rgb: np.ndarray, depth: np.ndarray,
                    mask: np.ndarray, obj_idx: int,
                    intrinsics: CameraIntrinsics,
                    unit_scale: float = 1.0,
                    bbox: tuple[int, int, int, int] | None = None
                    ) -> PoseSample:
        """Raw frame + object mask -> one PoseSample (model-free: target /
        model_points are placeholders; serving only needs the estimate)."""
        mask = np.asarray(mask, bool) & (np.asarray(depth) != 0)
        if bbox is None:
            bb = bbox_from_mask(mask)
            if bb is None:
                return PoseSample.invalid(self.num_points, 8, self.crop_size)
            bbox = bb
        cam = intrinsics

        def point_fn(rows, cols):
            z = np.asarray(depth)[rows, cols].astype(np.float32) \
                / cam.depth_scale
            x3 = (cols.astype(np.float32) - cam.cx) * z / cam.fx
            y3 = (rows.astype(np.float32) - cam.cy) * z / cam.fy
            return np.stack([x3, y3, z], -1) * unit_scale

        placeholder = np.zeros((8, 3), np.float32)
        return assemble_sample(
            rgb=np.asarray(rgb)[..., :3], mask=mask, bbox=bbox,
            point_fn=point_fn, model_points=placeholder, target=placeholder,
            obj_idx=obj_idx, sym=False, num_points=self.num_points,
            crop_size=self.crop_size, rng=self.rng)

    # -- inference --------------------------------------------------------

    def estimate_batch(self, samples: Sequence[PoseSample]):
        """-> (quat (B, 4) wxyz, trans (B, 3) meters, conf (B,),
        valid (B,) bool)."""
        samples = list(samples)
        n = len(samples)
        if self.mesh is not None:
            n_dev = self.mesh.shape["data"]
            m = samples[0].model_points.shape[0]
            while len(samples) % n_dev:
                samples.append(PoseSample.invalid(self.num_points, m,
                                                  self.crop_size))
        batch = collate(samples)
        if self._shard_batch is not None:
            batch = self._shard_batch(batch)
        quat, trans, conf = self.pipeline(
            self.params_pose, self.params_refine,
            batch.img, batch.points, batch.choose, batch.obj_idx)
        return (np.asarray(quat)[:n], np.asarray(trans)[:n],
                np.asarray(conf)[:n], np.asarray(batch.valid)[:n])

    def estimate(self, rgb, depth, mask, obj_idx, intrinsics,
                 unit_scale: float = 1.0, bbox=None):
        """Single-detection convenience -> (quat (4,), trans (3,), conf) or
        None for an empty mask (lost detection)."""
        sample = self.make_sample(rgb, depth, mask, obj_idx, intrinsics,
                                  unit_scale, bbox)
        if not sample.valid:
            return None
        q, t, c, _ = self.estimate_batch([sample])
        return q[0], t[0], float(c[0])

    def estimate_frame(self, rgb, depth, label, intrinsics,
                       unit_scale: float = 1.0,
                       object_ids: Sequence[int] | None = None,
                       min_pixels: int = 50,
                       label_to_class=lambda label_id: label_id - 1):
        """All objects of one frame in ONE device dispatch.

        ``label`` is an integer object-id map (SegNet argmax output or
        PoseCNN labels — the role of ``segnet_results`` /
        ``tools/eval_ycb.py:152``'s per-roi masks); every id present (or the
        ids in ``object_ids``) with at least ``min_pixels`` depth-valid
        pixels becomes one detection, and the whole frame is estimated as a
        single batch — the serving pattern the reference's per-roi python
        loop (``tools/eval_ycb.py:147``) cannot express.

        Returns ``{label_id: (quat (4,) wxyz, trans (3,), conf)}``;
        undetected / too-small objects are simply absent.
        """
        label = np.asarray(label)
        ids = (sorted(int(i) for i in np.unique(label) if i != 0)
               if object_ids is None else list(object_ids))
        samples, kept = [], []
        for i in ids:
            sample = self.make_sample(rgb, depth, label == i,
                                      label_to_class(i), intrinsics,
                                      unit_scale)
            if sample.valid and int(np.count_nonzero(
                    (label == i) & (np.asarray(depth) != 0))) >= min_pixels:
                samples.append(sample)
                kept.append(i)
        if not samples:
            return {}
        quat, trans, conf, _ = self.estimate_batch(samples)
        return {i: (quat[k], trans[k], float(conf[k]))
                for k, i in enumerate(kept)}
