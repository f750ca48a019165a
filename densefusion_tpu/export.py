"""Deployment export: checkpoint -> serialized StableHLO inference artifact.

Packages the WHOLE jitted estimate+refine program (PoseNet forward, argmax-
confidence selection, K ``lax.scan`` refinement iterations — the graph of
:class:`densefusion_tpu.eval.InferencePipeline`) with the checkpoint's
parameters baked in as constants, via ``jax.export``. The artifact is a
single versioned blob loadable WITHOUT this package (only jax) on any of the
lowered platforms — the deployment story the reference (torch ``.pth`` +
source tree) does not have.

Example::

    from densefusion_tpu.export import export_inference, load_exported
    blob = export_inference("trained_models/linemod/checkpoint_best_refine",
                            batch=8)
    open("posenet.shlo", "wb").write(blob)
    ...
    fn = load_exported(open("posenet.shlo", "rb").read())
    quat, trans, conf = fn(img, points, choose, obj)
"""

from __future__ import annotations

import json
import os


def export_inference(ckpt_path: str, batch: int,
                     refine_iters: int = 2, bf16: bool = False,
                     platforms: tuple[str, ...] | None = None) -> bytes:
    """Serialize the inference program for a fixed batch size.

    Shapes come from the checkpoint's own ``config.json``; ``platforms``
    defaults to ``("cpu", "tpu")`` so one artifact serves both (lowering is
    ahead-of-time; no TPU needed to export).
    """
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    from densefusion_tpu.data import collate
    from densefusion_tpu.data.schema import PoseSample
    from densefusion_tpu.eval import InferencePipeline
    from densefusion_tpu.models import PoseNet, PoseRefineNet
    from densefusion_tpu.train import create_train_state, load_checkpoint
    from densefusion_tpu.utils.config import RunConfig

    with open(os.path.join(ckpt_path, "config.json")) as f:
        cfg = RunConfig(**json.load(f))
    from densefusion_tpu.train.checkpoint import clamp_refine_iters
    refine_iters = clamp_refine_iters(ckpt_path, refine_iters)
    dtype = jnp.bfloat16 if bf16 else None
    posenet = PoseNet(num_obj=cfg.num_objects, dtype=dtype,
                      **cfg.decoder_flags())
    refiner = PoseRefineNet(num_obj=cfg.num_objects, dtype=dtype)
    dummy = collate([PoseSample.invalid(cfg.num_points, cfg.num_mesh_points,
                                        cfg.crop_size)])
    state = create_train_state(posenet, refiner, cfg, jax.random.key(0),
                               dummy)
    state, _, _ = load_checkpoint(ckpt_path, state, restore_opt=False)
    pipe = InferencePipeline(posenet, refiner, refine_iters=refine_iters)
    params_pose = jax.device_get(state.params_pose)
    params_refine = jax.device_get(state.params_refine)

    def infer(img, points, choose, obj):
        return pipe._infer(params_pose, params_refine,
                           img, points, choose, obj)

    b, c, n = batch, cfg.crop_size, cfg.num_points
    args = (jnp.zeros((b, c, c, 3), jnp.float32),
            jnp.zeros((b, n, 3), jnp.float32),
            jnp.zeros((b, n), jnp.int32),
            jnp.zeros((b,), jnp.int32))
    exp = jexport.export(jax.jit(infer),
                         platforms=list(platforms or ("cpu", "tpu")))(*args)
    return exp.serialize()


def load_exported(blob: bytes):
    """Deserialize an artifact -> ``fn(img, points, choose, obj) ->
    (quat, trans, conf)``. Needs only jax at load time."""
    from jax import export as jexport

    exp = jexport.deserialize(blob)
    return exp.call
