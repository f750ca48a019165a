"""LineMOD evaluation CLI (capability parity with ``tools/eval_linemod.py``):
SegNet-predicted masks ('eval' mode), PoseNet + 4 refinement iterations,
ADD (ADD-S for eggbox/glue) success at < 0.1 x model diameter, per-object and
overall rates, results log.

Example::

    python -m densefusion_tpu.cli.eval_linemod \
        --dataset_root /data/Linemod_preprocessed \
        --checkpoint trained_models/linemod/checkpoint_best_refine
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--iterations", type=int, default=4)
    p.add_argument("--num_points", type=int, default=500)
    p.add_argument("--crop_size", type=int, default=192)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--mode", default="eval", choices=["eval", "test"],
                   help="'eval' uses segnet_results masks; 'test' uses gt")
    p.add_argument("--output_dir", default="experiments/eval_result/linemod")
    p.add_argument("--objlist", type=int, nargs="*", default=None,
                   help="subset of LineMOD object ids (default: all 13)")
    p.add_argument("--num_mesh", type=int, default=500)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from densefusion_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    import numpy as np
    import jax

    from densefusion_tpu.data import LineModDataset, BatchLoader
    from densefusion_tpu.models import PoseNet, PoseRefineNet
    from densefusion_tpu.eval import InferencePipeline, pose_distances
    from densefusion_tpu.train import create_train_state, load_checkpoint
    from densefusion_tpu.utils.config import RunConfig
    from densefusion_tpu.utils.logging import setup_logger

    if not os.path.isdir(args.dataset_root):
        raise SystemExit(
            f"error: dataset root not found: {args.dataset_root!r} "
            f"(expected the layout described in docs/DATA.md)")
    if not os.path.isdir(args.checkpoint):
        raise SystemExit(
            f"error: checkpoint directory not found: {args.checkpoint!r}")
    os.makedirs(args.output_dir, exist_ok=True)
    logger = setup_logger(
        "eval_linemod", os.path.join(args.output_dir, "eval_result_logs.txt"))

    ds = LineModDataset(args.dataset_root, mode=args.mode,
                        num_points=args.num_points, crop_size=args.crop_size,
                        num_mesh_points=args.num_mesh, objlist=args.objlist)
    diameters = ds.diameters() * 0.1  # thresholds (eval_linemod.py:61)
    loader = BatchLoader(ds, args.batch_size, shuffle=False, drop_last=False,
                         num_workers=4)

    num_obj = len(ds.objlist)
    cfg = RunConfig.preset("linemod", num_points=args.num_points,
                           crop_size=args.crop_size)
    from densefusion_tpu.train import peek_config
    from densefusion_tpu.train.checkpoint import clamp_refine_iters
    ck_cfg = peek_config(args.checkpoint)
    args.iterations = clamp_refine_iters(args.checkpoint, args.iterations,
                                         logger)
    posenet = PoseNet(num_obj=num_obj, **(ck_cfg or cfg).decoder_flags())
    refiner = PoseRefineNet(num_obj=num_obj)
    sample = next(iter(loader.epoch(0)))
    state = create_train_state(posenet, refiner, cfg, jax.random.key(0),
                               sample)
    state, _, _ = load_checkpoint(args.checkpoint, state,
                                  restore_opt=False)
    pipe = InferencePipeline(posenet, refiner, refine_iters=args.iterations)

    dist_fn = jax.jit(lambda m, q, t, tgt, sym: pose_distances(
        m, q, t, tgt, sym))

    success = np.zeros(num_obj)
    counts = np.zeros(num_obj)
    frame = 0
    for batch in loader.epoch(0):
        quat, trans, _conf = pipe(state.params_pose, state.params_refine,
                                  batch.img, batch.points, batch.choose,
                                  batch.obj_idx)
        dis = np.asarray(dist_fn(batch.model_points, quat, trans,
                                 batch.target, batch.sym))
        for b in range(len(dis)):
            if not batch.valid[b]:
                logger.info(f"No.{frame} NOT Pass! Lost detection!")
                frame += 1
                continue
            o = int(batch.obj_idx[b])
            ok = dis[b] < diameters[o]
            success[o] += ok
            counts[o] += 1
            logger.info(f"No.{frame} {'Pass!' if ok else 'NOT Pass!'} "
                        f"Distance: {dis[b]:.6f}")
            frame += 1

    for i, obj in enumerate(ds.objlist):
        rate = success[i] / counts[i] if counts[i] else float("nan")
        logger.info(f"Object {obj} success rate: {rate}")
    total = success.sum() / max(counts.sum(), 1)
    logger.info(f"ALL success rate: {total}")
    return total


if __name__ == "__main__":
    main()
