"""customCAD evaluation CLI (capability parity with ``tools/eval_cad.py``):
PoseNet + 4 refinement iterations on the CAD test split, dumps predicted /
target point clouds as PLY for visual inspection, and (fixing the reference's
dead tail code, ``tools/eval_cad.py:143-147``) reports actual ADD success
rates at a configurable threshold.

Example::

    python -m densefusion_tpu.cli.eval_cad --dataset_root datasets/cad \
        --checkpoint trained_models/cad/checkpoint_best_pose
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
    p.add_argument("--success_threshold_m", type=float, default=0.01)
    p.add_argument("--dump_ply_frames", type=int, default=3,
                   help="dump pred/target clouds for the first N frames")
    p.add_argument("--output_dir", default="experiments/eval_result/cad")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from densefusion_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    import numpy as np
    import jax

    from densefusion_tpu.data import CADDataset, BatchLoader, write_ply
    from densefusion_tpu.geometry import quat_to_matrix
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
    logger = setup_logger("eval_cad",
                          os.path.join(args.output_dir, "eval_log.txt"))

    ds = CADDataset(args.dataset_root, mode="test",
                    num_points=args.num_points, crop_size=args.crop_size)
    loader = BatchLoader(ds, 1, shuffle=False, drop_last=False, num_workers=1)
    num_obj = len(ds.objlist)
    cfg = RunConfig.preset("cad", num_points=args.num_points,
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
    dist_fn = jax.jit(pose_distances)

    successes, total = 0, 0
    for i, batch in enumerate(loader.epoch(0)):
        if not batch.valid[0]:
            logger.info(f"No.{i} Lost detection")
            continue
        quat, trans, _ = pipe(state.params_pose, state.params_refine,
                              batch.img, batch.points, batch.choose,
                              batch.obj_idx)
        dis = float(np.asarray(dist_fn(batch.model_points, quat, trans,
                                       batch.target, batch.sym))[0])
        ok = dis < args.success_threshold_m
        successes += ok
        total += 1
        logger.info(f"No.{i} {'Pass' if ok else 'FAIL'} dis {dis:.6f}")

        if i < args.dump_ply_frames:  # visual QA (tools/eval_cad.py:130-139)
            R = np.asarray(quat_to_matrix(quat))[0]
            pred = np.asarray(batch.model_points)[0] @ R.T + \
                np.asarray(trans)[0]
            write_ply(os.path.join(args.output_dir,
                                   f"pred_pcld_{i}.ply"), pred)
            write_ply(os.path.join(args.output_dir,
                                   f"target_pcld_{i}.ply"),
                      np.asarray(batch.target)[0])

    rate = successes / max(total, 1)
    logger.info(f"success rate @ {args.success_threshold_m} m: {rate}")
    return rate


if __name__ == "__main__":
    main()
