"""YCB-Video keyframe evaluation CLI.

Capability parity with ``tools/eval_ycb.py`` + the MATLAB toolbox
(``replace_ycb_toolbox/*.m``), fully in-repo, in two stages:

1. **Inference** (``tools/eval_ycb.py:136-240``): PoseNet + refinement on
   every PoseCNN detection over the keyframes, writing the same per-frame
   ``.mat`` pose results (``Densefusion_wo_refine_result`` /
   ``Densefusion_iterative_result``).
2. **Scoring** (``evaluate_poses_keyframe.m`` / ``plot_accuracy_keyframe.m``):
   iterate the frame's ground-truth objects, match detections by class,
   score misses as ``inf``, full model clouds, toolbox ``adi`` ADD-S
   direction, rotation/translation errors, VOCap AUC + <2cm — see
   ``densefusion_tpu.eval.ycb_toolbox``. Stage 2 is also available standalone
   as ``cli.score_ycb`` for scoring existing result directories.

Example::

    python -m densefusion_tpu.cli.eval_ycb \
        --dataset_root /data/YCB_Video_Dataset \
        --posecnn_results YCB_Video_toolbox/results_PoseCNN_RSS2018 \
        --checkpoint trained_models/ycb/checkpoint_best_refine
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--posecnn_results", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--iterations", type=int, default=None,
                   help="refiner composition depth at eval. Default: the "
                        "checkpoint's TRAINED refine_iters (falling back "
                        "to the reference's 2, tools/eval_ycb.py:33) — a "
                        "refiner composed deeper at eval than trained "
                        "diverges (docs/PERF.md round 5)")
    p.add_argument("--num_points", type=int, default=1000)
    p.add_argument("--crop_size", type=int, default=192)
    p.add_argument("--num_keyframes", type=int, default=2949)
    p.add_argument("--skip_done", action="store_true",
                   help="frame dispatch: skip keyframes whose per-frame "
                        "result .mat files already exist in the output "
                        "dirs — resume a long eval in a fresh process "
                        "(remote-tunnel transports leak host buffers at "
                        "~1 GiB/min of dispatches; docs/PERF.md round 5)")
    p.add_argument("--output_dir", default="experiments/eval_result/ycb")
    p.add_argument("--plots", action="store_true",
                   help="write per-class accuracy-threshold figures")
    p.add_argument("--dispatch", choices=("frame", "detection"),
                   default="frame",
                   help="'frame' (default): one device dispatch per keyframe"
                        " — all PoseCNN detections padded to a small static"
                        " bucket, unrefined+refined poses from one compiled"
                        " program. 'detection': the reference-shaped"
                        " batch-1-per-roi loop (tools/eval_ycb.py:147),"
                        " ~12k dispatches over the 2949 keyframes.")
    p.add_argument("--native_crops", choices=("auto", "on", "off"),
                   default="auto",
                   help="feed variable ladder-shape crops (the reference's "
                        "exact input geometry, tools/eval_ycb.py:150-163) "
                        "instead of resizing to --crop_size; 'auto' turns it "
                        "on for imported torch checkpoints (decoder='torch')."
                        " Overrides --dispatch with shape-bucketed batching.")
    p.add_argument("--batch_size", type=int, default=8,
                   help="shape-bucket batch size for --native_crops")
    return p


# static batch buckets: PoseCNN emits <= ~10 detections/frame (21 classes);
# padding to the next bucket keeps the number of compiled programs tiny
_BUCKETS = (1, 2, 4, 8, 16, 32)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return ((n + 31) // 32) * 32


def main(argv=None):
    args = build_parser().parse_args(argv)
    from densefusion_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    import numpy as np
    import jax
    import scipy.io as scio

    from densefusion_tpu.data import collate
    from densefusion_tpu.data.ycb import YCBPoseCNNEvalDataset
    from densefusion_tpu.models import PoseNet, PoseRefineNet
    from densefusion_tpu.eval import InferencePipeline
    from densefusion_tpu.eval.ycb_toolbox import (
        score_keyframes, summarize, plot_accuracy,
    )
    from densefusion_tpu.train import create_train_state, load_checkpoint
    from densefusion_tpu.utils.config import RunConfig
    from densefusion_tpu.utils.logging import setup_logger

    wo_dir = os.path.join(args.output_dir, "Densefusion_wo_refine_result")
    it_dir = os.path.join(args.output_dir, "Densefusion_iterative_result")
    os.makedirs(wo_dir, exist_ok=True)
    os.makedirs(it_dir, exist_ok=True)
    logger = setup_logger("eval_ycb",
                          os.path.join(args.output_dir, "eval_log.txt"))

    # honor the checkpoint's own architecture flags (e.g. the torch
    # importer's decoder="torch" align-corners mode)
    from densefusion_tpu.train import peek_config
    from densefusion_tpu.train.checkpoint import (
        clamp_refine_iters, refiner_is_trained,
    )
    ck_cfg = peek_config(args.checkpoint)
    if args.iterations is None:
        args.iterations = getattr(ck_cfg, "refine_iters", None) or 2
        logger.info(f"--iterations defaulting to the checkpoint's trained "
                    f"composition depth: {args.iterations}")
    native = args.native_crops == "on" or (
        args.native_crops == "auto"
        and getattr(ck_cfg, "decoder", None) == "torch")

    ds = YCBPoseCNNEvalDataset(args.dataset_root, args.posecnn_results,
                               num_points=args.num_points,
                               crop_size=args.crop_size,
                               num_keyframes=args.num_keyframes,
                               native_crop=native)
    num_obj = len(ds.classes)
    cfg = RunConfig.preset("ycb", num_points=args.num_points,
                           crop_size=args.crop_size)
    refiner_trained = refiner_is_trained(args.checkpoint)
    args.iterations = clamp_refine_iters(args.checkpoint, args.iterations,
                                         logger)
    posenet = PoseNet(num_obj=num_obj, **(ck_cfg or cfg).decoder_flags())
    refiner = PoseRefineNet(num_obj=num_obj)

    # -- stage 1: pose inference over PoseCNN detections -------------------
    state = None

    def load_state(batch):
        nonlocal state
        if state is None:
            state = create_train_state(posenet, refiner, cfg,
                                       jax.random.key(0), batch)
            state, _, _ = load_checkpoint(args.checkpoint, state,
                                          restore_opt=False)
        return state

    if native:
        # variable ladder shapes (the reference's exact input geometry):
        # shape-bucketed batches ACROSS keyframes — poses accumulate in
        # memory (2949 frames x ~4 detections x 7 floats) and the .mat
        # files are written in frame order at the end
        from densefusion_tpu.eval import ShapeBucketedDispatcher

        pipe = InferencePipeline(posenet, refiner,
                                 refine_iters=args.iterations,
                                 return_unrefined=True)

        def run(batch):
            st = load_state(batch)
            q0, t0, q, t, _ = pipe(st.params_pose, st.params_refine,
                                   batch.img, batch.points, batch.choose,
                                   batch.obj_idx)
            return q0, t0, q, t

        disp = ShapeBucketedDispatcher(run, batch_size=args.batch_size)
        wo_all: dict[int, list] = {}
        it_all: dict[int, list] = {}

        def store(key, res):
            f, k = key
            q0, t0, q, t = res
            wo_all[f][k] = np.concatenate([q0, t0]).tolist()
            it_all[f][k] = np.concatenate([q, t]).tolist()

        for frame_idx in range(len(ds)):
            dets = ds.detections(frame_idx)
            wo_all[frame_idx] = [[0.0] * 7 for _ in dets]
            it_all[frame_idx] = [[0.0] * 7 for _ in dets]
            for k, (s, _, _) in enumerate(dets):
                if not s.valid:
                    continue
                for key, res in disp.add((frame_idx, k), s):
                    store(key, res)
            if frame_idx % 100 == 0:
                logger.info(f"Read No.{frame_idx} keyframe")
        for key, res in disp.flush_all():
            store(key, res)
        logger.info(f"native-crop dispatch: "
                    f"{len(disp.shapes_dispatched)} compiled shapes")
        for frame_idx in range(len(ds)):
            scio.savemat(os.path.join(wo_dir, f"{frame_idx:04d}.mat"),
                         {"poses": wo_all[frame_idx]})
            scio.savemat(os.path.join(it_dir, f"{frame_idx:04d}.mat"),
                         {"poses": it_all[frame_idx]})
    elif args.dispatch == "frame":
        from densefusion_tpu.data.schema import PoseSample

        # ONE compiled program yields both the unrefined (wo_refine) and
        # refined (iterative) poses for the whole frame's detections —
        # 2949 dispatches instead of ~2 per roi (~24k).
        pipe = InferencePipeline(posenet, refiner,
                                 refine_iters=args.iterations,
                                 return_unrefined=True)
        mesh_m = 500  # detections carry 500-point model clouds (ycb.py)
        for frame_idx in range(len(ds)):
            wo_path = os.path.join(wo_dir, f"{frame_idx:04d}.mat")
            it_path = os.path.join(it_dir, f"{frame_idx:04d}.mat")
            if (args.skip_done and os.path.exists(wo_path)
                    and os.path.exists(it_path)):
                continue
            dets = ds.detections(frame_idx)
            # lost detections -> zero pose, matching the reference's
            # ZeroDivisionError fallback (tools/eval_ycb.py:234-237); the
            # scorer treats a zero pose as a huge-distance failure
            wo_poses = [[0.0] * 7 for _ in dets]
            it_poses = [[0.0] * 7 for _ in dets]
            live = [(k, s) for k, (s, _, _) in enumerate(dets) if s.valid]
            if live:
                pad = _bucket(len(live)) - len(live)
                samples = [s for _, s in live] + [
                    PoseSample.invalid(args.num_points, mesh_m,
                                       args.crop_size)] * pad
                batch = collate(samples)
                st = load_state(batch)
                q0, t0, q, t, _ = pipe(
                    st.params_pose, st.params_refine,
                    batch.img, batch.points, batch.choose, batch.obj_idx)
                q0, t0 = np.asarray(q0), np.asarray(t0)
                q, t = np.asarray(q), np.asarray(t)
                for j, (k, _) in enumerate(live):
                    wo_poses[k] = np.concatenate([q0[j], t0[j]]).tolist()
                    it_poses[k] = np.concatenate([q[j], t[j]]).tolist()
            scio.savemat(wo_path, {"poses": wo_poses})
            scio.savemat(it_path, {"poses": it_poses})
            if frame_idx % 100 == 0:
                logger.info(f"Finish No.{frame_idx} keyframe")
    else:
        pipe0 = InferencePipeline(posenet, refiner, refine_iters=0)
        # with 0 iterations the two programs are identical — compile and
        # dispatch once, publish the same poses under both methods
        pipe = pipe0 if args.iterations == 0 else InferencePipeline(
            posenet, refiner, refine_iters=args.iterations)
        for frame_idx in range(len(ds)):
            wo_poses, it_poses = [], []
            for sample, _, itemid in ds.detections(frame_idx):
                batch = collate([sample])
                load_state(batch)
                if not sample.valid:
                    wo_poses.append([0.0] * 7)
                    it_poses.append([0.0] * 7)
                    continue
                inputs = (batch.img, batch.points, batch.choose,
                          batch.obj_idx)
                q0, t0, _ = pipe0(state.params_pose, state.params_refine,
                                  *inputs)
                wo_poses.append(np.concatenate(
                    [np.asarray(q0)[0], np.asarray(t0)[0]]).tolist())
                if pipe is pipe0:
                    it_poses.append(wo_poses[-1])
                else:
                    q, t, _ = pipe(state.params_pose, state.params_refine,
                                   *inputs)
                    it_poses.append(np.concatenate(
                        [np.asarray(q)[0], np.asarray(t)[0]]).tolist())

            scio.savemat(os.path.join(wo_dir, f"{frame_idx:04d}.mat"),
                         {"poses": wo_poses})
            scio.savemat(os.path.join(it_dir, f"{frame_idx:04d}.mat"),
                         {"poses": it_poses})
            if frame_idx % 100 == 0:
                logger.info(f"Finish No.{frame_idx} keyframe")

    # -- stage 2: toolbox-exact scoring ------------------------------------
    results = score_keyframes(
        args.dataset_root, args.posecnn_results,
        {"per-pixel": wo_dir, "iterative": it_dir},
        num_keyframes=args.num_keyframes)
    results.save_mat(os.path.join(args.output_dir, "results_keyframe.mat"))
    table = summarize(results, ds.classes)
    if args.plots:
        plot_accuracy(results, ds.classes,
                      os.path.join(args.output_dir, "plots"))

    # convenience top-level keys = the refined method over all gt objects
    summary = {**{k: table["iterative"]["all"][k] for k in
                  ("adds_auc", "add_auc", "adds_under_2cm")},
               "refine_iterations": args.iterations,
               "refiner_trained": refiner_trained,
               "native_crops": native,
               "methods": table}
    with open(os.path.join(args.output_dir, "metrics.json"), "w") as f:
        json.dump(summary, f, indent=2)
    for method in results.methods:
        row = table[method]["all"]
        logger.info(
            f"{method}: ADD-S AUC {row['adds_auc']:.2f}  "
            f"ADD AUC {row['add_auc']:.2f}  <2cm {row['adds_under_2cm']:.2f}  "
            f"detected {row['detected']}/{row['total']}")
    return summary


if __name__ == "__main__":
    main()
