"""Full YCB-protocol system demo on synthetic data.

Exercises the ENTIRE YCB pipeline as one run — the same stages a user would
chain on the real YCB-Video dataset (reference: ``tools/train.py`` →
``tools/eval_ycb.py`` → ``replace_ycb_toolbox/*.m``):

1. generate a multi-object YCB-Video-format dataset (``-color/-depth/-label``
   PNGs + ``-meta.mat`` + ``models/*/points.xyz``) with fake-PoseCNN
   ``labels``/``rois`` ``.mat`` detections on the held-out keyframes,
2. train PoseNet (and, when the 0.02 curriculum gate fires, the refiner)
   through the real two-phase ``Trainer`` via the train CLI,
3. run the eval_ycb CLI: per-detection pose inference → per-keyframe ``.mat``
   pose results → toolbox-exact scoring (gt-object iteration, ``inf``
   misses, full model clouds, ``adi`` direction) → ADD-S/ADD AUC, <2cm,
   and per-class accuracy-threshold plots.

Run on TPU (defaults: 5 objects, flagship 1000-pt/192-px config)::

    python examples/ycb_e2e_synthetic.py --train_frames 240 --nepoch 30

or as a 2-minute CPU smoke::

    python examples/ycb_e2e_synthetic.py --cpu --smoke
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--classes", type=int, default=5)
    p.add_argument("--train_frames", type=int, default=240,
                   help="real-style training frames")
    p.add_argument("--syn_frames", type=int, default=60,
                   help="data_syn frames (background-composited branch)")
    p.add_argument("--objs_per_frame", type=int, default=2,
                   help="gt objects per generated frame (real YCB keyframes "
                        "carry ~3-6)")
    p.add_argument("--test_frames", type=int, default=24,
                   help="held-out keyframes scored by the toolbox protocol")
    p.add_argument("--nepoch", type=int, default=30)
    p.add_argument("--repeat", type=int, default=1)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--points", type=int, default=1000)
    p.add_argument("--crop", type=int, default=192)
    p.add_argument("--iterations", type=int, default=2)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--root", default="",
                   help="dataset/work directory (default: fresh tempdir)")
    p.add_argument("--out", default="", help="write the summary JSON here")
    p.add_argument("--bf16", action="store_true",
                   help="train with bf16 compute (f32 master params)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--smoke", action="store_true",
                   help="tiny shapes/budget wiring check")
    args = p.parse_args(argv)

    if args.smoke:
        args.classes, args.train_frames, args.syn_frames = 2, 3, 1
        args.test_frames, args.nepoch, args.batch = 2, 1, 2
        args.points, args.crop, args.workers = 64, 64, 1
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from densefusion_tpu.data.synthetic import generate_ycb_style_dataset
    from densefusion_tpu.cli import train as train_cli
    from densefusion_tpu.cli import eval_ycb as eval_ycb_cli

    work = args.root or tempfile.mkdtemp(prefix="ycb_e2e_")
    root = os.path.join(work, "dataset")
    posecnn = os.path.join(work, "posecnn")
    out_dir = os.path.join(work, "eval_out")

    t0 = time.time()
    if not os.path.isdir(os.path.join(root, "dataset_config")):
        print(f"generating {args.train_frames}+{args.syn_frames} train / "
              f"{args.test_frames} keyframes, {args.classes} classes "
              f"-> {root}", flush=True)
        generate_ycb_style_dataset(
            root, n_classes=args.classes, n_real=args.train_frames,
            n_syn=args.syn_frames, n_test=args.test_frames,
            seed=args.seed, posecnn_dir=posecnn,
            objs_per_frame=args.objs_per_frame)
    t_gen = time.time() - t0

    train_cli.main((["--bf16"] if args.bf16 else []) + [
        "--dataset", "ycb", "--dataset_root", root,
        "--batch_size", str(args.batch), "--workers", str(args.workers),
        "--nepoch", str(args.nepoch), "--repeat_epoch", str(args.repeat),
        "--crop_size", str(args.crop), "--seed", str(args.seed),
        "--num_objects", str(args.classes),
        "--num_points", str(args.points),
        "--out_dir", os.path.join(work, "trained"),
        "--log_dir", os.path.join(work, "logs"),
    ])
    t_train = time.time() - t0 - t_gen

    # best refined model if the curriculum reached phase 2, else best pose
    ckpt_dir = os.path.join(work, "trained", "ycb")
    ckpt = None
    for tag in ("checkpoint_best_refine", "checkpoint_best_pose",
                "checkpoint_current"):
        cand = os.path.join(ckpt_dir, tag)
        if os.path.isdir(cand):
            ckpt = cand
            break
    if ckpt is None:
        raise SystemExit(f"no checkpoint produced under {ckpt_dir}")

    summary = eval_ycb_cli.main([
        "--dataset_root", root, "--posecnn_results", posecnn,
        "--checkpoint", ckpt, "--iterations", str(args.iterations),
        "--num_points", str(args.points), "--crop_size", str(args.crop),
        "--num_keyframes", str(args.test_frames),
        "--output_dir", out_dir, "--plots",
    ])

    result = {
        "work_dir": work,
        "checkpoint": os.path.basename(ckpt),
        "adds_auc": summary["adds_auc"],
        "add_auc": summary["add_auc"],
        "adds_under_2cm": summary["adds_under_2cm"],
        "methods": summary["methods"],
        "gen_seconds": t_gen,
        "train_seconds": t_train,
        "total_seconds": time.time() - t0,
    }
    print(json.dumps({k: v for k, v in result.items() if k != "methods"},
                     indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    return result


if __name__ == "__main__":
    main()
