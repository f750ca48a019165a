"""SegNet segmentation training CLI (capability parity with
``vanilla_segmentation/train.py``).

``--format ycb`` (default) trains the reference's 22-class YCB-Video
segmenter from ``-color.png``/``-label.png`` frames. ``--format linemod``
trains a multi-object segmenter over a Linemod_preprocessed tree (labels
are raw object ids) whose argmax masks — written by ``cli.segment
--binary_class <obj>`` — serve as the ``segnet_results/`` that
``LineModDataset(mode='eval')`` consumes; the reference shipped those masks
precomputed with no in-repo trainer.

Example::

    python -m densefusion_tpu.cli.train_seg \
        --dataset_root /data/YCB_Video_Dataset --batch_size 2
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--format", default="ycb", choices=["ycb", "linemod"],
                   dest="fmt")
    p.add_argument("--objlist", type=int, nargs="*", default=None,
                   help="linemod format: subset of object ids (default all)")
    p.add_argument("--batch_size", type=int, default=None,
                   help="default: 3 (ycb, the reference recipe), 8 (linemod)")
    p.add_argument("--n_epochs", type=int, default=600)
    p.add_argument("--lr", type=float, default=None,
                   help="default: 1e-4 (ycb, vanilla_segmentation/"
                        "train.py:26's recipe at its 600-epoch budget), "
                        "5e-4 (linemod — 1e-4 stays all-background at "
                        "short budgets, docs/PERF.md round 4)")
    p.add_argument("--fg_weight", type=float, default=None,
                   help="CE weight on foreground pixels. Default: 1.0 for "
                        "ycb (the reference's unweighted CE), 30.0 for "
                        "linemod, whose objects cover a few %% of the frame "
                        "— unweighted CE learns foreground too slowly "
                        "(measured recipe, docs/PERF.md round 4)")
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--num_classes", type=int, default=None,
                   help="default: 22 for ycb, max(objlist)+1 for linemod")
    p.add_argument("--out_dir", default="trained_models/segnet")
    p.add_argument("--log_dir", default="experiments/logs/segnet")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", action="store_true",
                   help="continue from <out_dir>/segnet_latest.msgpack "
                        "(params + batch_stats + optimizer + epoch cursor, "
                        "written every epoch)")
    p.add_argument("--rss_restart_gb", type=float, default=48.0,
                   help="save + exec-restart (--resume) when process RSS "
                        "exceeds this many GiB at an epoch boundary — the "
                        "same transfer-buffer-leak guard as cli.train "
                        "(train/loop.py). 0 disables")
    return p


def resolve_recipe_defaults(args):
    """Format-aware recipe defaults (measured, docs/PERF.md round 4): the
    reference's lr 1e-4 / unweighted CE assumes its 600-epoch YCB budget
    (``vanilla_segmentation/train.py:26-28``); the LineMOD 13-way segmenter
    needs lr 5e-4 + fg_weight 30 + batch 8 to learn foreground at all at
    short budgets. Explicit flags always win."""
    if args.fmt == "linemod":
        defaults = dict(batch_size=8, lr=5e-4, fg_weight=30.0)
    else:
        defaults = dict(batch_size=3, lr=1e-4, fg_weight=1.0)
    for k, v in defaults.items():
        if getattr(args, k) is None:
            setattr(args, k, v)
    return args


def main(argv=None):
    args = resolve_recipe_defaults(build_parser().parse_args(argv))
    from densefusion_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    import numpy as np
    import jax
    from flax import serialization

    from densefusion_tpu.data import (
        SegDataset, LinemodSegDataset, BatchLoader, collate_seg,
    )
    from densefusion_tpu.data.loader import PrefetchIterator
    from densefusion_tpu.models import SegNet
    from densefusion_tpu.train.seg import (
        create_seg_train_state, make_seg_train_step, make_seg_eval_step,
    )
    from densefusion_tpu.utils.logging import setup_logger, MetricsWriter

    os.makedirs(args.out_dir, exist_ok=True)
    logger = setup_logger("train_seg",
                          os.path.join(args.log_dir, "train_log.txt"))
    metrics = MetricsWriter(os.path.join(args.log_dir, "metrics.jsonl"))

    if args.fmt == "linemod":
        train_ds = LinemodSegDataset(args.dataset_root, "train",
                                     objlist=args.objlist, seed=args.seed)
        test_ds = LinemodSegDataset(args.dataset_root, "test",
                                    objlist=args.objlist, seed=args.seed)
        num_classes = args.num_classes or train_ds.num_classes
    else:
        train_ds = SegDataset(args.dataset_root, "train", seed=args.seed)
        test_ds = SegDataset(args.dataset_root, "test", seed=args.seed)
        num_classes = args.num_classes or 22
    train_loader = BatchLoader(train_ds, args.batch_size,
                               collate_fn=collate_seg,
                               num_workers=args.workers, seed=args.seed)
    test_loader = BatchLoader(test_ds, args.batch_size, shuffle=False,
                              collate_fn=collate_seg, drop_last=False,
                              num_workers=args.workers)

    segnet = SegNet(num_classes=num_classes)
    sample = next(iter(train_loader.epoch(0)))
    state, tx = create_seg_train_state(segnet, jax.random.key(args.seed),
                                       sample.rgb, lr=args.lr)
    train_step = make_seg_train_step(segnet, tx, fg_weight=args.fg_weight)
    eval_step = make_seg_eval_step(segnet, fg_weight=args.fg_weight)

    latest_path = os.path.join(args.out_dir, "segnet_latest.msgpack")
    best, start_epoch = float(np.inf), 1
    if args.resume and os.path.exists(latest_path):
        with open(latest_path, "rb") as f:
            restored = serialization.from_bytes(
                {"params": state.params, "batch_stats": state.batch_stats,
                 "opt_state": state.opt_state,
                 "epoch": np.int32(0), "best": np.float32(0)}, f.read())
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"],
                              opt_state=restored["opt_state"])
        start_epoch = int(restored["epoch"]) + 1
        best = float(restored["best"])
        logger.info(f"resumed from {latest_path} at epoch {start_epoch} "
                    f"(best {best:.4f})")

    def check_rss_restart(epoch):
        """Same leak guard as cli.train (train/loop.py:_check_rss): some
        remote-TPU transports retain per-dispatch host buffers; a 480x640
        seg epoch transfers GBs. State for THIS epoch is already in
        segnet_latest.msgpack when this fires."""
        if not args.rss_restart_gb or argv is not None:
            return
        try:
            with open("/proc/self/status") as f:
                rss_gb = next(int(ln.split()[1]) / 1048576.0 for ln in f
                              if ln.startswith("VmRSS"))
        except (OSError, StopIteration):
            return
        if rss_gb > args.rss_restart_gb:
            import sys
            logger.warning(
                f"process RSS {rss_gb:.1f} GiB > "
                f"rss_restart_gb={args.rss_restart_gb}: exec-restarting "
                f"with --resume at epoch {epoch + 1}")
            cmd = list(sys.argv)
            if "--resume" not in cmd:
                cmd.append("--resume")
            # execv skips atexit: don't orphan the fork workers
            train_loader.close()
            test_loader.close()
            from densefusion_tpu.utils.restart import reexec_self
            reexec_self(cmd)

    for epoch in range(start_epoch, args.n_epochs + 1):
        losses = []
        for batch in PrefetchIterator(train_loader.epoch(epoch)):
            state, loss = train_step(state, batch.rgb, batch.label)
            losses.append(loss)  # device scalar; sync once per epoch
        test_metrics = []
        for batch in PrefetchIterator(test_loader.epoch(0)):
            test_metrics.append(eval_step(state.params, state.batch_stats,
                                          batch.rgb, batch.label))
        tr = float(np.mean(jax.device_get(losses))) if losses else np.nan
        te, acc, iou = (float(np.mean(col)) for col in
                        zip(*jax.device_get(test_metrics)))
        logger.info(f"epoch {epoch} train {tr:.4f} test {te:.4f} "
                    f"pix-acc {acc:.4f} fg-iou {iou:.4f}")
        metrics.write(kind="seg_epoch", epoch=epoch, train_loss=tr,
                      test_loss=te, pixel_acc=acc, fg_iou=iou)
        if te < best:  # best-checkpoint policy (vanilla train.py:103-106)
            best = te
            with open(os.path.join(args.out_dir, "segnet_best.msgpack"),
                      "wb") as f:
                f.write(serialization.to_bytes(jax.device_get(
                    {"params": state.params,
                     "batch_stats": state.batch_stats})))
            logger.info(f"epoch {epoch} BEST saved ({te:.4f})")
        # resumable full state (failure recovery parity with cli.train)
        tmp = latest_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(jax.device_get(
                {"params": state.params, "batch_stats": state.batch_stats,
                 "opt_state": state.opt_state,
                 "epoch": np.int32(epoch), "best": np.float32(best)})))
        os.replace(tmp, latest_path)
        check_rss_restart(epoch)


if __name__ == "__main__":
    main()
