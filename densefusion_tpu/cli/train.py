"""Pose-estimation training CLI (capability parity with ``tools/train.py``).

Example::

    python -m densefusion_tpu.cli.train --dataset linemod \
        --dataset_root /data/Linemod_preprocessed --batch_size 8
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", default="linemod",
                   choices=["ycb", "linemod", "cad"])
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--worker_mode", default="process",
                   choices=["process", "thread"],
                   help="loader workers: fork processes + shared-memory "
                        "sample ring (linux; reference parity with its "
                        "num_workers=10 fork loader) or a thread pool")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_rate", type=float, default=0.1)
    p.add_argument("--w", type=float, default=0.015)
    p.add_argument("--w_rate", type=float, default=0.1)
    p.add_argument("--decay_margin", type=float, default=0.03)
    p.add_argument("--refine_margin", type=float, default=0.02)
    p.add_argument("--noise_trans", type=float, default=0.03)
    p.add_argument("--iteration", type=int, default=2,
                   help="refinement iterations")
    p.add_argument("--nepoch", type=int, default=500)
    p.add_argument("--repeat_epoch", type=int, default=None,
                   help="override the dataset preset's per-epoch repeat count")
    p.add_argument("--num_objects", type=int, default=None,
                   help="override the dataset preset's object count (e.g. a "
                        "synthetic YCB-format root with fewer classes)")
    p.add_argument("--crop_size", type=int, default=192)
    p.add_argument("--num_points", type=int, default=None,
                   help="override the dataset preset's cloud size")
    p.add_argument("--objlist", type=int, nargs="*", default=None,
                   help="train on a subset of dataset object ids "
                        "(linemod/cad); heads are sized to the subset")
    p.add_argument("--resume", default="",
                   help="checkpoint directory to resume from")
    p.add_argument("--rss_restart_gb", type=float, default=48.0,
                   help="save + exec-restart (with --resume) when process "
                        "RSS exceeds this many GiB — guards multi-hour runs "
                        "against host-side transfer-buffer leaks on "
                        "remote-TPU transports (measured ~34 MB/s on the "
                        "axon tunnel; a leak-free run never comes near "
                        "this). 0 disables")
    p.add_argument("--out_dir", default="trained_models")
    p.add_argument("--log_dir", default="experiments/logs")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard batches over all available devices")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 MXU compute (f32 params/outputs)")
    p.add_argument("--remat_cnn", action="store_true",
                   help="rematerialize the CNN in backward (lower peak "
                        "memory at large batch, ~one extra CNN forward)")
    p.add_argument("--trace_dir", default=None,
                   help="capture a jax.profiler trace (XProf/TensorBoard) "
                        "of the whole run")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from densefusion_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    from densefusion_tpu.utils.config import RunConfig
    from densefusion_tpu.train import Trainer

    overrides = {}
    if args.repeat_epoch is not None:
        overrides["repeat_epoch"] = args.repeat_epoch
    if args.num_objects is not None:
        overrides["num_objects"] = args.num_objects
    if args.num_points is not None:
        overrides["num_points"] = args.num_points
    if args.objlist:
        overrides["objlist"] = tuple(args.objlist)
        overrides.setdefault("num_objects", len(args.objlist))
        if args.dataset == "linemod":
            # sym_list = POSITIONS of eggbox/glue within the subset
            from densefusion_tpu.data.linemod import LINEMOD_SYM_IDS
            overrides["sym_list"] = tuple(
                args.objlist.index(i) for i in LINEMOD_SYM_IDS
                if i in args.objlist)
    cfg = RunConfig.preset(
        args.dataset,
        **overrides,
        dataset_root=args.dataset_root, batch_size=args.batch_size,
        grad_accum=args.grad_accum, num_workers=args.workers,
        worker_mode=args.worker_mode, lr=args.lr,
        lr_rate=args.lr_rate, w=args.w, w_rate=args.w_rate,
        decay_margin=args.decay_margin, refine_margin=args.refine_margin,
        noise_trans=args.noise_trans, refine_iters=args.iteration,
        nepoch=args.nepoch, crop_size=args.crop_size, seed=args.seed,
        rss_restart_gb=args.rss_restart_gb,
        bf16_compute=args.bf16,
        remat_cnn=args.remat_cnn,
        out_dir=f"{args.out_dir}/{args.dataset}",
        log_dir=f"{args.log_dir}/{args.dataset}",
    )

    import os
    if not os.path.isdir(args.dataset_root):
        raise SystemExit(
            f"error: dataset root not found: {args.dataset_root!r} "
            f"(expected the layout described in docs/DATA.md)")

    shard_batch = None
    if args.data_parallel:
        from densefusion_tpu.parallel import (
            make_mesh, make_shard_batch_fn, initialize_distributed,
        )
        initialize_distributed()
        shard_batch = make_shard_batch_fn(make_mesh())

    from densefusion_tpu.utils.profiling import trace_context
    trainer = Trainer(cfg, shard_batch=shard_batch)
    trainer.setup(resume=args.resume or None)
    with trace_context(args.trace_dir):
        trainer.run()

    if trainer.restart_requested:
        # leak-guard exec-restart: same interpreter + argv, resuming from
        # the checkpoint saved immediately before the RSS check fired
        # (train/loop.py:_check_rss). exec (not fork) so the leaked
        # address space is fully returned to the OS. Only meaningful when
        # argv came from the process command line — an embedding caller
        # (tests, examples) gets the flag to act on instead.
        import sys
        current = os.path.join(cfg.out_dir, "checkpoint_current")
        if argv is not None:
            print(f"rss_restart_gb exceeded; state saved to {current} — "
                  "embedded call, not exec-restarting", flush=True)
            return trainer
        cmd = list(sys.argv)
        if "--resume" in cmd:
            cmd[cmd.index("--resume") + 1] = current
        else:
            cmd += ["--resume", current]
        print(f"exec-restarting: {' '.join(cmd)}", flush=True)
        trainer.close()  # execv skips atexit: don't orphan fork workers
        from densefusion_tpu.utils.restart import reexec_self
        reexec_self(cmd)
    return trainer


if __name__ == "__main__":
    main()
