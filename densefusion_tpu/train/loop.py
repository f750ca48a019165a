"""Training driver: epoch loop with the two-phase curriculum.

Re-design of ``tools/train.py:51-254``. Behaviors kept: per-epoch
train/test cycle with average-distance selection, best-checkpoint policy,
periodic 'current' checkpoints, lr/w decay at ``decay_margin`` with a FRESH
optimizer (``tools/train.py:219-223``), refiner phase at ``refine_margin``
with datasets rebuilt (YCB mesh points 500 -> 2600 — a static-shape change,
so the step recompiles once at the boundary, ``tools/train.py:225-251``).
Changed by design: true batching (batch_size samples per step) instead of
batch-1 gradient accumulation, explicitly seeded data order, JSONL metrics.
"""

from __future__ import annotations

import gc
import os
import time
from typing import Callable, Optional

import jax
import numpy as np

from densefusion_tpu.models import PoseNet, PoseRefineNet
from densefusion_tpu.data import (
    BatchLoader, PrefetchIterator, LineModDataset, YCBDataset, CADDataset,
)
from densefusion_tpu.train.state import (
    TrainState, Curriculum, create_train_state, make_optimizer,
)
from densefusion_tpu.train.steps import (
    make_pose_train_step, make_refine_train_step, make_eval_step,
)
from densefusion_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint, peek_curriculum,
)
from densefusion_tpu.utils.config import RunConfig
from densefusion_tpu.utils.logging import setup_logger, MetricsWriter


class RestartRequested(Exception):
    """Raised (and handled internally by :meth:`Trainer.run`) when the
    process RSS crosses ``cfg.rss_restart_gb``: the trainer stops with a
    fresh 'current' checkpoint and sets ``trainer.restart_requested`` so
    its driver (``cli.train``) can exec-restart with ``--resume``."""


def _rss_gb() -> float:
    try:
        with open("/proc/self/status") as f:
            for ln in f:
                if ln.startswith("VmRSS"):
                    return int(ln.split()[1]) / 1048576.0
    except OSError:
        pass
    return 0.0


def build_dataset(cfg: RunConfig, mode: str, refine: bool):
    """Dataset factory (``tools/train.py:99-114``)."""
    common = dict(root=cfg.dataset_root, mode=mode,
                  num_points=cfg.num_points, crop_size=cfg.crop_size,
                  refine=refine, seed=cfg.seed,
                  noise_trans=cfg.noise_trans if mode == "train" else 0.0,
                  add_noise=(mode == "train"))
    if cfg.dataset == "ycb":
        return YCBDataset(**common)
    mesh = cfg.refine_mesh_points if refine else cfg.num_mesh_points
    if cfg.dataset == "linemod":
        return LineModDataset(num_mesh_points=mesh,
                              objlist=list(cfg.objlist) or None, **common)
    if cfg.dataset == "cad":
        if cfg.objlist:
            common["objlist"] = list(cfg.objlist)
        return CADDataset(num_mesh_points=mesh, **common)
    raise ValueError(f"unknown dataset {cfg.dataset!r}")


class Trainer:
    def __init__(self, cfg: RunConfig, posenet: Optional[PoseNet] = None,
                 refiner: Optional[PoseRefineNet] = None,
                 dataset_factory: Callable = build_dataset,
                 shard_batch: Optional[Callable] = None):
        self.cfg = cfg
        import jax.numpy as jnp
        dtype = jnp.bfloat16 if cfg.bf16_compute else None
        self.posenet = posenet or PoseNet(num_obj=cfg.num_objects,
                                          dtype=dtype,
                                          remat_cnn=cfg.remat_cnn,
                                          **cfg.decoder_flags())
        self.refiner = refiner or PoseRefineNet(num_obj=cfg.num_objects,
                                                dtype=dtype)
        self.dataset_factory = dataset_factory
        self.shard_batch = shard_batch or (lambda b: b)
        self.curriculum = Curriculum(lr=cfg.lr, w=cfg.w)
        self.state: TrainState | None = None
        self.restart_requested = False
        self.metrics = MetricsWriter(os.path.join(cfg.log_dir, "metrics.jsonl"))
        self.logger = setup_logger(
            "train", os.path.join(cfg.log_dir, "train_log.txt"))
        self._use_adds = bool(cfg.sym_list)

    # -- setup ------------------------------------------------------------

    def setup(self, resume: str | None = None) -> None:
        cfg = self.cfg
        if resume:
            # read the curriculum FIRST so the optimizer template matches the
            # checkpoint's phase (refiner params + possibly MultiSteps state)
            self.curriculum = peek_curriculum(resume)
        self._build_data(refine=self.curriculum.refine_started)
        sample = next(iter(self.train_loader.epoch(0)))
        rng = jax.random.key(cfg.seed)
        self.state = create_train_state(self.posenet, self.refiner, cfg, rng,
                                        sample)
        # build the phase-appropriate optimizer and matching opt_state
        self._rebuild_steps(reset_opt=True)
        if resume:
            self.state, self.curriculum, _ = load_checkpoint(
                resume, self.state, restore_opt=True)
            self.logger.info(f"resumed from {resume} at epoch "
                             f"{self.curriculum.epoch}")

    def _build_data(self, refine: bool) -> None:
        cfg = self.cfg
        # phase rebuild changes static sample shapes (YCB mesh 500 -> 2600):
        # retire any existing worker pools before the shapes move
        for old in ("train_loader", "test_loader"):
            if hasattr(self, old):
                getattr(self, old).close()
        self.train_ds = self.dataset_factory(cfg, "train", refine)
        self.test_ds = self.dataset_factory(cfg, "test", refine)
        self.train_loader = BatchLoader(
            self.train_ds, cfg.batch_size, shuffle=True,
            num_workers=cfg.num_workers, seed=cfg.seed,
            worker_mode=cfg.worker_mode)
        self.test_loader = BatchLoader(
            self.test_ds, cfg.batch_size, shuffle=False,
            num_workers=cfg.num_workers, drop_last=False, seed=cfg.seed,
            worker_mode=cfg.worker_mode)

    def _rebuild_steps(self, reset_opt: bool = True) -> None:
        """(Re)create jitted steps + optimizer for the current phase."""
        cfg = self.cfg
        cur = self.curriculum
        tx = make_optimizer(cur.lr)
        if cfg.grad_accum > 1:
            # optional accumulation on top of true batching — the reference's
            # batch-1 x32-accumulation regime is grad_accum=32, batch_size=1
            import optax
            tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
        self._tx = tx
        if cur.refine_started:
            self.train_step = make_refine_train_step(
                self.posenet, self.refiner, tx, cfg.refine_iters,
                cfg.knn_backend)
            if reset_opt:
                self.state = self.state.replace(
                    opt_state=tx.init(self.state.params_refine))
        else:
            self.train_step = make_pose_train_step(
                self.posenet, tx, self._use_adds, cfg.knn_backend)
            if reset_opt:
                self.state = self.state.replace(
                    opt_state=tx.init(self.state.params_pose))
        self.eval_step = make_eval_step(
            self.posenet, self.refiner,
            cfg.refine_iters if cur.refine_started else 0,
            self._use_adds, cfg.knn_backend)

    # -- epochs -----------------------------------------------------------

    def train_epoch(self) -> float:
        cfg, cur = self.cfg, self.curriculum
        t0 = time.time()
        # accumulate the metric ON DEVICE: a float() per step would force a
        # host sync each iteration (on a remote-TPU link that serializes
        # every step on the RTT); we only materialize at log/epoch points
        dis_sum = None
        count = 0
        # resume exactly where the checkpoint left off: (repetition, batch)
        first_rep = cur.rep_in_epoch
        for rep in range(first_rep, cfg.repeat_epoch):
            cur.rep_in_epoch = rep
            start = cur.batch_in_epoch if rep == first_rep else 0
            cur.batch_in_epoch = start
            it = PrefetchIterator(
                self.train_loader.epoch(cur.epoch * cfg.repeat_epoch + rep,
                                        start_batch=start))
            for batch in it:
                self.state, m = self.train_step(
                    self.state, self.shard_batch(batch),
                    np.float32(cur.w))
                cur.batch_in_epoch += 1
                if cur.refine_started:
                    cur.refine_steps += 1
                dis_sum = m["dis"] if dis_sum is None else dis_sum + m["dis"]
                count += 1
                if count % 50 == 0:
                    self.logger.info(
                        f"epoch {cur.epoch} batch {count} "
                        f"avg_dis {float(dis_sum) / count:.5f} "
                        f"({time.time() - t0:.1f}s)")
                if count % 100 == 0:
                    # break python ref cycles promptly: on remote-TPU
                    # transports, host buffers pinned by cyclic garbage
                    # are a per-step leak at batch-size granularity
                    gc.collect()
                if count % cfg.checkpoint_every_steps == 0:
                    self._save("current")
                    self._check_rss()
            cur.batch_in_epoch = 0
        cur.rep_in_epoch = 0
        avg = float(dis_sum) / count if count else 0.0
        self.metrics.write(kind="train_epoch", epoch=cur.epoch, avg_dis=avg,
                           seconds=time.time() - t0, phase=self._phase())
        return avg

    def test_epoch(self) -> float:
        cur = self.curriculum
        t0 = time.time()
        dis_sum, count = 0.0, 0
        for batch in PrefetchIterator(self.test_loader.epoch(0)):
            dis, valid = self.eval_step(
                self.state.params_pose, self.state.params_refine,
                self.shard_batch(batch), np.float32(cur.w))
            dis, valid = np.asarray(dis), np.asarray(valid)
            dis_sum += float((dis * valid).sum())
            count += int(valid.sum())
        if count == 0:
            # an empty/all-invalid test split must not read as a perfect
            # score — a 0.0 here would silently fire the curriculum gates
            # (decay at <0.03, refine at <0.02)
            self.logger.warning(
                f"epoch {cur.epoch} TEST had no valid samples; "
                "skipping best/curriculum updates")
            return float("inf")
        avg = dis_sum / count
        self.metrics.write(kind="test_epoch", epoch=cur.epoch, avg_dis=avg,
                           seconds=time.time() - t0, phase=self._phase())
        self.logger.info(f"epoch {cur.epoch} TEST avg_dis {avg:.5f}")
        return avg

    def _phase(self) -> str:
        return "refine" if self.curriculum.refine_started else "pose"

    def close(self) -> None:
        """Shut down loader worker processes. MUST be called before an
        exec-restart: ``os.execv`` replaces the process image without
        running atexit/__del__, which would orphan the fork workers (and
        their shared-memory rings) on every restart."""
        for name in ("train_loader", "test_loader"):
            loader = getattr(self, name, None)
            if loader is not None:
                loader.close()

    def _save(self, tag: str) -> None:
        path = os.path.join(self.cfg.out_dir, f"checkpoint_{tag}")
        save_checkpoint(path, self.state, self.curriculum, self.cfg)

    def _check_rss(self) -> None:
        """RSS self-restart guard (``cfg.rss_restart_gb``): called right
        after a 'current' save, so the requested restart resumes at most
        ``checkpoint_every_steps`` steps back."""
        limit = self.cfg.rss_restart_gb
        if not limit:
            return
        rss = _rss_gb()
        if rss > limit:
            self.logger.warning(
                f"process RSS {rss:.1f} GiB > rss_restart_gb={limit}: "
                "requesting exec-restart (leak guard; state just saved to "
                "checkpoint_current)")
            raise RestartRequested()

    # -- curriculum -------------------------------------------------------

    def run(self, max_epochs: int | None = None) -> None:
        """Train epochs 1..cfg.nepoch INCLUSIVE — ``nepoch`` is the number of
        epochs trained. Intentional delta from the reference's
        ``range(start_epoch, nepoch)`` (``tools/train.py:131``), which with
        start_epoch=1 trains nepoch−1 epochs; ``--nepoch 1`` doing nothing
        would be a footgun. Resuming does not extend the run. ``max_epochs``
        optionally caps ADDITIONAL epochs (tests/short runs)."""
        cfg, cur = self.cfg, self.curriculum
        end_epoch = cfg.nepoch + 1
        if max_epochs is not None:
            end_epoch = min(end_epoch, cur.epoch + max_epochs)
        while cur.epoch < end_epoch:
            try:
                self.train_epoch()
            except RestartRequested:
                # mid-epoch leak-guard stop: 'current' was saved by the
                # step-cadence save immediately before the check
                self.restart_requested = True
                return
            test_dis = self.test_epoch()

            if test_dis <= cur.best_test:
                cur.best_test = test_dis
                self._save("best_" + self._phase())
                self.logger.info(
                    f"epoch {cur.epoch} BEST {self._phase()} model saved "
                    f"(dis {test_dis:.5f})")

            # lr/w decay gate (tools/train.py:219-223)
            if cur.best_test < cfg.decay_margin and not cur.decay_started:
                cur.decay_started = True
                cur.lr *= cfg.lr_rate
                cur.w *= cfg.w_rate
                self._rebuild_steps(reset_opt=True)
                self.logger.info(f"decay triggered: lr={cur.lr} w={cur.w}")

            # refiner phase gate (tools/train.py:225-251)
            if cur.best_test < cfg.refine_margin and not cur.refine_started:
                cur.refine_started = True
                cur.best_test = float("inf")
                self._build_data(refine=True)
                self._rebuild_steps(reset_opt=True)
                self.logger.info("refinement phase started")

            cur.epoch += 1
            # end-of-epoch resume point: the in-epoch cadence
            # (checkpoint_every_steps) never fires when an epoch has fewer
            # steps than the cadence, which would leave no resumable
            # checkpoint at all on small datasets
            self._save("current")
            try:
                self._check_rss()
            except RestartRequested:
                self.restart_requested = True
                return

            # operator-requested graceful stop: `touch <out_dir>/STOP`
            # ends the run at the next epoch boundary with best/current
            # checkpoints saved and the curriculum state resumable —
            # preemption-friendly control the reference (ctrl-C mid-epoch,
            # state_dict-only snapshots) cannot express
            stop_file = os.path.join(cfg.out_dir, "STOP")
            if os.path.exists(stop_file):
                self.logger.info(
                    f"stop requested ({stop_file}); ending at epoch "
                    f"{cur.epoch - 1} — resume with --resume "
                    f"{os.path.join(cfg.out_dir, 'checkpoint_current')}")
                # consume the marker so a `--resume` into the same out_dir
                # doesn't immediately re-stop on the stale file
                try:
                    os.remove(stop_file)
                except OSError:
                    pass
                break
