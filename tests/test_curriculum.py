"""Curriculum gating tests: lr/w decay at decay_margin, refiner-phase start at
refine_margin with dataset rebuild (tools/train.py:219-251 semantics), without
running real epochs (train/test epochs stubbed)."""

import os

import numpy as np
import pytest

from densefusion_tpu.train.loop import Trainer
from densefusion_tpu.utils.config import RunConfig


class StubTrainer(Trainer):
    """Trainer with scripted test distances and no-op heavy machinery."""

    def __init__(self, cfg, test_dis_script):
        self.cfg = cfg
        from densefusion_tpu.train.state import Curriculum
        from densefusion_tpu.utils.logging import setup_logger, MetricsWriter
        self.curriculum = Curriculum(lr=cfg.lr, w=cfg.w)
        self.metrics = MetricsWriter(os.path.join(cfg.log_dir,
                                                  "metrics.jsonl"))
        self.logger = setup_logger("stub", None)
        self._script = list(test_dis_script)
        self.rebuilds = []
        self.saves = []
        self.state = object()

    def train_epoch(self):
        return 0.0

    def test_epoch(self):
        return self._script.pop(0)

    def _build_data(self, refine):
        self.rebuilds.append(refine)

    def _rebuild_steps(self, reset_opt=True):
        pass

    def _save(self, tag):
        self.saves.append(tag)


@pytest.fixture
def cfg(tmp_path):
    return RunConfig(lr=1e-4, w=0.015, decay_margin=0.03, refine_margin=0.02,
                     out_dir=str(tmp_path), log_dir=str(tmp_path / "logs"))


def test_decay_gate_fires_once(cfg):
    tr = StubTrainer(cfg, [0.05, 0.025, 0.024, 0.026])
    tr.run(max_epochs=4)
    cur = tr.curriculum
    assert cur.decay_started
    assert cur.lr == pytest.approx(1e-5)
    assert cur.w == pytest.approx(0.0015)
    assert not cur.refine_started


def test_refine_gate_rebuilds_data(cfg):
    tr = StubTrainer(cfg, [0.05, 0.019, 0.5, 0.4])
    tr.run(max_epochs=4)
    cur = tr.curriculum
    assert cur.decay_started  # 0.019 < 0.03 too
    assert cur.refine_started
    assert tr.rebuilds == [True]  # datasets rebuilt with refine=True
    # best resets at phase entry so refiner checkpoints can be saved
    assert any(s.startswith("best_refine") for s in tr.saves)


def test_best_checkpoint_policy(cfg):
    tr = StubTrainer(cfg, [0.5, 0.4, 0.45, 0.39])
    tr.run(max_epochs=4)
    assert tr.saves.count("best_pose") == 3  # epochs 1, 2, 4
    assert not tr.curriculum.decay_started
