"""Checkpoint phase-structure regressions: refine-phase and grad-accum
checkpoints must load (via a phase-matched template or restore_opt=False) —
previously any non-phase-1 checkpoint crashed every consumer."""

import numpy as np
import jax
import optax
import pytest

from densefusion_tpu.data import PoseSample, collate
from densefusion_tpu.models import PoseNet, PoseRefineNet
from densefusion_tpu.train import (
    create_train_state, save_checkpoint, load_checkpoint,
)
from densefusion_tpu.train.checkpoint import peek_curriculum
from densefusion_tpu.train.state import Curriculum, make_optimizer
from densefusion_tpu.utils.config import RunConfig


@pytest.fixture(scope="module")
def base():
    cfg = RunConfig(num_objects=2, num_points=16, crop_size=32)
    batch = collate([PoseSample.invalid(16, 16, 32) for _ in range(2)])
    posenet, refiner = PoseNet(num_obj=2), PoseRefineNet(num_obj=2)
    state = create_train_state(posenet, refiner, cfg, jax.random.key(0),
                               batch)
    return cfg, state


def test_refine_phase_checkpoint_roundtrip(base, tmp_path):
    cfg, state = base
    tx = make_optimizer(cfg.lr)
    refine_state = state.replace(opt_state=tx.init(state.params_refine))
    cur = Curriculum(refine_started=True, epoch=7)
    path = str(tmp_path / "ck_refine")
    save_checkpoint(path, refine_state, cur, cfg)

    # phase-matched template restores the optimizer exactly
    assert peek_curriculum(path).refine_started
    template = state.replace(opt_state=tx.init(state.params_refine))
    loaded, cur2, _ = load_checkpoint(path, template)
    assert cur2.epoch == 7 and cur2.refine_started
    for a, b in zip(jax.tree.leaves(refine_state.opt_state),
                    jax.tree.leaves(loaded.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_refine_checkpoint_params_only_load(base, tmp_path):
    """Eval/serving consumers load ANY phase with restore_opt=False; a
    phase-1 template with restore_opt=True raises a helpful error."""
    cfg, state = base
    tx = make_optimizer(cfg.lr)
    refine_state = state.replace(opt_state=tx.init(state.params_refine))
    path = str(tmp_path / "ck_refine2")
    save_checkpoint(path, refine_state, Curriculum(refine_started=True), cfg)

    loaded, _, _ = load_checkpoint(path, state, restore_opt=False)
    for a, b in zip(jax.tree.leaves(refine_state.params_refine),
                    jax.tree.leaves(loaded.params_refine)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(ValueError, match="peek_curriculum"):
        load_checkpoint(path, state, restore_opt=True)


@pytest.mark.slow
def test_grad_accum_checkpoint_roundtrip(base, tmp_path):
    cfg, state = base
    tx = optax.MultiSteps(make_optimizer(cfg.lr), every_k_schedule=4)
    ms_state = state.replace(opt_state=tx.init(state.params_pose))
    path = str(tmp_path / "ck_ms")
    save_checkpoint(path, ms_state, Curriculum(), cfg)
    template = state.replace(opt_state=tx.init(state.params_pose))
    loaded, _, _ = load_checkpoint(path, template)
    for a, b in zip(jax.tree.leaves(ms_state.opt_state),
                    jax.tree.leaves(loaded.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_refiner_is_trained_flag(tmp_path):
    """Phase-1 checkpoints report an untrained refiner; so do checkpoints
    saved on the very epoch the gate flipped (refine_steps == 0). Phase-2
    with steps, curriculum-less (old torch-import), and unparseable
    sidecars report trained."""
    import json
    import os
    from densefusion_tpu.train import refiner_is_trained, clamp_refine_iters

    ck = tmp_path / "ck"
    ck.mkdir()
    with open(ck / "curriculum.json", "w") as f:
        json.dump(Curriculum().to_dict(), f)
    assert refiner_is_trained(str(ck)) is False
    assert clamp_refine_iters(str(ck), 2) == 0
    assert clamp_refine_iters(str(ck), 0) == 0

    # gate flipped this epoch, no refine step has run yet -> untrained
    with open(ck / "curriculum.json", "w") as f:
        json.dump(Curriculum(refine_started=True).to_dict(), f)
    assert refiner_is_trained(str(ck)) is False

    with open(ck / "curriculum.json", "w") as f:
        json.dump(Curriculum(refine_started=True, refine_steps=7).to_dict(),
                  f)
    assert refiner_is_trained(str(ck)) is True
    assert clamp_refine_iters(str(ck), 2) == 2

    # pre-refine_steps checkpoint (older version): assume trained
    d = Curriculum(refine_started=True).to_dict()
    del d["refine_steps"]
    with open(ck / "curriculum.json", "w") as f:
        json.dump(d, f)
    assert refiner_is_trained(str(ck)) is True

    # unknown extra key must not crash the guard (newer-version sidecar)
    d["future_field"] = 1
    with open(ck / "curriculum.json", "w") as f:
        json.dump(d, f)
    assert refiner_is_trained(str(ck)) is True

    # non-dict / unparseable sidecar: fall back to trained, don't crash
    with open(ck / "curriculum.json", "w") as f:
        f.write("[1, 2]")
    assert refiner_is_trained(str(ck)) is True

    os.remove(ck / "curriculum.json")
    assert refiner_is_trained(str(ck)) is True


def test_curriculum_from_dict_tolerates_unknown_keys():
    d = Curriculum(refine_started=True).to_dict()
    d["added_by_a_newer_version"] = 3
    cur = Curriculum.from_dict(d)
    assert cur.refine_started is True


def test_refine_maturity_guard(tmp_path):
    """A trained-but-immature refiner (< REFINE_MATURITY_STEPS refine
    steps) warns WITHOUT clamping; a mature one is silent. Twice-measured
    failure mode: composing a barely-trained refiner amplifies its own
    error (docs/PERF.md rounds 3-4)."""
    import json
    import os
    import warnings
    from densefusion_tpu.train.checkpoint import (
        REFINE_MATURITY_STEPS, clamp_refine_iters, refine_step_count,
    )

    ck = tmp_path / "ck"
    ck.mkdir()

    def write(cur):
        with open(ck / "curriculum.json", "w") as f:
            json.dump(cur.to_dict(), f)

    write(Curriculum())
    assert refine_step_count(str(ck)) == 0

    write(Curriculum(refine_started=True, refine_steps=500))
    assert refine_step_count(str(ck)) == 500
    with pytest.warns(UserWarning, match="IMMATURE"):
        assert clamp_refine_iters(str(ck), 4) == 4  # warn, don't clamp

    # a logger suppresses the warnings-module path
    class Cap:
        msgs: list = []
        def warning(self, m):
            self.msgs.append(m)
        def info(self, m):
            pass
    cap = Cap()
    assert clamp_refine_iters(str(ck), 4, cap) == 4
    assert any("IMMATURE" in m for m in cap.msgs)

    write(Curriculum(refine_started=True,
                     refine_steps=REFINE_MATURITY_STEPS))
    assert refine_step_count(str(ck)) == REFINE_MATURITY_STEPS
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert clamp_refine_iters(str(ck), 4) == 4  # mature: silent

    # --iterations 0 never warns regardless of maturity
    write(Curriculum(refine_started=True, refine_steps=1))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert clamp_refine_iters(str(ck), 0) == 0

    # unknowable counters (pre-counter sidecar / no sidecar) stay silent
    d = Curriculum(refine_started=True).to_dict()
    del d["refine_steps"]
    with open(ck / "curriculum.json", "w") as f:
        json.dump(d, f)
    assert refine_step_count(str(ck)) is None
    os.remove(ck / "curriculum.json")
    assert refine_step_count(str(ck)) is None
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert clamp_refine_iters(str(ck), 4) == 4
