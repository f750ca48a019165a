"""Checkpointing: full train state (params, optimizer, curriculum, RNG, data
cursor) + run config in one directory.

Replaces the reference's bare ``torch.save(state_dict())`` flavors
(``tools/train.py:172-176,211-217``) with restartable checkpoints: the same
current/best policy, but a resume continues mid-epoch with identical data
order (SURVEY.md §5.3-5.4). Format: flax msgpack for the pytree + JSON
sidecars (no pickle, no framework lock-in).

The optimizer-state STRUCTURE depends on the curriculum phase (phase 2
optimizes the refiner; ``grad_accum`` wraps Adam in MultiSteps), so loading
restores field-by-field: callers that care about the optimizer read the
curriculum first (:func:`peek_curriculum`) and build a matching template;
consumers that only need parameters (eval CLIs, serving) pass
``restore_opt=False`` and load any checkpoint regardless of phase.
"""

from __future__ import annotations

import json
import os
import shutil

import jax
from flax import serialization

from densefusion_tpu.train.state import TrainState, Curriculum


def save_checkpoint(path: str, state: TrainState, curriculum: Curriculum,
                    config=None) -> None:
    os.makedirs(path + ".tmp", exist_ok=True)
    # typed PRNG keys are not serializable; store raw key data
    state = state.replace(rng=jax.random.key_data(state.rng))
    with open(os.path.join(path + ".tmp", "state.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state)))
    with open(os.path.join(path + ".tmp", "curriculum.json"), "w") as f:
        json.dump(curriculum.to_dict(), f, indent=2)
    if config is not None:
        with open(os.path.join(path + ".tmp", "config.json"), "w") as f:
            f.write(config.to_json())
    # atomic-ish swap so a crash never leaves a half-written checkpoint
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(path + ".tmp", path)


def peek_config(path: str):
    """Read a checkpoint's ``RunConfig`` without touching the array state
    (None when the checkpoint predates config sidecars). Eval/serving
    entry points use this to construct models with the checkpoint's own
    architecture flags (e.g. the ``decoder`` mode the torch importer sets)."""
    from densefusion_tpu.utils.config import RunConfig

    cfg_path = os.path.join(path, "config.json")
    if not os.path.exists(cfg_path):
        return None
    with open(cfg_path) as f:
        return RunConfig.from_json(f.read())


def refiner_is_trained(path: str) -> bool:
    """Whether a checkpoint's refiner parameters have ever been trained.

    Phase-1 checkpoints bundle a freshly-initialized (random) refiner;
    applying it at eval time silently DESTROYS the pose estimate, a failure
    mode the reference cannot have (it loads the refiner from a separate
    ``--refine_model`` file or not at all, ``tools/eval_ycb.py:92-100``).
    Eval entry points use :func:`clamp_refine_iters` (built on this) to
    drop refinement with a warning. A checkpoint saved on the very epoch
    the refine gate flipped has ``refine_started=True`` but
    ``refine_steps == 0`` — still untrained. Checkpoints without a
    curriculum sidecar, or with one this version cannot parse (e.g. old
    torch imports / newer formats), are assumed trained.
    """
    try:
        with open(os.path.join(path, "curriculum.json")) as f:
            d = json.load(f)
        if not isinstance(d, dict):
            return True  # unparseable sidecar: same fallback as below
        if not d.get("refine_started", False):
            return False
        # absent refine_steps = checkpoint predates the counter: assume
        # trained (phase-2 checkpoints of older versions were only written
        # after >= checkpoint_every_steps refine steps)
        return bool(d.get("refine_steps", 1))
    except (FileNotFoundError, ValueError, TypeError):
        return True


REFINE_MATURITY_STEPS = 10_000
"""Refine-step count below which iterative refinement is empirically risky.

Twice measured on this codebase: a 3240-step refiner turned a 0.48
per-pixel LineMOD <0.1d rate into 0.31 refined, and an early-phase-2 YCB
checkpoint turned 91.7 AUC into 45.5 (docs/PERF.md rounds 3-4) — an
immature refiner composed 2-4x AMPLIFIES its own error. The builder's
convergence curve only shows refinement beating per-pixel from roughly
20k steps. Heuristic, not a hard gate: consumers warn below this, they
don't clamp (the eval CLIs print per-pixel vs refined side by side)."""


def refine_step_count(path: str):
    """The curriculum sidecar's refine-step counter: ``0`` when the refine
    phase never started, ``None`` when unknowable (no/unparseable sidecar,
    or a pre-counter checkpoint)."""
    try:
        with open(os.path.join(path, "curriculum.json")) as f:
            d = json.load(f)
        if not isinstance(d, dict):
            return None
        if not d.get("refine_started", False):
            return 0
        v = d.get("refine_steps")
        return int(v) if v is not None else None
    except (FileNotFoundError, ValueError, TypeError):
        return None


def clamp_refine_iters(path: str, iterations: int, logger=None) -> int:
    """Shared untrained-refiner guard for every checkpoint-consuming entry
    point (both eval CLIs, ``PoseEstimator.from_checkpoint``): returns
    ``iterations`` unchanged when the checkpoint's refiner has been
    trained, else warns and returns 0. A trained-but-immature refiner
    (< :data:`REFINE_MATURITY_STEPS` steps) warns without clamping."""
    def _emit(msg, warning=True):
        if logger is not None:
            (logger.warning if warning else logger.info)(msg)
        else:
            import warnings
            warnings.warn(msg)

    if iterations and not refiner_is_trained(path):
        _emit(f"checkpoint {path!r} is phase-1 (curriculum refine gate "
              "never fired or no refine step has run): its bundled "
              "refiner is UNTRAINED — running 0 refinement iterations")
        return 0
    steps = refine_step_count(path)
    if iterations and steps is not None and 0 < steps < REFINE_MATURITY_STEPS:
        _emit(f"checkpoint {path!r} has an IMMATURE refiner ({steps} refine "
              f"steps < {REFINE_MATURITY_STEPS}): at this maturity iterative "
              "refinement has measurably DEGRADED accuracy (docs/PERF.md "
              "rounds 3-4) — compare against --iterations 0 / "
              "refine_iters=0 before trusting refined numbers")
    return iterations


def peek_curriculum(path: str) -> Curriculum:
    """Read a checkpoint's curriculum without touching the array state —
    used to build a phase-matching optimizer/template before loading."""
    with open(os.path.join(path, "curriculum.json")) as f:
        return Curriculum.from_dict(json.load(f))


def load_checkpoint(path: str, state_template: TrainState,
                    restore_opt: bool = True):
    """Restore (state, curriculum, config_json|None).

    ``state_template`` provides the pytree structures. Parameters/step/rng
    always restore; the optimizer state restores only with
    ``restore_opt=True`` and must then match the template's structure (build
    it for the checkpoint's phase via :func:`peek_curriculum` — a mismatch
    raises with a pointer to that instead of a bare flax error).
    """
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        raw = serialization.msgpack_restore(f.read())

    def restore(template, key):
        return serialization.from_state_dict(template, raw[key], name=key)

    opt_state = state_template.opt_state
    if restore_opt:
        try:
            opt_state = restore(state_template.opt_state, "opt_state")
        except (ValueError, KeyError) as e:
            raise ValueError(
                f"optimizer state in {path!r} does not match the template "
                f"(checkpoint phase/grad_accum differs — build the template "
                f"with peek_curriculum(), or pass restore_opt=False if you "
                f"only need parameters): {e}") from e
    state = state_template.replace(
        step=restore(state_template.step, "step"),
        params_pose=restore(state_template.params_pose, "params_pose"),
        params_refine=restore(state_template.params_refine, "params_refine"),
        opt_state=opt_state,
        rng=jax.random.wrap_key_data(
            restore(jax.random.key_data(state_template.rng), "rng")),
    )
    curriculum = peek_curriculum(path)
    cfg_path = os.path.join(path, "config.json")
    config_json = None
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config_json = f.read()
    return state, curriculum, config_json
