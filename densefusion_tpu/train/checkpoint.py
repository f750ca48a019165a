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
    Eval entry points use this to clamp refinement iterations to 0 with a
    warning. Checkpoints without a curriculum sidecar (e.g. torch imports
    that predate it) are assumed trained.
    """
    try:
        return bool(peek_curriculum(path).refine_started)
    except (FileNotFoundError, KeyError, ValueError):
        return True


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
