"""Checkpointing: full train state (params, optimizer, curriculum, RNG, data
cursor) + run config in one directory.

Replaces the reference's bare ``torch.save(state_dict())`` flavors
(``tools/train.py:172-176,211-217``) with restartable checkpoints: the same
current/best policy, but a resume continues mid-epoch with identical data
order (SURVEY.md §5.3-5.4). Format: flax msgpack for the pytree + JSON
sidecars (no pickle, no framework lock-in).
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


def load_checkpoint(path: str, state_template: TrainState):
    """Restore (state, curriculum, config_json|None). ``state_template`` must
    be a freshly-initialized state of identical structure."""
    template = state_template.replace(
        rng=jax.random.key_data(state_template.rng))
    with open(os.path.join(path, "state.msgpack"), "rb") as f:
        state = serialization.from_bytes(template, f.read())
    state = state.replace(rng=jax.random.wrap_key_data(state.rng))
    with open(os.path.join(path, "curriculum.json")) as f:
        curriculum = Curriculum.from_dict(json.load(f))
    cfg_path = os.path.join(path, "config.json")
    config_json = None
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            config_json = f.read()
    return state, curriculum, config_json
