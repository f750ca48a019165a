"""Training: jitted train/eval steps, two-phase curriculum, checkpointing.

Re-design of ``tools/train.py:51-254``: true batching with donated train
state (the reference is batch-1 with gradient accumulation), the same
curriculum gates (lr/w decay when best avg distance < 0.03, refiner phase
when < 0.02, ``tools/train.py:219-251``), and full-state checkpoints
(params + optimizer + curriculum + RNG + data cursor) instead of bare
``state_dict`` files (SURVEY.md §5.4).
"""

from densefusion_tpu.train.state import TrainState, Curriculum, create_train_state
from densefusion_tpu.train.steps import (
    make_pose_train_step, make_refine_train_step, make_eval_step,
)
from densefusion_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint, peek_config, refiner_is_trained,
    clamp_refine_iters,
)
from densefusion_tpu.train.loop import Trainer

__all__ = [
    "TrainState", "Curriculum", "create_train_state",
    "make_pose_train_step", "make_refine_train_step", "make_eval_step",
    "peek_config", "refiner_is_trained", "clamp_refine_iters",
    "save_checkpoint", "load_checkpoint", "Trainer",
]
