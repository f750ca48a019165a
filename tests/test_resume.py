"""Mid-epoch restart determinism: resuming from a checkpointed data cursor
replays exactly the remaining batches (SURVEY.md §5.3 — the elastic-recovery
capability the reference lacks)."""

import numpy as np

from densefusion_tpu.data import BatchLoader


class _IdxDataset:
    def __len__(self):
        return 23

    def __getitem__(self, i):
        return i


def test_epoch_resume_replays_exact_tail():
    loader = BatchLoader(_IdxDataset(), batch_size=4, shuffle=True, seed=3,
                         num_workers=1, collate_fn=list)
    full = list(loader.epoch(epoch=7))
    resumed = list(loader.epoch(epoch=7, start_batch=2))
    assert resumed == full[2:]
    # different epoch -> different order (re-shuffled)
    other = list(loader.epoch(epoch=8))
    assert other != full


def test_epoch_order_is_seed_deterministic():
    l1 = BatchLoader(_IdxDataset(), 4, shuffle=True, seed=11, num_workers=1,
                     collate_fn=list)
    l2 = BatchLoader(_IdxDataset(), 4, shuffle=True, seed=11, num_workers=1,
                     collate_fn=list)
    assert list(l1.epoch(0)) == list(l2.epoch(0))
