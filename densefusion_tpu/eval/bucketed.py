"""Shape-bucketed eval dispatch for native (ladder-shape) crops.

The reference feeds the network VARIABLE-size crops snapped to the 40-px
ladder (``datasets/ycb/dataset.py:247-289``, ``tools/eval_ycb.py:150-163``) —
for imported reference weights that input geometry is part of the contract.
On TPU every distinct shape is its own compiled program, so this dispatcher
groups samples by snapped crop shape and dispatches full batches per shape:
the 17-rung ladder bounds the number of programs (a protocol run sees ~15-25
distinct shapes), and the persistent compilation cache amortizes them across
runs. Results are scattered back to caller-supplied keys, so frame ordering
is preserved by the caller regardless of dispatch order.
"""

from __future__ import annotations

from typing import Any, Callable, Hashable, Sequence

import numpy as np

from densefusion_tpu.data.schema import PoseSample, collate


class ShapeBucketedDispatcher:
    """Buffers (key, sample) pairs per crop shape; dispatches ``run_fn`` on a
    full batch of one shape (short remainders are padded by repeating the
    first sample — a no-op numerically, their results are dropped).

    ``run_fn(batch: PoseSample) -> tuple[Array, ...]`` with leading batch
    dim on every output. ``add``/``flush_all`` return completed
    ``(key, per_sample_outputs)`` pairs.
    """

    def __init__(self, run_fn: Callable[[PoseSample], Sequence[Any]],
                 batch_size: int = 8):
        self.run_fn = run_fn
        self.batch_size = batch_size
        self.pending: dict[tuple[int, int], list] = {}
        self.shapes_dispatched: set[tuple[int, int]] = set()

    def add(self, key: Hashable, sample: PoseSample):
        shape = tuple(sample.img.shape[:2])
        buf = self.pending.setdefault(shape, [])
        buf.append((key, sample))
        if len(buf) >= self.batch_size:
            return self._flush(shape)
        return []

    def _flush(self, shape):
        buf = self.pending.pop(shape, [])
        if not buf:
            return []
        self.shapes_dispatched.add(shape)
        samples = [s for _, s in buf]
        pad = self.batch_size - len(samples)
        if pad > 0:
            samples = samples + [samples[0]] * pad
        outs = [np.asarray(o) for o in self.run_fn(collate(samples))]
        return [(buf[i][0], tuple(o[i] for o in outs))
                for i in range(len(buf))]

    def flush_all(self):
        done = []
        for shape in sorted(self.pending):
            done += self._flush(shape)
        return done
