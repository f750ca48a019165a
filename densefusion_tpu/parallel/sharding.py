"""Sharding helpers: batch-dim sharding + replication over a mesh.

With batches sharded on the ``data`` axis and parameters replicated, jitting
the existing train step is all that's needed — XLA partitions the program and
inserts the gradient ``psum`` over ICI (the pjit recipe of SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits axis 0 over the mesh's data axis."""
    return NamedSharding(mesh, P(axis))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def make_shard_batch_fn(mesh: Mesh, axis: str = "data"):
    """Returns f(batch_pytree) placing every leaf sharded on axis 0.

    Scalars/0-d leaves are replicated. Plug into
    ``Trainer(shard_batch=make_shard_batch_fn(mesh))`` to turn the
    single-chip trainer into a data-parallel one.
    """
    data_sh = batch_sharding(mesh, axis)
    rep_sh = NamedSharding(mesh, P())

    def f(batch):
        return jax.tree.map(
            lambda x: jax.device_put(
                x, data_sh if getattr(x, "ndim", 0) >= 1 else rep_sh),
            batch)

    return f
