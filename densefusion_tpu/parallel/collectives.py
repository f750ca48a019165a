"""Explicit collectives: mesh-sharded nearest-neighbour reduction and metric
reductions.

The ADD-S 1-NN is the one reduction in this workload that can outgrow a chip
(bs·N hypotheses x M reference points; SURVEY.md §5.7). Here the REFERENCE
axis is sharded over the mesh: every device computes a running (min, argmin)
against its local reference shard — the same streaming kernel as on-chip —
and the global winner is resolved with one ``all_gather`` of (distance,
index) pairs per query. This is the ring-attention analog with ``min``
replacing softmax accumulation (the all_gather of 2 scalars per query is the
cheap part; the N·M distance work stays fully sharded).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from densefusion_tpu.ops.knn import nearest_neighbor


def sharded_nearest_neighbor(query: jax.Array, ref: jax.Array, mesh: Mesh,
                             axis: str = "data",
                             backend: str = "auto"):
    """1-NN with the reference axis sharded over ``mesh``.

    query: (Q, 3) replicated; ref: (R, 3) — R must divide by the axis size.
    Returns (sq_dist (Q,), idx (Q,)) with GLOBAL 0-based indices into ref.
    """
    n_shards = mesh.shape[axis]
    shard_size = ref.shape[0] // n_shards

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
        # the all_gather+argmin makes outputs replicated; the static
        # replication checker can't see that through take_along_axis
        check_vma=False,
    )
    def inner(q, r_local):
        d, i = nearest_neighbor(q, r_local, backend=backend)
        my_shard = jax.lax.axis_index(axis)
        i_global = i + my_shard * shard_size
        # gather per-shard candidates, pick the global winner per query
        d_all = jax.lax.all_gather(d, axis)        # (S, Q)
        i_all = jax.lax.all_gather(i_global, axis)  # (S, Q)
        best = jnp.argmin(d_all, axis=0)           # (Q,)
        return (jnp.take_along_axis(d_all, best[None], axis=0)[0],
                jnp.take_along_axis(i_all, best[None], axis=0)[0])

    return inner(query, ref)


def psum_mean(x: jax.Array, axis: str = "data") -> jax.Array:
    """Mean over a mesh axis, for metric reductions inside shard_map."""
    return jax.lax.pmean(x, axis)
