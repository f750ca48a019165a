"""Explicit collectives: mesh-sharded nearest-neighbour reductions and metric
reductions.

The ADD-S 1-NN is the one reduction in this workload that can outgrow a chip
(bs·N hypotheses x M reference points; SURVEY.md §5.7). Two shardings:

* :func:`sharded_nearest_neighbor` — REFERENCE axis sharded, queries
  replicated: every device computes a running (min, argmin) against its local
  reference shard and the global winner per query is resolved with two
  ``pmin`` collectives (min distance, then min index achieving it) — outputs
  are provably replicated, so the shard_map replication checker stays ON.
* :func:`ring_nearest_neighbor` — BOTH axes sharded: each device keeps its
  query shard and the reference tiles rotate around the ring via
  ``ppermute`` with a running (min, argmin) carried per local query — the
  ring-attention analog with ``min`` replacing softmax accumulation
  (SURVEY.md §5.7); per-device memory is O(Q/S + R/S), never the full R.

Non-divisible axes are handled by sentinel padding (far-away points that can
never win the argmin), so any Q/R works on any mesh size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from densefusion_tpu.ops.knn import nearest_neighbor

# Padded reference rows sit at this coordinate: squared distance ~1e30 — huge
# but finite (inf coords would make the kernel's ‖q‖²−2qr+‖r‖² produce NaN).
_SENTINEL = 1.0e15


def _pad_axis0(x: jax.Array, multiple: int, value: float):
    n = x.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    return jnp.concatenate(
        [x, jnp.full((pad,) + x.shape[1:], value, x.dtype)]), n


def sharded_nearest_neighbor(query: jax.Array, ref: jax.Array, mesh: Mesh,
                             axis: str = "data",
                             backend: str = "auto"):
    """1-NN with the reference axis sharded over ``mesh``.

    query: (Q, 3) replicated; ref: (R, 3), any R (sentinel-padded to the mesh
    size). Returns (sq_dist (Q,), idx (Q,)) with GLOBAL 0-based indices into
    ref. Exact ties across shards resolve to the smallest global index.
    """
    n_shards = mesh.shape[axis]
    ref_padded, _ = _pad_axis0(ref.astype(jnp.float32), n_shards, _SENTINEL)
    shard_size = ref_padded.shape[0] // n_shards

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(), P()),
    )
    def inner(q, r_local):
        d, i = nearest_neighbor(q, r_local, backend=backend)
        my_shard = jax.lax.axis_index(axis)
        i_global = i + my_shard * shard_size
        # two-step replicated merge: global min distance, then the smallest
        # global index attaining it (pmin outputs are device-invariant, so
        # the replication checker accepts P() outputs)
        d = jnp.maximum(d, 0.0)
        d_best = jax.lax.pmin(d, axis)                       # (Q,)
        i_cand = jnp.where(d == d_best, i_global, jnp.int32(2 ** 31 - 1))
        i_best = jax.lax.pmin(i_cand, axis)                  # (Q,)
        return d_best, i_best

    return inner(query.astype(jnp.float32), ref_padded)


def ring_nearest_neighbor(query: jax.Array, ref: jax.Array, mesh: Mesh,
                          axis: str = "data",
                          backend: str = "auto"):
    """1-NN with BOTH the query and reference axes sharded (SURVEY.md §5.7).

    Each device holds Q/S queries and one R/S reference tile; tiles rotate
    S times around the ICI ring (``ppermute``) with a running (min, argmin)
    per local query. query (Q, 3), ref (R, 3) — any sizes. Returns replicated
    (sq_dist (Q,), idx (Q,)); distances exact squared L2, indices global.
    """
    n_shards = mesh.shape[axis]
    q_padded, num_q = _pad_axis0(query.astype(jnp.float32), n_shards, 0.0)
    ref_padded, _ = _pad_axis0(ref.astype(jnp.float32), n_shards, _SENTINEL)
    shard_size = ref_padded.shape[0] // n_shards
    perm = [(j, (j - 1) % n_shards) for j in range(n_shards)]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
    )
    def inner(q_local, r_local):
        me = jax.lax.axis_index(axis)

        def step(s, carry):
            best_d, best_i, tile = carry
            owner = jax.lax.rem(me + s, n_shards)  # whose shard we hold now
            d, i = nearest_neighbor(q_local, tile, backend=backend)
            gi = (i + owner * shard_size).astype(jnp.int32)
            # merge; exact ties resolve to the smaller global index so the
            # result does not depend on rotation order
            take = (d < best_d) | ((d == best_d) & (gi < best_i))
            best_d = jnp.where(take, d, best_d)
            best_i = jnp.where(take, gi, best_i)
            tile = jax.lax.ppermute(tile, axis, perm)
            return best_d, best_i, tile

        nq = q_local.shape[0]
        # constants are VMA-unvarying; the carry becomes device-varying, so
        # mark the init accordingly for the replication checker
        init = (jax.lax.pcast(jnp.full((nq,), jnp.inf, jnp.float32), axis,
                              to="varying"),
                jax.lax.pcast(jnp.full((nq,), 2 ** 31 - 1, jnp.int32), axis,
                              to="varying"),
                r_local)
        best_d, best_i, _ = jax.lax.fori_loop(0, n_shards, step, init)
        return best_d, best_i

    d, i = inner(q_padded, ref_padded)
    return d[:num_q], i[:num_q]


def sharded_hypothesis_mean_dist(R: jax.Array, t: jax.Array,
                                 model: jax.Array, target: jax.Array,
                                 sym: jax.Array, mesh: Mesh,
                                 axis: str = "data", *,
                                 batch_axis: str | None = None,
                                 use_adds: bool = True,
                                 backend: str = "auto") -> jax.Array:
    """Fused ADD(-S) hypothesis distance with the HYPOTHESIS axis sharded.

    The dense loss's per-hypothesis work (N per-point pose hypotheses × M
    model points, the ADD-S min-search inside) is embarrassingly parallel
    over N — SURVEY.md §5.7's "shard the hypothesis axis" lever for when
    bs·N·M outgrows one chip (large clouds / dense CAD scans). Each device
    runs :func:`densefusion_tpu.ops.add_dist.hypothesis_mean_dist` on its
    slice of hypotheses against the replicated model/target; no collective
    is needed for the output (``dis`` is per-hypothesis), and the op's
    custom VJP differentiates through the shard_map unchanged.

    R (B, N, 3, 3), t (B, N, 3) hypothesis poses; model/target (B, M, 3)
    and sym (B,) replicated — or sharded over ``batch_axis`` on a 2-D
    ``(data, point)`` mesh (SURVEY.md §5.8): batch rides ``batch_axis``
    while the hypothesis axis rides ``axis``, so a data-parallel train step
    composes with hypothesis sharding in ONE program. Any N (zero-padded
    to the mesh size). Returns dis (B, N), sharded over N on ``axis`` (and
    over B on ``batch_axis`` when given).
    """
    from densefusion_tpu.ops.add_dist import hypothesis_mean_dist

    n = R.shape[1]
    n_shards = mesh.shape[axis]
    pad = (-n) % n_shards
    if pad:
        R = jnp.concatenate(
            [R, jnp.zeros((R.shape[0], pad, 3, 3), R.dtype)], axis=1)
        t = jnp.concatenate(
            [t, jnp.zeros((t.shape[0], pad, 3), t.dtype)], axis=1)
    ba = batch_axis

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(ba, axis), P(ba, axis), P(ba), P(ba), P(ba)),
        out_specs=P(ba, axis),
    )
    def inner(R_l, t_l, model_, target_, sym_):
        return hypothesis_mean_dist(R_l, t_l, model_, target_, sym_,
                                    use_adds=use_adds, backend=backend)

    return inner(R, t, model, target, sym)[:, :n]


def psum_mean(x: jax.Array, axis: str = "data") -> jax.Array:
    """Mean over a mesh axis, for metric reductions inside shard_map."""
    return jax.lax.pmean(x, axis)
