"""Tiled nearest-neighbour search: Pallas TPU kernel + pure-XLA reference.

TPU-native replacement for the reference's CUDA KNN library
(``lib/knn/src/knn_cuda_kernel.cu:31-170``): a 16x16 shared-memory distance
kernel plus a per-column insertion sort there; here one fused Pallas kernel —
for each query-point tile, the squared-distance block ``‖q‖² − 2 q·rᵀ + ‖r‖²``
is computed as an MXU matmul against reference tiles streamed through VMEM,
with a running (min-distance, argmin-index) carried across tiles. The Q×R
distance matrix is never materialized in HBM (flash-attention-style streaming;
SURVEY.md §5.7).

Semantics: 0-based indices of the nearest `ref` point per `query` point —
the corrected form of the reference's 1-based-index convention
(``knn_cuda_kernel.cu:122`` forces callers to subtract 1,
``tools/eval_linemod.py:127``; we drop that artifact per SURVEY.md §2.2).

Only k=1 is ever used by the reference (``tools/eval_linemod.py:38``); the
general small-k path is provided via XLA top_k for API parity with
``KNearestNeighbor(k)`` (``lib/knn/__init__.py:9-23``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vma_struct(shape, dtype, *operands):
    """``jax.ShapeDtypeStruct`` for a ``pallas_call`` output that declares
    how the output varies across shard_map mesh axes (jax >= 0.9 checks
    ``vma`` on every out_shape under ``check_vma=True``): our kernels are
    elementwise-batched over their operands, so the output varies exactly
    like the union of the operands' vma sets."""
    vma = frozenset()
    for x in operands:
        v = getattr(jax.typeof(x), "vma", None)
        if v:
            vma |= v
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _pad_to(x: jax.Array, size: int, axis: int, value=0.0) -> jax.Array:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


# ---------------------------------------------------------------------------
# Pure-XLA reference (CPU tests, autodiff checks, non-TPU fallback)
# ---------------------------------------------------------------------------

def nearest_neighbor_xla(query: jax.Array, ref: jax.Array,
                         chunk: int = 4096) -> tuple[jax.Array, jax.Array]:
    """For each query point return (sq_dist, index) of its nearest ref point.

    query: (Q, 3), ref: (R, 3) -> ((Q,), (Q,)). Chunked over Q so the Q×R
    distance matrix stays bounded (the training ADD-S branch has Q = N·M up to
    ~250k per sample).
    """
    q, r = query.astype(jnp.float32), ref.astype(jnp.float32)
    r_sq = jnp.sum(r * r, axis=-1)  # (R,)

    def one_chunk(qc):
        d = jnp.sum(qc * qc, axis=-1, keepdims=True) - 2.0 * (qc @ r.T) + r_sq
        return jnp.min(d, axis=-1), jnp.argmin(d, axis=-1).astype(jnp.int32)

    n = q.shape[0]
    if n <= chunk:
        return one_chunk(q)
    n_pad = ((n + chunk - 1) // chunk) * chunk
    qp = _pad_to(q, n_pad, axis=0).reshape(n_pad // chunk, chunk, 3)
    dists, idxs = jax.lax.map(one_chunk, qp)
    return dists.reshape(n_pad)[:n], idxs.reshape(n_pad)[:n]


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _nn_kernel(q_ref, r_ref, rsq_ref, dist_out, idx_out, *, ref_tile: int,
               num_ref: int, reduction: str = "iota"):
    """One query tile vs. all reference tiles with a running argmin.

    q_ref:    (TQ, 8)   query coords (xyz zero-padded to 8 sublanes of K)
    r_ref:    (R_pad, 8) all reference coords
    rsq_ref:  (1, R_pad) reference squared norms (padded entries = +inf)
    dist_out: (TQ, 1)   min squared distance (unnormalized by q²; monotonic)
    idx_out:  (TQ, 1)   argmin index (int32)

    ``reduction`` selects the lane-reduction formulation (measured on v5e,
    ``examples/tpu_knn_bench.py``):
      - "argmin": jnp.min + jnp.argmin — the variadic (value, index) reduce
        Mosaic emits for argmin is the kernel's bottleneck.
      - "iota":   jnp.min, then a second masked-iota min to recover the
        index — two cheap single-value reductions instead of one variadic.
    """
    q = q_ref[:]  # (TQ, 8)
    num_tiles = num_ref // ref_tile

    def body(t, carry):
        best_d, best_i = carry
        r = r_ref[pl.ds(t * ref_tile, ref_tile), :]          # (TR, 8)
        rsq = rsq_ref[0, pl.ds(t * ref_tile, ref_tile)]      # (TR,)
        # ‖q−r‖² − ‖q‖² = −2 q·r + ‖r‖²  (monotonic in r for fixed q)
        scores = rsq[None, :] - 2.0 * jax.lax.dot_general(
            q, r, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # (TQ, TR)
        tile_d = jnp.min(scores, axis=-1)                     # (TQ,)
        if reduction == "argmin":
            tile_i = (jnp.argmin(scores, axis=-1).astype(jnp.int32)
                      + t * ref_tile)
        else:
            # first index attaining the min: min over an iota masked to the
            # argmin positions (ties -> lowest index, matching argmin)
            lanes = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            masked = jnp.where(scores <= tile_d[:, None], lanes, ref_tile)
            tile_i = jnp.min(masked, axis=-1) + t * ref_tile
        take = tile_d < best_d
        return jnp.where(take, tile_d, best_d), jnp.where(take, tile_i, best_i)

    init = (jnp.full((q.shape[0],), jnp.inf, jnp.float32),
            jnp.zeros((q.shape[0],), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, num_tiles, body, init)
    dist_out[:] = best_d[:, None]
    idx_out[:] = best_i[:, None]


@functools.partial(jax.jit,
                   static_argnames=("query_tile", "ref_tile", "reduction"))
def nearest_neighbor_pallas(query: jax.Array, ref: jax.Array,
                            query_tile: int = 512,
                            ref_tile: int = 512,
                            reduction: str = "iota"
                            ) -> tuple[jax.Array, jax.Array]:
    """Pallas fused distance+argmin. query (Q,3), ref (R,3) -> ((Q,), (Q,)).

    Returned distances are exact squared L2 (``q² − 2qr + r²``; the q² term is
    added back outside the kernel since it does not affect the argmin).
    """
    num_q, num_r = query.shape[0], ref.shape[0]
    q_pad = ((num_q + query_tile - 1) // query_tile) * query_tile
    r_pad = ((num_r + ref_tile - 1) // ref_tile) * ref_tile

    # Pad K-dim 3 -> 8 (f32 sublane tile) so the MXU contraction is aligned.
    q = _pad_to(_pad_to(query.astype(jnp.float32), q_pad, 0), 8, 1)
    r = _pad_to(_pad_to(ref.astype(jnp.float32), r_pad, 0), 8, 1)
    rsq = jnp.sum(r * r, axis=-1)
    # Mask padded reference rows out of the argmin.
    rsq = jnp.where(jnp.arange(r_pad) < num_r, rsq, jnp.inf)[None, :]

    grid = (q_pad // query_tile,)
    dist, idx = pl.pallas_call(
        functools.partial(_nn_kernel, ref_tile=ref_tile, num_ref=r_pad,
                          reduction=reduction),
        grid=grid,
        in_specs=[
            pl.BlockSpec((query_tile, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((query_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _vma_struct((q_pad, 1), jnp.float32, query, ref),
            _vma_struct((q_pad, 1), jnp.int32, query, ref),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_pad * r_pad * 8 + 2 * q_pad * r_pad,
            bytes_accessed=(q_pad * 8 + r_pad * 8 + r_pad) * 4 + q_pad * 8,
            transcendentals=0,
        ),
    )(q, r, rsq)

    dist = dist[:num_q, 0] + jnp.sum(query.astype(jnp.float32) ** 2, axis=-1)
    return dist, idx[:num_q, 0]


# ---------------------------------------------------------------------------
# Batched Pallas kernel (batch in the grid, sublane reduction)
# ---------------------------------------------------------------------------
#
# The rank-2 kernel above vmaps badly: XLA lays the resulting rank-3 arrays
# out as T(8, 128) over the trailing dims, so the (B, Q, 8) padded coords
# expand 16x and the (B, Q, 1) outputs 128x in HBM — a 23.6 GB program at
# the batch-32 training shape (B·N·M queries). This kernel instead:
#   * carries batch as a grid dimension over (B, 8, Q) / (B, 8, R)
#     TRANSPOSED coordinates — the (8, lanes) trailing tile is exactly the
#     f32 layout tile, so there is zero padding waste;
#   * reduces over the SUBLANE axis (refs on sublanes, queries on lanes):
#     a sublane min is elementwise vreg ops, measurably faster than the
#     cross-lane reduction the lane-axis formulation needs.


def _nn_kernel_bt(q_ref, r_ref, rsq_ref, dist_out, idx_out, *, ref_tile: int,
                  num_ref: int):
    """One (batch, query-tile) grid step, refs streamed over sublane tiles.

    q_ref:    (1, 8, TQ)    query coords, transposed (xyz + zero pad rows)
    r_ref:    (1, 8, R_pad) this sample's reference coords, transposed
    rsq_ref:  (1, 1, R_pad) reference squared norms (+inf on padding)
    dist_out: (1, 1, TQ)    min ``‖r‖² − 2 q·r`` per query (monotonic)
    idx_out:  (1, 1, TQ)    argmin index (int32, ties -> lowest)
    """
    q = q_ref[0]                                    # (8, TQ)
    num_tiles = num_ref // ref_tile

    def body(t, carry):
        best_d, best_i = carry
        r = r_ref[0, :, pl.ds(t * ref_tile, ref_tile)]        # (8, TR)
        rsq = rsq_ref[0, 0, pl.ds(t * ref_tile, ref_tile)]    # (TR,)
        scores = rsq[:, None] - 2.0 * jax.lax.dot_general(
            r, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # (TR, TQ)
        tile_d = jnp.min(scores, axis=0)                      # (TQ,)
        rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
        masked = jnp.where(scores <= tile_d[None, :], rows, ref_tile)
        tile_i = jnp.min(masked, axis=0) + t * ref_tile
        take = tile_d < best_d
        return (jnp.where(take, tile_d, best_d),
                jnp.where(take, tile_i, best_i))

    init = (jnp.full((q.shape[1],), jnp.inf, jnp.float32),
            jnp.zeros((q.shape[1],), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, num_tiles, body, init)
    dist_out[0, 0, :] = best_d
    idx_out[0, 0, :] = best_i


@functools.partial(jax.jit, static_argnames=("query_tile", "ref_tile"))
def nearest_neighbor_pallas_batched(query: jax.Array, ref: jax.Array,
                                    query_tile: int = 512,
                                    ref_tile: int = 512
                                    ) -> tuple[jax.Array, jax.Array]:
    """Batched fused 1-NN: query (B, Q, 3), ref (B, R, 3) ->
    ((B, Q), (B, Q)) exact squared distances + indices. This is the training
    ADD-S path (B samples × N·M hypothesis points vs each sample's M target
    points) — see the layout rationale above."""
    bsz, num_q, _ = query.shape
    num_r = ref.shape[1]
    q_pad = ((num_q + query_tile - 1) // query_tile) * query_tile
    r_pad = ((num_r + ref_tile - 1) // ref_tile) * ref_tile

    qt = jnp.swapaxes(_pad_to(query.astype(jnp.float32), q_pad, 1), 1, 2)
    qt = _pad_to(qt, 8, 1)                               # (B, 8, Q_pad)
    rt = jnp.swapaxes(_pad_to(ref.astype(jnp.float32), r_pad, 1), 1, 2)
    rt = _pad_to(rt, 8, 1)                               # (B, 8, R_pad)
    rsq = jnp.sum(rt * rt, axis=1)                       # (B, R_pad)
    rsq = jnp.where(jnp.arange(r_pad)[None, :] < num_r, rsq,
                    jnp.inf)[:, None, :]                 # (B, 1, R_pad)

    grid = (bsz, q_pad // query_tile)
    dist, idx = pl.pallas_call(
        functools.partial(_nn_kernel_bt, ref_tile=ref_tile, num_ref=r_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, query_tile), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, r_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, r_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, query_tile), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, query_tile), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _vma_struct((bsz, 1, q_pad), jnp.float32, query, ref),
            _vma_struct((bsz, 1, q_pad), jnp.int32, query, ref),
        ],
        cost_estimate=pl.CostEstimate(
            flops=bsz * (2 * q_pad * r_pad * 8 + 2 * q_pad * r_pad),
            bytes_accessed=bsz * ((q_pad * 8 + r_pad * 9) * 4 + q_pad * 8),
            transcendentals=0,
        ),
    )(qt, rt, rsq)

    dist = dist[:, 0, :num_q] + jnp.sum(query.astype(jnp.float32) ** 2,
                                        axis=-1)
    return dist, idx[:, 0, :num_q]


def _remap_kernel_bt(active_ref, q_ref, r_ref, rsq_ref, coord_out, *,
                     ref_tile: int, num_ref: int, extract: str = "select"):
    """Fused ADD-S remap: nearest-ref COORDINATES per query, no index
    gather — ``jnp.take_along_axis`` over the argmin indices lowers to a
    scalar gather loop on TPU that costs ~9x the whole NN kernel at the
    training shape (docs/PERF.md round 2c).

    ``active_ref`` is a scalar-prefetched (B,) int32 mask: the whole search
    is skipped for inactive batch rows (the training loss only consumes the
    remap for SYMMETRIC samples, the reference's per-sample branch at
    ``lib/loss.py:40`` — on YCB that is ~1/4 of a batch in expectation, so
    gating recovers ~4x of the step's dominant term). Skipped rows emit
    zeros, which the caller's ``where`` discards.

    ``extract`` picks how the winning ref's coords leave the tile:
      - "select":  per coordinate, min over the rows masked to the argmin
        row — three exact where+sublane-min passes, no matmul.
      - "matmul" / "matmul_exact": one-hot MXU matmul at default / HIGHEST
        precision (default rounds coords through bf16 passes).

    coord_out: (1, 8, TQ) — rows 0..2 hold the xyz of the nearest ref;
    row 3 holds the winning ``‖r‖² − 2 q·r`` score (the min squared
    distance MINUS ‖q‖², which the caller adds back — this lets the loss
    consume the ADD-S distance without ever materializing the
    (B, N, M, 3) difference tensor).
    """
    q = q_ref[0]                                    # (8, TQ)
    num_tiles = num_ref // ref_tile
    tq = q.shape[1]

    def body(t, carry):
        best_d, best_c = carry
        r = r_ref[0, :, pl.ds(t * ref_tile, ref_tile)]        # (8, TR)
        rsq = rsq_ref[0, 0, pl.ds(t * ref_tile, ref_tile)]    # (TR,)
        scores = rsq[:, None] - 2.0 * jax.lax.dot_general(
            r, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # (TR, TQ)
        tile_d = jnp.min(scores, axis=0)                      # (TQ,)
        rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
        masked = jnp.where(scores <= tile_d[None, :], rows, ref_tile)
        tile_i = jnp.min(masked, axis=0)                      # (TQ,) local
        sel = rows == tile_i[None, :]                         # (TR, TQ)
        if extract == "select":
            inf = jnp.float32(jnp.inf)
            coords = jnp.stack(
                [jnp.min(jnp.where(sel, r[c][:, None], inf), axis=0)
                 for c in range(3)]
                + [tile_d] + [jnp.zeros((tq,), jnp.float32)] * 4)
        else:
            precision = (jax.lax.Precision.HIGHEST
                         if extract == "matmul_exact" else None)
            coords = jax.lax.dot_general(                     # (8, TQ)
                r, sel.astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
            coords = coords.at[3].set(tile_d)
        take = tile_d < best_d
        return (jnp.where(take, tile_d, best_d),
                jnp.where(take[None, :], coords, best_c))

    b = pl.program_id(0)

    @pl.when(active_ref[b] != 0)
    def _run():
        init = (jnp.full((tq,), jnp.inf, jnp.float32),
                jnp.zeros((8, tq), jnp.float32))
        _, best_c = jax.lax.fori_loop(0, num_tiles, body, init)
        coord_out[0] = best_c

    @pl.when(active_ref[b] == 0)
    def _skip():
        coord_out[0] = jnp.zeros((8, tq), jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("query_tile", "ref_tile", "extract"))
def adds_remap_pallas_batched(query: jax.Array, ref: jax.Array,
                              active: jax.Array | None = None,
                              query_tile: int = 512,
                              ref_tile: int = 512,
                              extract: str = "select"
                              ) -> tuple[jax.Array, jax.Array]:
    """query (B, Q, 3), ref (B, R, 3) -> (coords (B, Q, 3), dm (B, Q)):
    each query's nearest ref point plus its winning ``‖r‖² − 2 q·r`` score
    (min squared distance minus ``‖q‖²``), computed fully in-kernel (see
    :func:`_remap_kernel_bt`). Outputs are non-differentiable (the remap
    target is ground-truth data in every call site; use
    :func:`adds_min_sqdist_minus_qsq` for the differentiable distance).
    ``active`` is an optional (B,) bool mask — rows with ``active == False``
    skip the search and return zeros (the caller discards them)."""
    bsz, num_q, _ = query.shape
    num_r = ref.shape[1]
    q_pad = ((num_q + query_tile - 1) // query_tile) * query_tile
    r_pad = ((num_r + ref_tile - 1) // ref_tile) * ref_tile

    query = jax.lax.stop_gradient(query)
    ref = jax.lax.stop_gradient(ref)
    qt = jnp.swapaxes(_pad_to(query.astype(jnp.float32), q_pad, 1), 1, 2)
    qt = _pad_to(qt, 8, 1)                               # (B, 8, Q_pad)
    rt = jnp.swapaxes(_pad_to(ref.astype(jnp.float32), r_pad, 1), 1, 2)
    rt = _pad_to(rt, 8, 1)                               # (B, 8, R_pad)
    rsq = jnp.sum(rt * rt, axis=1)
    rsq = jnp.where(jnp.arange(r_pad)[None, :] < num_r, rsq,
                    jnp.inf)[:, None, :]                 # (B, 1, R_pad)
    if active is None:
        act = jnp.ones((bsz,), jnp.int32)
    else:
        act = active.astype(jnp.int32)

    grid = (bsz, q_pad // query_tile)
    coords = pl.pallas_call(
        functools.partial(_remap_kernel_bt, ref_tile=ref_tile,
                          num_ref=r_pad, extract=extract),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 8, query_tile), lambda b, i, s: (b, 0, i)),
                pl.BlockSpec((1, 8, r_pad), lambda b, i, s: (b, 0, 0)),
                pl.BlockSpec((1, 1, r_pad), lambda b, i, s: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, query_tile),
                                   lambda b, i, s: (b, 0, i)),
        ),
        out_shape=_vma_struct((bsz, 8, q_pad), jnp.float32, query, ref),
        cost_estimate=pl.CostEstimate(
            flops=bsz * (4 * q_pad * r_pad * 8 + 4 * q_pad * r_pad),
            bytes_accessed=bsz * ((q_pad * 8 * 2 + r_pad * 9) * 4),
            transcendentals=0,
        ),
    )(act, qt, rt, rsq)

    return (jnp.swapaxes(coords[:, :3, :num_q], 1, 2),   # (B, Q, 3)
            coords[:, 3, :num_q])                        # (B, Q)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def nearest_neighbor(query: jax.Array, ref: jax.Array,
                     backend: str = "auto") -> tuple[jax.Array, jax.Array]:
    """1-NN: for each query (…, Q, 3) point, (sq_dist, index) of the nearest
    ref (…, R, 3) point. Batched via vmap over leading dims; dispatches to the
    Pallas kernel on TPU and the XLA path elsewhere."""
    if query.ndim != ref.ndim:
        raise ValueError(f"rank mismatch: {query.shape} vs {ref.shape}")
    use_pallas = backend == "pallas" or (backend == "auto" and _on_tpu())
    if query.ndim > 2:
        if use_pallas:
            # batched kernel (batch rides the grid) — vmapping the rank-2
            # kernel forces catastrophically padded rank-3 layouts
            lead = query.shape[:-2]
            d, i = nearest_neighbor_pallas_batched(
                query.reshape((-1,) + query.shape[-2:]),
                ref.reshape((-1,) + ref.shape[-2:]))
            return d.reshape(lead + d.shape[-1:]), \
                i.reshape(lead + i.shape[-1:])
        fn = functools.partial(nearest_neighbor, backend=backend)
        for _ in range(query.ndim - 2):
            fn = jax.vmap(fn)
        return fn(query, ref)
    if use_pallas:
        return nearest_neighbor_pallas(query, ref)
    return nearest_neighbor_xla(query, ref)


def knn(query: jax.Array, ref: jax.Array, k: int = 1,
        backend: str = "auto") -> tuple[jax.Array, jax.Array]:
    """k-NN returning (sq_dists (…, Q, k), indices (…, Q, k)), ascending.

    API parity with the reference's ``KNearestNeighbor(k)`` wrapper
    (``lib/knn/__init__.py:9-23``) minus its 1-based indexing. k=1 takes the
    fused streaming path; small k>1 falls back to top_k over the distance
    matrix (never needed by the reference pipelines).
    """
    if k == 1:
        d, i = nearest_neighbor(query, ref, backend=backend)
        return d[..., None], i[..., None]
    q, r = query.astype(jnp.float32), ref.astype(jnp.float32)
    d = (jnp.sum(q * q, axis=-1, keepdims=True)
         - 2.0 * q @ jnp.swapaxes(r, -1, -2)
         + jnp.sum(r * r, axis=-1)[..., None, :])
    neg_d, idx = jax.lax.top_k(-d, k)
    return -neg_d, idx.astype(jnp.int32)


def adds_remap_targets(pred: jax.Array, target: jax.Array,
                       backend: str = "auto",
                       active: jax.Array | None = None) -> jax.Array:
    """ADD-S target remap: for each predicted point, substitute its nearest
    target point (the corrected semantics of the reference's symmetric-object
    branch, ``lib/loss.py:40-47`` / ``tools/eval_linemod.py:123-128``).

    pred (..., P, 3), target (..., M, 3) -> (..., P, 3).

    The argmin indices are piecewise-constant in the inputs, so the NN search
    runs on stop-gradiented inputs — this keeps the Pallas kernel (which has
    no VJP rule) out of the autodiff path; the remapped target is ground
    truth (never differentiated), and the caller's distance provides the
    correct ADD-S subgradient through ``pred``.

    On TPU this runs the fully fused remap kernel (coords extracted with a
    one-hot MXU matmul per tile): the ``take_along_axis`` fallback lowers to
    a scalar gather loop that costs ~9x the NN search itself at the training
    shape (B, N·M, 3) (docs/PERF.md round 2c).
    """
    use_pallas = backend == "pallas" or (backend == "auto" and _on_tpu())
    if use_pallas and pred.ndim in (2, 3):
        lead = pred.shape[:-2]
        out, _ = adds_remap_pallas_batched(
            pred.reshape((-1,) + pred.shape[-2:]),
            target.reshape((-1,) + target.shape[-2:]),
            None if active is None else active.reshape(-1))
        return out.reshape(lead + out.shape[-2:])
    _, idx = nearest_neighbor(jax.lax.stop_gradient(pred),
                              jax.lax.stop_gradient(target), backend=backend)
    return jnp.take_along_axis(target, idx[..., None].astype(jnp.int32), axis=-2)


# ---------------------------------------------------------------------------
# Differentiable ADD-S min distance (no (B, N, M, 3) difference tensor)
# ---------------------------------------------------------------------------
#
# The symmetric loss needs d²(pred) = min_k ‖pred − tgt_k‖², differentiable
# in pred. Materializing the remapped targets and taking the norm costs
# several passes over the (B, N·M, 3) hypothesis tensor; instead we return
# the kernel's winning score dm = d² − ‖pred‖² directly (the caller adds the
# differentiable ‖pred‖² term back), with the analytically exact gradient
# ∇_pred dm = −2 · nearest_coords — the argmin is piecewise-constant, so
# away from ties d(dm) = d(−2 pred·c + ‖c‖²) = −2 c · d(pred).


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def adds_min_sqdist_minus_qsq(pred: jax.Array, target: jax.Array,
                              active: jax.Array | None = None,
                              backend: str = "auto") -> jax.Array:
    """pred (B, Q, 3), target (B, R, 3) -> (B, Q): for each pred point, the
    squared distance to its nearest target point MINUS ``‖pred‖²``
    (monotonic-equivalent; add ``jnp.sum(pred**2, -1)`` for the true d²).
    Differentiable in ``pred`` (exact subgradient); ``target`` is treated as
    data. ``active`` (B,) gates the search per batch row (inactive rows
    return zeros)."""
    dm, _ = _min_sqdist_impl(pred, target, active, backend)
    return dm


def _min_sqdist_impl(pred, target, active, backend):
    use_pallas = backend == "pallas" or (backend == "auto" and _on_tpu())
    if use_pallas:
        coords, dm = adds_remap_pallas_batched(pred, target, active)
        return dm, coords
    p = jax.lax.stop_gradient(pred)
    t = jax.lax.stop_gradient(target)
    d2, idx = nearest_neighbor(p, t, backend=backend)
    coords = jnp.take_along_axis(t, idx[..., None].astype(jnp.int32),
                                 axis=-2)
    dm = d2 - jnp.sum(p * p, axis=-1)
    if active is not None:
        act = active.astype(bool)
        dm = jnp.where(act[:, None], dm, 0.0)
        coords = jnp.where(act[:, None, None], coords, 0.0)
    return dm, coords


def _min_sqdist_fwd(pred, target, active, backend):
    dm, coords = _min_sqdist_impl(pred, target, active, backend)
    return dm, (coords, jnp.zeros_like(target))


def _min_sqdist_bwd(backend, res, g):
    coords, tgt_zeros = res
    return (-2.0 * g[..., None] * coords, tgt_zeros, None)


adds_min_sqdist_minus_qsq.defvjp(_min_sqdist_fwd, _min_sqdist_bwd)
