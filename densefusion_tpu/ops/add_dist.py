"""Fused ADD / ADD-S hypothesis mean-distance: Pallas TPU kernels + XLA ref.

The dense pose loss needs, for every per-point hypothesis ``(R_n, t_n)``,

    dis[b, n] = mean_m ‖R_n · model_m + t_n − tgt(m)‖            (ADD)
    dis[b, n] = mean_m min_k ‖R_n · model_m + t_n − target_k‖    (ADD-S)

differentiable in ``(R, t)``. The straightforward formulation materializes
the hypothesis-transformed cloud ``pred`` of shape (B, N, M, 3) — 96 MB at
the batch-32 YCB training shape — and streams it through HBM several times
in each of forward and backward (the round-2c profile put this machinery at
~40 ms of the 73 ms device-side train grad). These kernels never build it:

* **Paired kernel** (ADD, the asymmetric branch of ``lib/loss.py:33-49``):
  model/target tiles stream through VMEM on sublanes against a lane tile of
  hypotheses; the (TM, TN) difference block is (re)built from nine
  outer-product FMAs and reduced in place.
* **Min kernel** (ADD-S, the symmetric branch ``lib/loss.py:40-48``): the
  query points are GENERATED in-kernel from ``(R_n, t_n, model)`` (the
  materialized-query remap kernel in :mod:`densefusion_tpu.ops.knn` pays a
  (B, 8, N·M) streaming/transpose cost even for gated-off rows), then the
  usual streaming ``‖r‖² − 2 q·r`` MXU search with running winning-coordinate
  extraction runs per hypothesis group.

**Gradient trick**: the loss consumes ``dis`` through per-(b, n) scalar
weights only, so ∂dis[b,n]/∂R_n (9 numbers) and ∂dis[b,n]/∂t_n (3 numbers)
are complete gradient state. Both kernels emit these coefficients alongside
the value — ``A_cj = Σ_m u_c·model_j / M`` and ``s_c = Σ_m u_c / M`` with
``u = (pred − tgt*)/max(d, √eps)`` — as one extra MXU matmul per coordinate
(a ones-column in the model operand yields ``s`` for free). The custom VJP
is then a pointwise multiply; backward re-runs nothing.

Numerics: ``d = sqrt(max(d², 1e-12))`` with zero gradient below the floor —
the same 1 µm floor as the losses (sqrt's gradient NaNs at exactly 0, which
near-converged training hits). The symmetric distance is computed from the
winning coordinates directly (``Σ_c (q_c − c*_c)²``), avoiding the
catastrophic cancellation of the factored ``‖q‖² − 2 q·c + ‖c‖²`` form.

Replaces the capability of the reference's loss distance core
(``lib/loss.py:30-49``, ``lib/loss_refiner.py:30-48``) and its CUDA KNN
dependency for the training path (``lib/knn/src/knn_cuda_kernel.cu``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from densefusion_tpu.ops.knn import nearest_neighbor

EPS = 1e-12  # squared-distance floor: 1 µm distance, zero gradient below


from densefusion_tpu.ops.knn import _vma_struct


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_axis(x: jax.Array, size: int, axis: int) -> jax.Array:
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ---------------------------------------------------------------------------
# Pure-XLA reference (CPU tests, autodiff checks, non-TPU fallback)
# ---------------------------------------------------------------------------

def hypothesis_mean_dist_xla(R: jax.Array, t: jax.Array, model: jax.Array,
                             target: jax.Array, sym: jax.Array,
                             use_adds: bool = True) -> jax.Array:
    """Reference implementation. R (B, N, 3, 3), t (B, N, 3),
    model/target (B, M, 3), sym (B,) bool -> dis (B, N).

    Natively differentiable (the ADD-S argmin is stop-gradiented; the
    distance uses the winning coordinates directly, matching the kernels)."""
    pred = jnp.einsum("bmj,bnij->bnmi", model.astype(jnp.float32),
                      R.astype(jnp.float32)) \
        + t.astype(jnp.float32)[:, :, None, :]                 # (B, N, M, 3)
    diff = pred - target.astype(jnp.float32)[:, None]
    d2 = jnp.sum(diff * diff, axis=-1)                         # (B, N, M)
    if use_adds:
        b, n, m, _ = pred.shape
        flat = pred.reshape(b, n * m, 3)
        _, idx = nearest_neighbor(jax.lax.stop_gradient(flat),
                                  jax.lax.stop_gradient(target),
                                  backend="xla")
        coords = jnp.take_along_axis(
            jax.lax.stop_gradient(target.astype(jnp.float32)),
            idx[..., None].astype(jnp.int32), axis=-2).reshape(b, n, m, 3)
        ds = pred - coords
        d2 = jnp.where(sym[:, None, None], jnp.sum(ds * ds, axis=-1), d2)
    return jnp.sqrt(jnp.maximum(d2, EPS)).mean(axis=-1)


# ---------------------------------------------------------------------------
# Paired (ADD) kernel
# ---------------------------------------------------------------------------
#
# Layouts (f32):
#   rt       (B, 16, N_pad)  rows 0..8 = R[c, j] at 3c+j; 9..11 = t; pad 0
#   model_s  (B, M_pad, 8)   cols 0..2 coords, col 3 = 1.0, rest 0
#   target_s (B, M_pad, 8)   cols 0..2 coords
#   out      (B, 16, N_pad)  row 0 = dis; 1+3c+j = ∂dis/∂R[c,j]; 10+c = ∂dis/∂t[c]


def _paired_kernel(act_ref, rt_ref, model_ref, target_ref, out_ref, *,
                   m_tile: int, num_m: int, m_pad: int):
    b = pl.program_id(0)

    @pl.when(act_ref[b] != 0)
    def _run():
        rt = rt_ref[0]                                         # (16, TN)
        tn = rt.shape[1]
        inv_m = jnp.float32(1.0 / num_m)

        def body(mt, carry):
            dis_acc, grad_acc = carry                          # (TN,), 3×(8,TN)
            mdl = model_ref[0, pl.ds(mt * m_tile, m_tile), :]  # (TM, 8)
            tgt = target_ref[0, pl.ds(mt * m_tile, m_tile), :]
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (m_tile, 1), 0) + mt * m_tile
            mask = (rows < num_m).astype(jnp.float32)          # (TM, 1)

            diffs = []
            d2 = jnp.zeros((m_tile, tn), jnp.float32)
            for c in range(3):
                dc = (mdl[:, 0:1] * rt[3 * c + 0][None, :]
                      + mdl[:, 1:2] * rt[3 * c + 1][None, :]
                      + mdl[:, 2:3] * rt[3 * c + 2][None, :]
                      + rt[9 + c][None, :] - tgt[:, c:c + 1])  # (TM, TN)
                diffs.append(dc)
                d2 = d2 + dc * dc
            d2f = jnp.maximum(d2, EPS)
            d = jnp.sqrt(d2f)
            dis_acc = dis_acc + jnp.sum(d * mask, axis=0) * inv_m
            # u = diff / d, zeroed below the floor and on padded m rows
            inv_d = jnp.where(d2 > EPS, jax.lax.rsqrt(d2f), 0.0) \
                * mask * inv_m                                  # (TM, TN)
            new_grad = []
            for c in range(3):
                u_c = diffs[c] * inv_d
                # (8, TN): rows 0..2 = Σ_m u_c·model_j, row 3 = Σ_m u_c
                g_c = jax.lax.dot_general(
                    mdl, u_c, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                new_grad.append(grad_acc[c] + g_c)
            return dis_acc, tuple(new_grad)

        init = (jnp.zeros((tn,), jnp.float32),
                tuple(jnp.zeros((8, tn), jnp.float32) for _ in range(3)))
        dis, grads = jax.lax.fori_loop(0, m_pad // m_tile, body, init)
        out = jnp.concatenate(
            [dis[None, :]]
            + [grads[c][j][None, :] for c in range(3) for j in range(3)]
            + [grads[c][3][None, :] for c in range(3)]
            + [jnp.zeros((3, tn), jnp.float32)], axis=0)        # (16, TN)
        out_ref[0] = out

    @pl.when(act_ref[b] == 0)
    def _skip():
        out_ref[0] = jnp.zeros_like(out_ref[0])


@functools.partial(jax.jit, static_argnames=("num_m",))
def _paired_call(act, rt, model_s, target_s, num_m):
    bsz, _, n_pad = rt.shape
    m_pad = model_s.shape[1]
    m_tile = min(512, m_pad)
    n_tile = min(512, n_pad)
    grid = (bsz, n_pad // n_tile)
    return pl.pallas_call(
        functools.partial(_paired_kernel, m_tile=m_tile, num_m=num_m,
                          m_pad=m_pad),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 16, n_tile), lambda b, i, s: (b, 0, i)),
                pl.BlockSpec((1, m_pad, 8), lambda b, i, s: (b, 0, 0)),
                pl.BlockSpec((1, m_pad, 8), lambda b, i, s: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 16, n_tile),
                                   lambda b, i, s: (b, 0, i)),
        ),
        out_shape=_vma_struct((bsz, 16, n_pad), jnp.float32,
                              rt, model_s, target_s),
        cost_estimate=pl.CostEstimate(
            flops=bsz * n_pad * m_pad * 60,
            bytes_accessed=bsz * (16 * n_pad * 2 + m_pad * 16) * 4,
            transcendentals=bsz * n_pad * m_pad,
        ),
    )(act, rt, model_s, target_s)


# ---------------------------------------------------------------------------
# Min (ADD-S) kernel — queries generated in-kernel
# ---------------------------------------------------------------------------
#
# Extra layouts:
#   rt_t     (B, N_pad, 16)  hypothesis rows (same 16-row layout, transposed)
#   model_l  (B, 8, M_pad)   rows 0..2 model coords (lane layout)
#   target_l (B, 8, M_pad)   rows 0..2 target coords
#   out      (B, N_pad, 16)  per-hypothesis row: [dis, A00..A22, s0..s2, 0×3]
#
# Each grid step handles a sublane-aligned block of 8 hypotheses, statically
# unrolled in groups of G: a group's query points are laid side by side on
# lanes ((8, G·M_pad)) so the streaming MXU search runs once per group,
# amortizing its reduction cost; G shrinks as M grows to bound VMEM.


def _min_kernel(act_ref, rt_ref, model_l_ref, target_l_ref, tsq_ref,
                model_s_ref, out_ref, *, group: int, ref_tile: int,
                num_m: int, m_pad: int, num_n: int):
    b = pl.program_id(0)
    blk = pl.program_id(1)

    @pl.when(act_ref[b] != 0)
    def _run():
        # zero first: hypothesis rows beyond num_n skip their group below
        # (the refiner shape is N=1 — without the skip, 7 of each block's 8
        # sublane rows would run the full search on padding)
        out_ref[0] = jnp.zeros_like(out_ref[0])
        lanes = group * m_pad
        inv_m = jnp.float32(1.0 / num_m)
        mrow = [model_l_ref[0, j:j + 1, :] for j in range(3)]  # (1, M_pad)
        mmask1 = (jax.lax.broadcasted_iota(jnp.int32, (1, m_pad), 1)
                  < num_m).astype(jnp.float32)
        mmask = (mmask1 if group == 1
                 else jnp.concatenate([mmask1] * group, axis=1))  # (1, L)

        def search(q):
            """q (8, L) query group -> winning target coords (3, L)."""
            def body(tr, carry):
                best_d, best_c = carry
                ttile = target_l_ref[0, :, pl.ds(tr * ref_tile, ref_tile)]
                # ‖target‖² comes in as a ref (Mosaic cannot dynamic-slice
                # kernel VALUES; ref slices like this one it can)
                rsq = tsq_ref[0, 0, pl.ds(tr * ref_tile, ref_tile)]  # (TR,)
                scores = rsq[:, None] - 2.0 * jax.lax.dot_general(
                    ttile, q, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # (TR, L)
                tile_d = jnp.min(scores, axis=0)               # (L,)
                rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
                masked = jnp.where(scores <= tile_d[None, :], rows, ref_tile)
                tile_i = jnp.min(masked, axis=0)
                sel = rows == tile_i[None, :]
                inf = jnp.float32(jnp.inf)
                coords = jnp.stack(
                    [jnp.min(jnp.where(sel, ttile[c][:, None], inf), axis=0)
                     for c in range(3)])                       # (3, L)
                take = tile_d < best_d
                return (jnp.where(take, tile_d, best_d),
                        jnp.where(take[None, :], coords, best_c))

            init = (jnp.full((lanes,), jnp.inf, jnp.float32),
                    jnp.zeros((3, lanes), jnp.float32))
            _, best_c = jax.lax.fori_loop(0, m_pad // ref_tile, body, init)
            return best_c

        for g0 in range(0, 8, group):
            @pl.when(blk * 8 + g0 < num_n)
            def _grp(g0=g0):
                # query group: hypothesis g0+h occupies lanes [h·M_pad, …)
                qrows = []
                for c in range(3):
                    parts = []
                    for h in range(group):
                        r = rt_ref[0, g0 + h:g0 + h + 1, :]    # (1, 16)
                        parts.append(
                            r[:, 3 * c + 0:3 * c + 1] * mrow[0]
                            + r[:, 3 * c + 1:3 * c + 2] * mrow[1]
                            + r[:, 3 * c + 2:3 * c + 3] * mrow[2]
                            + r[:, 9 + c:10 + c])              # (1, M_pad)
                    qrows.append(parts[0] if group == 1
                                 else jnp.concatenate(parts, axis=1))
                q = jnp.concatenate(
                    qrows + [jnp.zeros((5, lanes), jnp.float32)], axis=0)

                best_c = search(q)
                d2 = jnp.zeros((1, lanes), jnp.float32)
                diffs = []
                for c in range(3):
                    dc = q[c:c + 1] - best_c[c:c + 1]
                    diffs.append(dc)
                    d2 = d2 + dc * dc
                d2f = jnp.maximum(d2, EPS)
                d = jnp.sqrt(d2f) * mmask
                inv_d = jnp.where(d2 > EPS, jax.lax.rsqrt(d2f), 0.0) \
                    * mmask * inv_m

                rows_out = []
                for h in range(group):
                    sl = slice(h * m_pad, (h + 1) * m_pad)
                    dis_h = jnp.sum(d[0, sl]) * inv_m          # scalar
                    a_rows, s_vals = [], []
                    for c in range(3):
                        u_c = (diffs[c] * inv_d)[:, sl]        # (1, M_pad)
                        g_c = jax.lax.dot_general(
                            u_c, model_s_ref[0],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (1, 8)
                        a_rows.append(g_c[:, 0:3])
                        s_vals.append(g_c[:, 3:4])
                    rows_out.append(jnp.concatenate(
                        [dis_h.reshape(1, 1)] + a_rows + s_vals
                        + [jnp.zeros((1, 3), jnp.float32)], axis=1))
                out_ref[0, pl.ds(g0, group), :] = jnp.concatenate(
                    rows_out, axis=0)                          # (group, 16)

    @pl.when(act_ref[b] == 0)
    def _skip():
        out_ref[0] = jnp.zeros_like(out_ref[0])


@functools.partial(jax.jit, static_argnames=("num_m", "num_n"))
def _min_call(act, rt_t, model_l, target_l, tsq, model_s, num_m, num_n):
    bsz, n_pad, _ = rt_t.shape
    m_pad = model_l.shape[2]
    group = 8
    while group > 1 and group * m_pad > 4096:   # bound scores VMEM (~8 MB)
        group //= 2
    ref_tile = min(512, m_pad)
    grid = (bsz, n_pad // 8)
    return pl.pallas_call(
        functools.partial(_min_kernel, group=group, ref_tile=ref_tile,
                          num_m=num_m, m_pad=m_pad, num_n=num_n),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 8, 16), lambda b, i, s: (b, i, 0)),
                pl.BlockSpec((1, 8, m_pad), lambda b, i, s: (b, 0, 0)),
                pl.BlockSpec((1, 8, m_pad), lambda b, i, s: (b, 0, 0)),
                pl.BlockSpec((1, 1, m_pad), lambda b, i, s: (b, 0, 0)),
                pl.BlockSpec((1, m_pad, 8), lambda b, i, s: (b, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, 16), lambda b, i, s: (b, i, 0)),
        ),
        out_shape=_vma_struct((bsz, n_pad, 16), jnp.float32,
                              rt_t, model_l, target_l),
        cost_estimate=pl.CostEstimate(
            flops=bsz * n_pad * m_pad * (m_pad * 16 + 40),
            bytes_accessed=bsz * (n_pad * 32 + m_pad * 32) * 4,
            transcendentals=bsz * n_pad * m_pad,
        ),
    )(act, rt_t, model_l, target_l, tsq, model_s)


# ---------------------------------------------------------------------------
# Fused op with custom VJP
# ---------------------------------------------------------------------------


def _fused_impl(R, t, model, target, sym, use_adds):
    bsz, n = R.shape[:2]
    m = model.shape[1]
    rt_rows = jnp.concatenate([
        R.astype(jnp.float32).reshape(bsz, n, 9),
        t.astype(jnp.float32),
        jnp.zeros((bsz, n, 4), jnp.float32)], axis=2)          # (B, N, 16)

    m_pad8 = _ceil_to(m, 8)
    m_tile = min(512, m_pad8)
    m_pad = _ceil_to(m, m_tile)
    model32 = model.astype(jnp.float32)
    model_s = _pad_axis(jnp.concatenate([
        model32, jnp.ones((bsz, m, 1), jnp.float32),
        jnp.zeros((bsz, m, 4), jnp.float32)], axis=2), m_pad, 1)
    target_s = _pad_axis(jnp.concatenate([
        target.astype(jnp.float32),
        jnp.zeros((bsz, m, 5), jnp.float32)], axis=2), m_pad, 1)

    n_tile = min(512, _ceil_to(n, 128))
    n_pad = _ceil_to(n, n_tile)
    rt = _pad_axis(jnp.swapaxes(rt_rows, 1, 2), n_pad, 2)      # (B, 16, N_pad)

    sym_i = sym.astype(jnp.int32)
    act_a = (1 - sym_i) if use_adds else jnp.ones((bsz,), jnp.int32)
    out_a = _paired_call(act_a, rt, model_s, target_s, num_m=m)
    out = jnp.swapaxes(out_a, 1, 2)[:, :n, :]                  # (B, N, 16)

    if use_adds:
        n_padb = _ceil_to(n, 8)
        rt_t = _pad_axis(rt_rows, n_padb, 1)                   # (B, N_padB, 16)
        model_l = _pad_axis(jnp.swapaxes(model32, 1, 2), m_pad, 2)
        model_l = _pad_axis(model_l, 8, 1)                     # (B, 8, M_pad)
        target_l = _pad_axis(
            jnp.swapaxes(target.astype(jnp.float32), 1, 2), m_pad, 2)
        target_l = _pad_axis(target_l, 8, 1)
        tsq = jnp.sum(target_l * target_l, axis=1)             # (B, M_pad)
        tsq = jnp.where(jnp.arange(m_pad)[None, :] < m, tsq,
                        jnp.inf)[:, None, :]                   # (B, 1, M_pad)
        out_b = _min_call(sym_i, rt_t, model_l, target_l, tsq, model_s,
                          num_m=m, num_n=n)
        out = jnp.where(sym[:, None, None], out_b[:, :n, :], out)

    return out[..., 0], out[..., 1:13]                         # dis, coef


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_mean_dist(R, t, model, target, sym, use_adds):
    dis, _ = _fused_impl(R, t, model, target, sym, use_adds)
    return dis


def _fused_fwd(R, t, model, target, sym, use_adds):
    dis, coef = _fused_impl(R, t, model, target, sym, use_adds)
    return dis, (coef, jnp.zeros_like(model), jnp.zeros_like(target))


def _fused_bwd(use_adds, res, g):
    coef, model_z, target_z = res
    gc = g[..., None] * coef                                    # (B, N, 12)
    b, n = gc.shape[:2]
    dR = gc[..., :9].reshape(b, n, 3, 3)
    dt = gc[..., 9:12]
    return dR, dt, model_z, target_z, None


_fused_mean_dist.defvjp(_fused_fwd, _fused_bwd)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def hypothesis_mean_dist(R: jax.Array, t: jax.Array, model: jax.Array,
                         target: jax.Array, sym: jax.Array, *,
                         use_adds: bool = True,
                         backend: str = "auto") -> jax.Array:
    """Mean ADD(-S) distance of every hypothesis, differentiable in (R, t).

    Args:
      R: (B, N, 3, 3) rotation matrices per hypothesis.
      t: (B, N, 3) ABSOLUTE translations per hypothesis.
      model: (B, M, 3) canonical model points.
      target: (B, M, 3) ground-truth-posed model points.
      sym: (B,) bool — rows where the ADD-S min-remap applies.
      use_adds: statically disable the symmetric branch (empty sym_list
        datasets / the refine-phase main loss, ``lib/loss.py:40``).
      backend: "auto" (Pallas on TPU, XLA elsewhere) / "pallas" / "xla".

    Returns: (B, N) mean point distances. ``model``/``target``/``sym`` are
    data (zero cotangent), matching the losses' use."""
    use_pallas = backend == "pallas" or (backend == "auto" and _on_tpu())
    if use_pallas:
        # f32 casts live OUTSIDE the custom-VJP op so autodiff handles the
        # cotangent dtype round-trip for lower-precision inputs
        return _fused_mean_dist(
            R.astype(jnp.float32), t.astype(jnp.float32),
            model.astype(jnp.float32), target.astype(jnp.float32),
            sym, use_adds)
    return hypothesis_mean_dist_xla(R, t, model, target, sym, use_adds)
