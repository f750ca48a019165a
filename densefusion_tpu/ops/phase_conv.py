"""Pallas TPU kernel for the decoder's half-res 3x3 VALID convolution.

Every PSPNet upsample stage is one ``conv3x3(edge_pad(x))`` on the half-res
map (the phase formulation of resize2x+conv, ``models/layers.py:
phase_conv_phases``) — the hottest decoder op left after round 2b: XLA's
native conv lowering measured ~66% MXU efficiency at the up1 shape
(24^2 x 1024 -> 1024, 5.3 ms/batch-64) across four probed formulations
(``tpu_up1_variants.py``, probe removed round 4 — numbers archived in docs/PERF.md). This kernel reformulates the conv in
FLAT spatial space so it becomes nine shifted matmuls with ONE f32
accumulator that never leaves VMEM:

    out_flat[p] = sum_{kh,kw} xp_flat[p + kh*(w+2) + kw] @ W[kh,kw]

where ``xp_flat`` is the edge-padded input reshaped to ((h+2)*(w+2), Cin).
Computing all ``h*(w+2)`` flat rows makes every tap a contiguous sublane
slice of one resident VMEM buffer; the two phantom columns per row
(cross-row contamination at j in {w, w+1}) are discarded by the caller's
reshape-slice. Cost: (w+2)/w extra FLOPs (8.3% at w=24) against zero
intermediate HBM traffic between taps.

Backward runs ``jax.vjp`` of the XLA conv (mathematically identical), so
training gradients are bit-identical to the previous path.

MEASURED DECISION (round 3, v5e, batch 64 bf16, same-session —
``examples/tpu_up1_pallas.py``): the kernel LOSES to XLA's native conv
lowering at every decoder phase shape — up1 (24² x1024→1024) 7.22 vs
6.22 ms, up2 (48² x256→256) 2.74 vs 2.03 ms, up3 (96² x64→256) 9.02 vs
3.68 ms (the cin=64→128 lane padding doubles its FLOPs). The roll of the
f32 partial product per tap plus the halo-row waste costs more than XLA's
~66%-efficient native lowering saves. So ``backend="auto"`` resolves to
XLA everywhere; the Pallas path stays available (tested, value/grad-exact)
as an explicit opt-in and as the bench harness's Mosaic-lowering canary
(``bench.py`` kernel-parity smoke).

Relates to the capability of the reference's decoder convs
(``lib/pspnet.py:27-37`` ``PSPUpsample``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from densefusion_tpu.ops.knn import _vma_struct


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# XLA reference (CPU path, backward, exactness tests)
# ---------------------------------------------------------------------------

def conv3x3_valid_xla(xp: jax.Array, pk: jax.Array) -> jax.Array:
    """VALID 3x3 conv. xp (B, h+2, w+2, Cin) pre-padded, pk (3, 3, Cin, Cout)
    -> (B, h, w, Cout)."""
    return jax.lax.conv_general_dilated(
        xp, pk, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _conv_kernel(x_ref, w_ref, o_ref, *, bf: int, wp: int):
    f = pl.program_id(2)
    # Tap offsets are sub-8, but Mosaic only allows sublane slices at
    # provable multiples of 8 and only rotates 32-bit data. So: ONE aligned
    # window read (bf is a multiple of 16), each tap matmuls the WHOLE
    # window (halo rows of waste), and the tap's offset is realized as a
    # static circular roll of the f32 partial product — acc[q] += part[q+off]
    # == acc += roll(part, -off). No wrap reaches rows < bf because the
    # window carries ceil(2*wp+2) extra rows.
    halo = _ceil_to(2 * wp + 2, 16)
    rows = bf + halo
    win = x_ref[0, pl.ds(pl.multiple_of(f * bf, 16), rows), :]
    acc = None
    for kh in range(3):
        for kw in range(3):
            off = kh * wp + kw
            part = jax.lax.dot_general(
                win, w_ref[kh * 3 + kw],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (rows, bCout)
            # roll needs a non-negative shift: rows-off ≡ -off (mod rows)
            if off:
                part = pltpu.roll(part, rows - off, 0)
            acc = part if acc is None else acc + part
    o_ref[0] = acc[:bf].astype(o_ref.dtype)


@jax.jit
def _conv3x3_pallas_impl(xp: jax.Array, pk: jax.Array) -> jax.Array:
    b, hp, wp, cin = xp.shape
    h, w = hp - 2, wp - 2
    cout = pk.shape[-1]
    out_dtype = jnp.result_type(xp.dtype, pk.dtype)

    cin_pad = _ceil_to(cin, 128)
    cout_pad = _ceil_to(cout, 128)
    bcout = min(cout_pad, 256)

    flat = h * wp                      # valid output rows (2 garbage cols/row)
    # accumulator budget ~4 MB f32 picks the flat block size
    bf_cap = max(16, (4 * 1024 * 1024 // (bcout * 4)) // 16 * 16)
    bf = min(_ceil_to(flat, 16), bf_cap)
    f_pad = _ceil_to(flat, bf)
    # the last flat block's aligned window reads bf + halo rows from f_pad-bf
    l_pad = f_pad + _ceil_to(2 * wp + 2, 16)

    x_flat = xp.reshape(b, hp * wp, cin)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, max(0, l_pad - hp * wp)),
                              (0, cin_pad - cin)))[:, :l_pad]
    wt = jnp.pad(pk.reshape(9, cin, cout),
                 ((0, 0), (0, cin_pad - cin), (0, cout_pad - cout)))

    grid = (cout_pad // bcout, b, f_pad // bf)
    out = pl.pallas_call(
        functools.partial(_conv_kernel, bf=bf, wp=wp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, l_pad, cin_pad), lambda j, i, f: (i, 0, 0)),
            pl.BlockSpec((9, cin_pad, bcout), lambda j, i, f: (0, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, bf, bcout), lambda j, i, f: (i, f, j)),
        out_shape=_vma_struct((b, f_pad, cout_pad), out_dtype, xp, pk),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * b * f_pad * cin_pad * cout_pad,
            bytes_accessed=(b * l_pad * cin_pad * xp.dtype.itemsize
                            * (cout_pad // bcout)
                            + 9 * cin_pad * cout_pad * pk.dtype.itemsize
                            + b * f_pad * cout_pad * out_dtype.itemsize),
            transcendentals=0,
        ),
    )(x_flat, wt)
    # flat rows p = i*wp + j: keep j < w, drop lane/cout padding
    return out[:, :flat, :cout].reshape(b, h, wp, cout)[:, :, :w, :]


@jax.custom_vjp
def _conv3x3_pallas(xp, pk):
    return _conv3x3_pallas_impl(xp, pk)


def _conv3x3_fwd(xp, pk):
    return _conv3x3_pallas_impl(xp, pk), (xp, pk)


def _conv3x3_bwd(res, g):
    xp, pk = res
    # identical math -> identical cotangents; XLA's conv transposes are
    # already well-lowered for the backward shapes
    _, vjp = jax.vjp(conv3x3_valid_xla, xp, pk)
    return vjp(g.astype(jnp.result_type(xp.dtype, pk.dtype)))


_conv3x3_pallas.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def conv3x3_valid(xp: jax.Array, pk: jax.Array, *,
                  backend: str = "auto") -> jax.Array:
    """VALID 3x3 convolution of a pre-padded NHWC map.

    Args:
      xp: (B, h+2, w+2, Cin) input, already padded by 1 (edge or zero).
      pk: (3, 3, Cin, Cout) HWIO kernel.
      backend: "auto" / "pallas" / "xla". "auto" resolves to XLA on every
        platform: the Pallas kernel measured SLOWER than XLA's native conv
        at all three decoder shapes on v5e (module docstring table), so it
        is an explicit opt-in only.

    Returns: (B, h, w, Cout); differentiable in both arguments (backward
    uses the XLA conv transposes)."""
    if backend == "pallas":
        return _conv3x3_pallas(xp, pk)
    return conv3x3_valid_xla(xp, pk)
