"""Shared layer primitives: PReLU, adaptive average pooling, bilinear
up/down-sampling, and argmax max-pool / unpool pairs.

These replace torch layer semantics the reference relies on
(``nn.PReLU``, ``nn.AdaptiveAvgPool2d``, ``F.max_pool2d(return_indices=True)``
/ ``F.max_unpool2d``) with XLA-friendly formulations: static shapes, one-hot
scatter instead of integer scatter for unpooling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

# He-normal fan-out init — the reference's conv init
# (lib/extractors.py:91-94: N(0, sqrt(2 / (k*k*out_ch)))).
he_normal_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class PReLU(nn.Module):
    """Parametric ReLU with a single learned slope (torch nn.PReLU default)."""

    init_slope: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("slope", lambda key: jnp.asarray(self.init_slope,
                                                        jnp.float32))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


def adaptive_avg_pool2d(x: jax.Array, out_size: tuple[int, int]) -> jax.Array:
    """NHWC adaptive average pooling with torch's window convention
    (start = floor(i*H/S), end = ceil((i+1)*H/S)).

    Divisible sizes (the common case: PSP sizes 1/2/3/6 on stride-8 maps of
    /8-divisible crops) take a single reshape-mean — one fused reduction
    instead of S² slice-reductions; non-divisible sizes fall back to the
    unrolled exact windows.
    """
    h, w = x.shape[-3], x.shape[-2]
    oh, ow = out_size
    if h % oh == 0 and w % ow == 0:
        kh, kw = h // oh, w // ow
        lead = x.shape[:-3]
        xr = x.reshape(lead + (oh, kh, ow, kw, x.shape[-1]))
        return xr.mean(axis=(-4, -2))
    rows = []
    for i in range(oh):
        r0, r1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            c0, c1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(jnp.mean(x[..., r0:r1, c0:c1, :], axis=(-3, -2)))
        rows.append(jnp.stack(cols, axis=-2))
    return jnp.stack(rows, axis=-3)


# 1-D tap->source weights of the half-pixel 2x bilinear upsample, per output
# parity: rows = conv taps (y-1, y, y+1) of output pixel y, cols = half-res
# sources (k-1, k, k+1) where k = y // 2. Even y = 2k: up[2k] =
# 0.25 x[k-1] + 0.75 x[k]; odd y = 2k+1: 0.75 x[k] + 0.25 x[k+1].
UPSAMPLE_TAPS_EVEN = ((0.75, 0.25, 0.0), (0.25, 0.75, 0.0), (0.0, 0.75, 0.25))
UPSAMPLE_TAPS_ODD = ((0.25, 0.75, 0.0), (0.0, 0.75, 0.25), (0.0, 0.25, 0.75))


def _edge_upsample_1d(v: jax.Array, axis: int) -> jax.Array:
    """Extended 2x half-pixel upsample along ``axis``: length n -> 2n + 2,
    covering upsampled coordinates -1 .. 2n (one phantom sample each side,
    edge-clamped) — the boundary helper of :func:`phase_upsample_conv3x3`."""
    v = jnp.moveaxis(v, axis, 0)
    vp = jnp.concatenate([v[:1], v, v[-1:]], axis=0)      # clamp pad, n + 2
    even = 0.25 * vp[:-1] + 0.75 * vp[1:]                 # coords 0,2,..,2n
    odd = 0.75 * vp[:-1] + 0.25 * vp[1:]                  # coords -1,1,..,2n-1
    e = jnp.stack([odd, even], axis=1).reshape((-1,) + v.shape[1:])
    return jnp.moveaxis(e, 0, axis)                       # coords -1 .. 2n


def phase_conv_phases(x: jax.Array, kernel: jax.Array,
                      bias: jax.Array,
                      conv_backend: str = "auto") -> jax.Array:
    """The phase-major intermediate of :func:`phase_upsample_conv3x3`
    (replicate border): one half-res VALID conv with the 4 composed phase
    kernels, WITHOUT the depth-to-space interleave. Output (B, h, w,
    4*cout), phase index (py, px) row-major within the channel axis —
    full-res pixel (2i+py, 2j+px) lives at [i, j, (py*2+px)*cout:...].

    The sparse decode path gathers from this layout directly: skipping the
    interleave avoids a full-res materialization, and the per-point gather
    happens after the cheap dense final 1x1 (docs/PERF.md round 2).

    ``conv_backend`` selects the VALID-conv lowering (see
    :func:`densefusion_tpu.ops.phase_conv.conv3x3_valid`): "pallas" is the
    flat-space nine-shifted-matmul kernel, "xla" the native conv, "auto"
    picks per platform from on-chip measurements."""
    from densefusion_tpu.ops.phase_conv import conv3x3_valid

    m_even = jnp.asarray(UPSAMPLE_TAPS_EVEN, kernel.dtype)
    m_odd = jnp.asarray(UPSAMPLE_TAPS_ODD, kernel.dtype)
    m = jnp.stack([m_even, m_odd])                        # (2, tap, src)
    pk = jnp.einsum("pti,quj,tucd->pqijcd", m, m, kernel)
    cin, cout = kernel.shape[-2], kernel.shape[-1]
    pk = pk.transpose(2, 3, 4, 0, 1, 5).reshape(3, 3, cin, 4 * cout)

    # uniform interior formula: replicate padding == the resize's edge clamp
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
    y = conv3x3_valid(xp, pk, backend=conv_backend)      # (B, h, w, 4*cout)
    return y + jnp.tile(bias.astype(y.dtype), 4)


def phase_upsample_conv3x3(x: jax.Array, kernel: jax.Array,
                           bias: jax.Array,
                           border: str = "zero",
                           conv_backend: str = "auto") -> jax.Array:
    """Fused ``conv3x3(pad(resize_bilinear(x, 2x)))`` as ONE half-res conv.

    Exactly equal (incl. borders) to upsampling x (B, h, w, Cin) 2x with the
    half-pixel bilinear convention, padding by 1, and a VALID 3x3 conv —
    but computed as a phase (sub-pixel) convolution: the 4 output parity
    classes each see a 3x3 neighborhood of the HALF-res input, with kernels
    ``K[py,px] = M_py^T W M_px`` composed from the fixed bilinear tap weights.
    Same MXU FLOPs as the full-res conv, 1/4 the conv input HBM traffic, and
    the 4x-larger upsampled intermediate never exists (docs/PERF.md: the
    decoder resizes were the PSPNet bottleneck).

    ``border``: how the conv pads the (virtual) upsampled map. "replicate"
    is the native semantics of the phase formulation — the uniform formula
    over an edge-padded input IS a replicate-padded conv, zero extra cost.
    "zero" reproduces torch-style zero padding exactly by subtracting the
    phantom border-tap contributions (two concat assemblies, measured
    1-5 ms/stage at batch 64 — prefer "replicate" on the hot path).
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    y = phase_conv_phases(x, kernel, bias,
                          conv_backend=conv_backend)      # (B, h, w, 4*cout)
    y = y.reshape(b, h, w, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(b, 2 * h, 2 * w, cout)                  # depth-to-space
    if border == "replicate":
        return y

    # Boundary: the true conv zero-pads the UPSAMPLED map, so taps at
    # upsampled coords -1 / 2h / -1 / 2w must contribute 0 — but the uniform
    # formula gave them clamped values. Subtract those phantom contributions
    # from the outermost ring. All heavy-tensor work is two concat
    # assemblies; the inclusion-exclusion corner add-backs are folded into
    # the SMALL per-edge correction vectors (eight .at scatters on the full
    # output tensor measured 1-12 ms/stage — docs/PERF.md round 2).
    def ring(vrow, wrow):                                 # vrow: (B, 2n+2, C)
        win = jnp.stack([vrow[:, :-2], vrow[:, 1:-1], vrow[:, 2:]], axis=2)
        return jnp.einsum("bxjc,jcd->bxd", win, wrow.astype(vrow.dtype))

    top = _edge_upsample_1d(x[:, 0], axis=1)              # U[-1, -1:2w+1]
    bot = _edge_upsample_1d(x[:, -1], axis=1)             # U[2h, ...]
    left = _edge_upsample_1d(x[:, :, 0], axis=1)          # U[-1:2h+1, -1]
    right = _edge_upsample_1d(x[:, :, -1], axis=1)
    corr_top = ring(top, kernel[0])                       # (B, 2w, C)
    corr_bot = ring(bot, kernel[2])
    corr_left = ring(left, kernel[:, 0])                  # (B, 2h, C)
    corr_right = ring(right, kernel[:, 2])
    kc = kernel.astype(x.dtype)
    # each corner tap appears in one row AND one col correction; remove the
    # duplicate from the column vectors so it is subtracted exactly once
    corr_left = corr_left.at[:, 0].add(
        -jnp.einsum("bc,cd->bd", x[:, 0, 0], kc[0, 0]))
    corr_left = corr_left.at[:, -1].add(
        -jnp.einsum("bc,cd->bd", x[:, -1, 0], kc[2, 0]))
    corr_right = corr_right.at[:, 0].add(
        -jnp.einsum("bc,cd->bd", x[:, 0, -1], kc[0, 2]))
    corr_right = corr_right.at[:, -1].add(
        -jnp.einsum("bc,cd->bd", x[:, -1, -1], kc[2, 2]))

    y = jnp.concatenate([y[:, :, :1] - corr_left[:, :, None],
                         y[:, :, 1:-1],
                         y[:, :, -1:] - corr_right[:, :, None]], axis=2)
    y = jnp.concatenate([y[:, :1] - corr_top[:, None],
                         y[:, 1:-1],
                         y[:, -1:] - corr_bot[:, None]], axis=1)
    return y


def _align_corners_matrix(n_in: int, n_out: int) -> jax.Array:
    """(n_out, n_in) 1-D interpolation matrix of torch's
    ``align_corners=True`` bilinear convention: source coordinate
    ``src = i * (n_in-1)/(n_out-1)`` (degenerate sizes map everything to
    source 0, like torch)."""
    if n_in == 1 or n_out == 1:
        return jnp.zeros((n_out, n_in), jnp.float32).at[:, 0].set(1.0)
    src = jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, n_in - 2)
    frac = src - i0.astype(jnp.float32)
    rows = jnp.arange(n_out)
    m = jnp.zeros((n_out, n_in), jnp.float32)
    return m.at[rows, i0].add(1.0 - frac).at[rows, i0 + 1].add(frac)


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int],
                    align_corners: bool = False) -> jax.Array:
    """NHWC bilinear resize. ``align_corners=False`` is the half-pixel
    convention — torch-0.4.1's ``F.upsample(mode='bilinear')`` default, used
    by the reference's PSP priors (``lib/pspnet.py:22``; the 0.4.0 default
    flip to ``align_corners=False`` applies). ``align_corners=True`` matches
    the reference decoder's explicit ``nn.Upsample(..., align_corners=True)``
    (``lib/pspnet.py:31``) — required for imported reference weights to
    reproduce reference activations (VERDICT r2 missing #1)."""
    if align_corners:
        # two 1-D interpolation-matrix contractions: MXU-friendly matmuls
        # instead of the scalar-loop gathers XLA lowers resizes to on TPU
        mh = _align_corners_matrix(x.shape[-3], out_hw[0]).astype(x.dtype)
        mw = _align_corners_matrix(x.shape[-2], out_hw[1]).astype(x.dtype)
        y = jnp.einsum("oi,...iwc->...owc", mh, x)
        return jnp.einsum("pj,...ojc->...opc", mw, y)
    # NOTE: a hand-fused shift+FMA+interleave formulation of the 2x case was
    # measured ~1.7x SLOWER than jax.image.resize's gather lowering on TPU
    # v5e (layout-hostile stack/reshape) — keep the library resize.
    shape = x.shape[:-3] + (out_hw[0], out_hw[1], x.shape[-1])
    return jax.image.resize(x, shape, method="bilinear")


def max_pool_argmax(x: jax.Array, window: int = 2, stride: int = 2):
    """2x2 max pool returning (pooled, argmax_pos) for later unpooling.

    TPU-idiomatic replacement for ``F.max_pool2d(return_indices=True)``
    (``vanilla_segmentation/segnet.py:77-96``): the saved state is a compact
    int8 within-window position (0..window²-1) per output cell — 4 bytes/cell
    cheaper than torch's int64 flat indices and 32x cheaper than a float
    one-hot; unpool re-expands it against an iota (no scatter). Ties resolve
    to the first (row-major) position like torch.
    """
    b, h, w, c = x.shape
    oh, ow = h // window, w // window
    xw = x[:, : oh * window, : ow * window, :]
    xw = xw.reshape(b, oh, window, ow, window, c)
    xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(b, oh, ow, window * window, c)
    pooled = jnp.max(xw, axis=3)
    pos = jnp.argmax(xw, axis=3).astype(jnp.int8)  # first max, like torch
    return pooled, pos


def max_unpool(x: jax.Array, pos: jax.Array, window: int = 2):
    """Inverse of :func:`max_pool_argmax`: place each pooled value at its
    argmax window position, zeros elsewhere (``F.max_unpool2d`` semantics,
    ``vanilla_segmentation/segnet.py:98-117``)."""
    b, oh, ow, c = x.shape
    win_iota = jax.lax.broadcasted_iota(jnp.int8, (1, 1, 1, window * window, 1), 3)
    spread = jnp.where(pos[:, :, :, None, :] == win_iota,
                       x[:, :, :, None, :], jnp.zeros((), x.dtype))
    spread = spread.reshape(b, oh, ow, window, window, c)
    spread = spread.transpose(0, 1, 3, 2, 4, 5)
    return spread.reshape(b, oh * window, ow * window, c)


class Dropout2d(nn.Module):
    """Channel-wise (spatial) dropout: drops whole feature maps, matching
    torch ``nn.Dropout2d`` used in the PSP decoder (``lib/pspnet.py:46,52``)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        return nn.Dropout(rate=self.rate, broadcast_dims=(-3, -2),
                          deterministic=deterministic)(x)
