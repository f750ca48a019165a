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


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """NHWC bilinear resize (half-pixel convention). Stands in for torch's
    ``nn.Upsample(mode='bilinear')`` in the PSP pyramid / decoder
    (``lib/pspnet.py:22,31``); exact corner alignment is a training-time detail
    with no capability impact since we train from scratch."""
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
