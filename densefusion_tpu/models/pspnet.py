"""PSPNet per-pixel embedding network (pyramid scene parsing encoder-decoder).

Re-design of ``lib/pspnet.py``: dilated ResNet trunk -> pyramid pooling over
window sizes (1,2,3,6) -> 1x1 bottleneck to 1024 -> dropout -> three 2x
bilinear-upsample+conv stages (1024->256->64->64) back to input resolution ->
1x1 conv to a 32-channel per-pixel embedding with log-softmax over channels
(``lib/pspnet.py:53-56`` — the log-softmax is a faithful quirk: the 32-d
embedding the fusion network consumes IS log-probability-like).

NHWC; channel counts are MXU-lane friendly (64/256/512/1024).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from densefusion_tpu.models.layers import (
    PReLU, adaptive_avg_pool2d, resize_bilinear, he_normal_fan_out, Dropout2d,
    phase_upsample_conv3x3,
)
from densefusion_tpu.models.resnet import DilatedResNet


class PSPModule(nn.Module):
    """Pyramid pooling: adaptive-pool to each size, 1x1 conv, upsample back,
    concat with the input, 1x1 bottleneck -> relu (``lib/pspnet.py:7-24``)."""

    out_features: int = 1024
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: type | None = None

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        feats = x.shape[-1]
        priors = []
        for size in self.sizes:
            p = adaptive_avg_pool2d(x, (size, size))
            p = nn.Conv(feats, (1, 1), use_bias=False,
                        kernel_init=he_normal_fan_out, dtype=self.dtype,
                        name=f"prior_{size}")(p)
            priors.append(resize_bilinear(p, (h, w)))
        priors.append(x)
        y = nn.Conv(self.out_features, (1, 1), kernel_init=he_normal_fan_out,
                    dtype=self.dtype,
                    name="bottleneck")(jnp.concatenate(priors, axis=-1))
        return nn.relu(y)


class _Conv3x3Params(nn.Module):
    """Bare 3x3 conv parameters (same tree shape as ``nn.Conv`` — kernel +
    bias under one name) so the fused and dense upsample paths share one
    parameter set."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", he_normal_fan_out,
                            (3, 3, in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class PSPUpsample(nn.Module):
    """2x bilinear upsample -> conv3x3 -> PReLU (``lib/pspnet.py:27-37``).

    ``fused=True`` computes the identical map as one half-res phase
    convolution (:func:`phase_upsample_conv3x3`) — the 4x-larger upsampled
    intermediate never touches HBM. Both paths read the same parameters.

    ``align_corners=True`` reproduces the reference decoder's explicit
    ``nn.Upsample(scale_factor=2, align_corners=True)`` exactly. The
    align-corners 2x resize is NOT a periodic 2-phase filter (its tap
    weights vary per output pixel), so this mode forces the dense
    resize-then-conv path with torch-style zero conv padding.
    """

    features: int
    dtype: type | None = None
    fused: bool = True
    border: str = "replicate"   # decoder conv padding; see PSPNet
    align_corners: bool = False

    @nn.compact
    def __call__(self, x):
        kernel, bias = _Conv3x3Params(self.features, name="conv")(x.shape[-1])
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        if self.fused and not self.align_corners:
            x = phase_upsample_conv3x3(x, kernel, bias, border=self.border)
        else:
            h, w = x.shape[-3], x.shape[-2]
            x = resize_bilinear(x, (2 * h, 2 * w),
                                align_corners=self.align_corners)
            pad_mode = "constant" if self.align_corners else \
                ("edge" if self.border == "replicate" else "constant")
            x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode=pad_mode)
            x = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        return PReLU(name="prelu")(x)


def sparse_upsample_taps(x: jax.Array, rows: jax.Array, cols: jax.Array,
                         border: str = "zero") -> jax.Array:
    """The 3x3 conv-tap neighborhoods of ``upsample2x(x)`` at selected
    FULL-RES pixels, without materializing the upsampled map.

    x: (B, h, w, C) half-res features; rows/cols: (B, N) full-res (2h x 2w)
    pixel coordinates -> (B, N, 3, 3, C) upsampled tap patches, exactly
    matching ``resize_bilinear(x, 2x)`` then 3x3 zero-padded windowing: the
    half-pixel 2x upsample of full-res row y = 2k is 0.25*x[k-1] + 0.75*x[k]
    (edge-clamped) and of y = 2k+1 is 0.75*x[k] + 0.25*x[k+1], so the tap
    rows {y-1, y, y+1} only touch half-res rows {k-1, k, k+1} — one gathered
    3x3 half-res patch serves all 9 taps; out-of-image taps are zeroed (conv
    padding). This is the sparse-decode optimization: DenseFusion reads only
    N of the 4hw decoded pixels (docs/PERF.md).
    """
    b, h, w, cin = x.shape
    n = rows.shape[1]
    k, kc = rows // 2, cols // 2
    dr = jnp.arange(-1, 2)
    pr = jnp.clip(k[:, :, None] + dr[None, None, :], 0, h - 1)   # (B, N, 3)
    pc = jnp.clip(kc[:, :, None] + dr[None, None, :], 0, w - 1)
    flat = x.reshape(b, h * w, cin)
    idx = (pr[:, :, :, None] * w + pc[:, :, None, :]).reshape(b, n * 9)
    patch = jnp.take_along_axis(flat, idx[..., None], axis=1)
    patch = patch.reshape(b, n, 3, 3, cin)              # half-res 3x3

    # 1-D upsample weights of the 3 half-res rows (k-1, k, k+1) for each tap
    # row (y-1, y, y+1), by parity of the full-res coordinate y:
    # even y=2k: taps 2k-1 (odd, rows k-1,k), 2k (rows k-1,k), 2k+1 (k,k+1)
    w_even = jnp.array([[0.75, 0.25, 0.0],
                        [0.25, 0.75, 0.0],
                        [0.0, 0.75, 0.25]], x.dtype)
    # odd y=2k+1: taps 2k, 2k+1, 2k+2 -> rows (k-1,k), (k,k+1), (k,k+1)
    w_odd = jnp.array([[0.25, 0.75, 0.0],
                       [0.0, 0.75, 0.25],
                       [0.0, 0.25, 0.75]], x.dtype)
    wr = jnp.where((rows % 2 == 1)[:, :, None, None], w_odd, w_even)
    wc = jnp.where((cols % 2 == 1)[:, :, None, None], w_odd, w_even)
    if border == "zero":
        # zero taps outside the full-res image (torch-style conv padding)
        tap = jnp.arange(-1, 2)
        row_ok = ((rows[:, :, None] + tap) >= 0) & \
            ((rows[:, :, None] + tap) < 2 * h)
        col_ok = ((cols[:, :, None] + tap) >= 0) & \
            ((cols[:, :, None] + tap) < 2 * w)
        wr = wr * row_ok[..., None].astype(x.dtype)
        wc = wc * col_ok[..., None].astype(x.dtype)
    # border == "replicate": nothing to do — the half-res patch gather is
    # already edge-clamped, so out-of-image taps evaluate to the clamped
    # upsampled values, i.e. a replicate-padded conv (matching the fused
    # phase-conv decoder's native border semantics)
    # U[t_r, t_c] = sum_{i,j} wr[t_r, i] * wc[t_c, j] * P[i, j]
    return jnp.einsum("bnti,bnuj,bnijc->bntuc", wr, wc, patch)


def _align_axis_taps(coord: jax.Array, size: int):
    """Per-point 1-D tap weights of ``conv3x3(zero_pad(upsample2x_align))``
    along one axis. ``coord`` (B, N) full-res center coordinates in
    [0, 2*size) -> (anchor (B, N) first half-res source row, weights
    (B, N, 3 taps, 3 rows)).

    Align-corners source coordinate of full-res tap t is
    ``src_t = t*(size-1)/(2*size-1)``; the three taps {y-1, y, y+1} span
    < 1 in source space, so the half-res rows {a, a+1, a+2} with
    ``a = floor(src_y + 0.5) - 1`` cover every tap's (i0, i0+1) pair —
    proof: floor(u-1) = floor(u)-1 makes floor(src_y−s) ≥ a for the tap
    half-span s < 0.5, and floor(src_y+s) ≤ a+1. Out-of-image taps
    (zero conv padding) get weight 0.
    """
    t = coord[..., None] + jnp.arange(-1, 2)                  # (B, N, 3)
    scale = (size - 1) / (2 * size - 1)
    src = t.astype(jnp.float32) * scale
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, size - 2)
    frac = src - i0.astype(jnp.float32)
    a = jnp.clip(jnp.floor(src[..., 1] + 0.5).astype(jnp.int32) - 1,
                 0, size - 3)                                  # (B, N)
    rows_abs = a[..., None] + jnp.arange(3)                    # (B, N, 3)
    eq0 = rows_abs[..., None, :] == i0[..., :, None]           # (B,N,tap,row)
    eq1 = rows_abs[..., None, :] == (i0 + 1)[..., :, None]
    wt = (eq0 * (1.0 - frac)[..., :, None] + eq1 * frac[..., :, None])
    ok = (t >= 0) & (t < 2 * size)                             # zero border
    return a, wt * ok[..., :, None]


def sparse_upsample_taps_align(x: jax.Array, rows: jax.Array,
                               cols: jax.Array) -> jax.Array:
    """:func:`sparse_upsample_taps` for the ``align_corners=True`` upsample
    (the reference decoder's convention, ``lib/pspnet.py:31``) with
    torch-style zero conv padding. x (B, h, w, C) half-res; rows/cols (B, N)
    full-res (2h x 2w) coordinates -> (B, N, 3, 3, C) tap patches, exactly
    matching ``resize_bilinear(x, 2x, align_corners=True)`` then 3x3
    zero-padded windowing. Unlike the half-pixel case the tap weights are
    not fixed parity tables — they vary per output pixel — so they are
    computed per point (cheap VPU work against the patch gather)."""
    b, h, w, cin = x.shape
    n = rows.shape[1]
    ar, wr = _align_axis_taps(rows, h)
    ac, wc = _align_axis_taps(cols, w)
    dr = jnp.arange(3)
    pr = ar[:, :, None] + dr                                   # (B, N, 3)
    pc = ac[:, :, None] + dr
    flat = x.reshape(b, h * w, cin)
    idx = (pr[:, :, :, None] * w + pc[:, :, None, :]).reshape(b, n * 9)
    patch = jnp.take_along_axis(flat, idx[..., None], axis=1)
    patch = patch.reshape(b, n, 3, 3, cin)
    wr = wr.astype(x.dtype)
    wc = wc.astype(x.dtype)
    return jnp.einsum("bnti,bnuj,bnijc->bntuc", wr, wc, patch)


class PSPNet(nn.Module):
    """Per-pixel embedding CNN: (B, H, W, 3) -> (B, H, W, emb_dim), or — with
    ``sample_at`` — only the ``emb_dim`` vectors at N selected pixels.

    H and W must be multiples of 8 (trunk output stride). ``emb_dim=32`` per
    the contract the fusion network consumes (``lib/pspnet.py:54``,
    SURVEY.md §2.4). The ``sample_at`` path evaluates the last decoder stage
    (up3 conv + PReLU + final 1x1 + log-softmax) sparsely at the requested
    pixels — identical math, O(N) instead of O(H·W) for the most expensive
    full-resolution stage.
    """

    variant: str = "resnet18"
    emb_dim: int = 32
    psp_out: int = 1024
    sizes: Sequence[int] = (1, 2, 3, 6)
    drop1: float = 0.3
    drop2: float = 0.15
    log_softmax_emb: bool = True
    dtype: type | None = None
    fused_decoder: bool = True   # phase-conv upsample stages (docs/PERF.md)
    # Reference-exact decoder resizes (nn.Upsample align_corners=True,
    # lib/pspnet.py:31) for imported torch weights. Overrides fused_decoder
    # (the align-corners filter is not 2-phase periodic) and uses torch-style
    # zero conv padding. The PSP priors stay half-pixel in every mode:
    # F.upsample's bilinear default is align_corners=False since torch 0.4.0
    # and the reference pins torch 0.4.1 (lib/pspnet.py:22, Dockerfile:26).
    align_corners: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, sample_at=None):
        h_full, w_full = x.shape[-3], x.shape[-2]
        f, _class_f = DilatedResNet(variant=self.variant, dtype=self.dtype,
                                    name="trunk")(x)
        p = PSPModule(out_features=self.psp_out, sizes=self.sizes,
                      dtype=self.dtype, name="psp")(f)
        p = Dropout2d(self.drop1, name="drop1")(p, deterministic=not train)

        # fused_decoder semantics: decoder convs pad with REPLICATE borders —
        # the phase conv's native formulation (zero extra cost; see
        # phase_upsample_conv3x3) — consistently across the dense, fused and
        # sparse paths. fused_decoder=False keeps torch-style zero padding
        # (the reference's exact border behavior, for imported weights).
        # All three upsample stages use the phase conv: up1's 4x-smaller
        # input read wins 7.9 -> 5.3 ms/batch-64 (docs/PERF.md round 2;
        # an earlier round measured the opposite inside the old graph).
        fused = self.fused_decoder and not self.align_corners
        border = "replicate" if fused else "zero"
        p = PSPUpsample(256, dtype=self.dtype, fused=fused, border=border,
                        align_corners=self.align_corners, name="up1")(p)
        p = Dropout2d(self.drop2, name="drop2a")(p, deterministic=not train)
        p = PSPUpsample(64, dtype=self.dtype, fused=fused, border=border,
                        align_corners=self.align_corners, name="up2")(p)
        p = Dropout2d(self.drop2, name="drop2b")(p, deterministic=not train)

        # Final stage modules — ONE parameter set serving the dense, fused,
        # and sparse paths (VALID conv + explicit padding/patches).
        up3_kernel, up3_bias = _Conv3x3Params(64, name="up3_conv")(
            p.shape[-1])
        if self.dtype is not None:
            up3_kernel = up3_kernel.astype(self.dtype)
            up3_bias = up3_bias.astype(self.dtype)
        up3_prelu = PReLU(name="up3_prelu")
        # zero-init final projection: the embedding starts at the uniform
        # log-softmax (-log emb_dim) instead of inheriting the trunk's
        # activation spread — with the BN-free trunk + he init, a non-tiny
        # init here produces O(100)-magnitude log-probs that destabilize the
        # fusion net (torch's default small conv init gave the reference the
        # same near-uniform start implicitly).
        final = nn.Conv(self.emb_dim, (1, 1),
                        kernel_init=nn.initializers.zeros,
                        dtype=self.dtype, name="final")

        if sample_at is None:
            if fused:
                p = phase_upsample_conv3x3(p, up3_kernel, up3_bias,
                                           border=border)
            else:
                h2, w2 = p.shape[-3], p.shape[-2]
                p = resize_bilinear(p, (2 * h2, 2 * w2),
                                    align_corners=self.align_corners)
                p = jnp.pad(p, [(0, 0), (1, 1), (1, 1), (0, 0)])
                p = jax.lax.conv_general_dilated(
                    p, up3_kernel, window_strides=(1, 1), padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")) + up3_bias
            p = up3_prelu(p)
            p = final(p)
        else:
            rows = sample_at // w_full
            cols = sample_at % w_full
            if border == "replicate":
                # Phase-dense decode, phase-major row gather: the half-res
                # phase conv is cheap dense MXU work (~1.8 ms/batch-64), so
                # run it on all pixels WITHOUT depth-to-space, gather each
                # point's (4*C) phase-major row as-is (no tile relayout —
                # splitting the phase axis into rows re-tiles the whole
                # map on TPU), then PReLU + one-hot phase select + final
                # 1x1 on the N sparse rows only. Per-point 3x3 patch
                # gathers measured 8.8 ms at this batch; this path ~3 ms
                # (docs/PERF.md round 2).
                from densefusion_tpu.models.layers import phase_conv_phases
                b_, hh, ww = p.shape[0], p.shape[1], p.shape[2]
                cc = up3_kernel.shape[-1]
                n_ = rows.shape[1]
                y4 = phase_conv_phases(p, up3_kernel,
                                       up3_bias)       # (B, h, w, 4*C)
                base = ((rows // 2) * ww + cols // 2).astype(jnp.int32)
                g = jnp.take_along_axis(
                    y4.reshape(b_, hh * ww, 4 * cc),
                    base[..., None], axis=1)             # (B, N, 4*C)
                g = up3_prelu(g)
                ph = jax.nn.one_hot((rows % 2) * 2 + (cols % 2), 4,
                                    dtype=g.dtype)       # (B, N, 4)
                g = jnp.einsum("bnpc,bnp->bnc",
                               g.reshape(b_, n_, 4, cc), ph)
                p = final(g[:, :, None, :])[:, :, 0, :]  # (B, N, emb)
            else:
                # zero border needs per-point boundary masking of the tap
                # weights — keep the patch/tap formulation for that case
                # (align-corners weights vary per pixel; half-pixel ones are
                # fixed parity tables)
                if self.align_corners:
                    taps = sparse_upsample_taps_align(p, rows, cols)
                else:
                    taps = sparse_upsample_taps(p, rows, cols,
                                                border=border)
                # taps: (B, N, 3, 3, C)
                y = jnp.einsum("bnijc,ijcd->bnd",
                               taps.astype(up3_kernel.dtype), up3_kernel) \
                    + up3_bias
                y = up3_prelu(y)
                p = final(y[:, :, None, :])[:, :, 0, :]   # 1x1 over (B,N,1,C)

        # log-softmax in f32 for numerical stability under bf16 compute
        p = p.astype(jnp.float32)
        if self.log_softmax_emb:
            p = jax.nn.log_softmax(p, axis=-1)
        return p
