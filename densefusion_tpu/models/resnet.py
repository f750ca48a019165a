"""Dilated, BN-free ResNet trunks (output stride 8) for the PSP encoder.

Re-design of ``lib/extractors.py:14-145``: conv7x7 s2 -> maxpool s2 ->
4 stages; stages 3/4 trade stride for dilation (2/4) so the spatial stride
stays 8 — dense per-pixel embeddings need resolution. Faithful quirk kept: the
reference's blocks contain NO BatchNorm (``BasicBlock`` is conv-relu-conv,
``lib/extractors.py:18-43``), so neither do ours. NHWC layout, MXU-aligned
channel counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from densefusion_tpu.models.layers import he_normal_fan_out


def _conv(features: int, kernel: int, stride: int = 1, dilation: int = 1,
          name: str | None = None, dtype=None):
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        kernel_dilation=(dilation, dilation),
        padding=[(dilation * (kernel // 2),) * 2] * 2 if kernel > 1 else "VALID",
        use_bias=False, kernel_init=he_normal_fan_out, name=name, dtype=dtype,
    )


class BasicBlock(nn.Module):
    """conv3x3 -> relu -> conv3x3 (+ 1x1 projection shortcut) -> relu.
    BN-free per the reference (``lib/extractors.py:18-43``)."""

    features: int
    stride: int = 1
    dilation: int = 1
    dtype: type | None = None

    @nn.compact
    def __call__(self, x):
        residual = x
        y = _conv(self.features, 3, self.stride, self.dilation, "conv1",
                  self.dtype)(x)
        y = nn.relu(y)
        y = _conv(self.features, 3, 1, self.dilation, "conv2", self.dtype)(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = _conv(self.features, 1, self.stride, name="proj",
                             dtype=self.dtype)(x)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1(x4) bottleneck, BN-free (``lib/extractors.py:46-75``)."""

    features: int
    stride: int = 1
    dilation: int = 1
    expansion: int = 4
    dtype: type | None = None

    @nn.compact
    def __call__(self, x):
        out_ch = self.features * self.expansion
        residual = x
        y = _conv(self.features, 1, name="conv1", dtype=self.dtype)(x)
        y = nn.relu(y)
        y = _conv(self.features, 3, self.stride, self.dilation, "conv2",
                  self.dtype)(y)
        y = nn.relu(y)
        y = _conv(out_ch, 1, name="conv3", dtype=self.dtype)(y)
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = _conv(out_ch, 1, self.stride, name="proj",
                             dtype=self.dtype)(x)
        return nn.relu(y + residual)


# (block, depths) per variant — the psp_models table (lib/network.py:19-25).
RESNET_SPECS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (Bottleneck, (3, 4, 6, 3)),
    "resnet101": (Bottleneck, (3, 4, 23, 3)),
    "resnet152": (Bottleneck, (3, 8, 36, 3)),
}


class _StemParams(nn.Module):
    """Bare 7x7x3x64 stem kernel — tree-identical to ``nn.Conv(use_bias=
    False)`` so both stem formulations share one checkpoint layout."""

    @nn.compact
    def __call__(self):
        return self.param("kernel", he_normal_fan_out, (7, 7, 3, 64))


def _stem_space_to_depth(x, kernel):
    """conv7x7/s2(pad 3) computed as conv4x4/s1 over a 2x2 space-to-depth
    blocking of the input — identical map (phase decomposition of the
    strided kernel), but the implicit matmul's contraction dim grows from
    7.7.3 on a 3-channel image to 4.4.12, which the MXU tiles far better
    (the 3->8 sublane padding waste of the naive stem; docs/PERF.md)."""
    b, h, w, c = x.shape
    xb = x.reshape(b, h // 2, 2, w // 2, 2, c)
    xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    # pad taps u-3 = 2m + p, m in [-2, 1]: pad kernel to 8 and fold parity
    k8 = jnp.pad(kernel, [(1, 0), (1, 0), (0, 0), (0, 0)])
    k4 = k8.reshape(4, 2, 4, 2, c, kernel.shape[-1])
    k4 = k4.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, kernel.shape[-1])
    return jax.lax.conv_general_dilated(
        xb, k4, window_strides=(1, 1), padding=[(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class DilatedResNet(nn.Module):
    """Trunk returning (stage4, stage3) features at output stride 8
    (``lib/extractors.py:114-124``)."""

    variant: str = "resnet18"
    dtype: type | None = None
    s2d_stem: bool = False   # space-to-depth stem (identical math)

    @nn.compact
    def __call__(self, x):
        block_cls, depths = RESNET_SPECS[self.variant]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        stem_kernel = _StemParams(name="stem")()
        if self.dtype is not None:
            stem_kernel = stem_kernel.astype(self.dtype)
        if self.s2d_stem:
            x = _stem_space_to_depth(x, stem_kernel)
        else:
            x = jax.lax.conv_general_dilated(
                x, stem_kernel, window_strides=(2, 2),
                padding=[(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        stage_args = [  # (features, stride, dilation)
            (64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)
        ]
        feats3 = None
        for s, (features, stride, dilation) in enumerate(stage_args):
            for b in range(depths[s]):
                x = block_cls(
                    features=features,
                    dtype=self.dtype,
                    stride=stride if b == 0 else 1,
                    # reference quirk: the FIRST block of each stage uses
                    # dilation 1 (only `stride` is passed at
                    # lib/extractors.py:107), later blocks dilate.
                    dilation=1 if b == 0 else dilation,
                    name=f"stage{s + 1}_block{b}",
                )(x)
            if s == 2:
                feats3 = x
        return x, feats3
