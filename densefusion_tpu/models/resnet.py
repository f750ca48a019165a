"""Dilated, BN-free ResNet trunks (output stride 8) for the PSP encoder.

Re-design of ``lib/extractors.py:14-145``: conv7x7 s2 -> maxpool s2 ->
4 stages; stages 3/4 trade stride for dilation (2/4) so the spatial stride
stays 8 — dense per-pixel embeddings need resolution. Faithful quirk kept: the
reference's blocks contain NO BatchNorm (``BasicBlock`` is conv-relu-conv,
``lib/extractors.py:18-43``), so neither do ours. NHWC layout, MXU-aligned
channel counts.
"""

from __future__ import annotations

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


class DilatedResNet(nn.Module):
    """Trunk returning (stage4, stage3) features at output stride 8
    (``lib/extractors.py:114-124``)."""

    variant: str = "resnet18"
    dtype: type | None = None

    @nn.compact
    def __call__(self, x):
        block_cls, depths = RESNET_SPECS[self.variant]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = _conv(64, 7, 2, name="stem", dtype=self.dtype)(x)
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
