"""SegNet semantic segmentation network (VGG16 encoder-decoder).

Re-design of ``vanilla_segmentation/segnet.py:6-121``: 13 conv+BN+relu
encoder layers in five pooling stages, mirrored decoder that unpools with the
encoder's max-pool argmax positions. The torch
``max_pool2d(return_indices=True)`` / ``max_unpool2d`` pair becomes the
one-hot argmax pool/unpool of :mod:`densefusion_tpu.models.layers` — a
multiply/reshape instead of an integer scatter (TPU-friendly; SURVEY.md §7.4).

Default 22 classes (21 YCB objects + background,
``vanilla_segmentation/segnet.py:7``), input 480x640 RGB.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from densefusion_tpu.models.layers import (
    max_pool_argmax, max_unpool, he_normal_fan_out,
)


class _ConvBNRelu(nn.Module):
    features: int
    relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=he_normal_fan_out, name="conv")(x)
        # torch momentum 0.1 == flax momentum 0.9 (flax keeps the decay rate)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn")(x)
        return nn.relu(x) if self.relu else x


class SegNet(nn.Module):
    """(B, H, W, 3) -> (B, H, W, num_classes) logits. H, W divisible by 32."""

    num_classes: int = 22
    enc_stages: Sequence[Sequence[int]] = (
        (64, 64), (128, 128), (256, 256, 256),
        (512, 512, 512), (512, 512, 512),
    )
    dec_stages: Sequence[Sequence[int]] = (
        (512, 512, 512), (512, 512, 256), (256, 256, 128), (128, 64), (64,),
    )

    @nn.compact
    def __call__(self, x, train: bool = False):
        pool_masks = []
        for s, widths in enumerate(self.enc_stages):
            for i, w in enumerate(widths):
                x = _ConvBNRelu(w, name=f"enc{s + 1}_{i + 1}")(x, train)
            x, mask = max_pool_argmax(x)
            pool_masks.append(mask)

        for s, widths in enumerate(self.dec_stages):
            x = max_unpool(x, pool_masks[-(s + 1)])
            for i, w in enumerate(widths):
                x = _ConvBNRelu(w, name=f"dec{s + 1}_{i + 1}")(x, train)

        # final 3x3 conv to class logits, no BN/relu
        # (vanilla_segmentation/segnet.py:71,119)
        return nn.Conv(self.num_classes, (3, 3), padding=[(1, 1), (1, 1)],
                       kernel_init=he_normal_fan_out, name="classifier")(x)
