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


class PSPUpsample(nn.Module):
    """2x bilinear upsample -> conv3x3 -> PReLU (``lib/pspnet.py:27-37``)."""

    features: int
    dtype: type | None = None

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        x = resize_bilinear(x, (2 * h, 2 * w))
        x = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=he_normal_fan_out, dtype=self.dtype,
                    name="conv")(x)
        return PReLU(name="prelu")(x)


class PSPNet(nn.Module):
    """Per-pixel embedding CNN: (B, H, W, 3) -> (B, H, W, emb_dim).

    H and W must be multiples of 8 (trunk output stride). ``emb_dim=32`` per
    the contract the fusion network consumes (``lib/pspnet.py:54``,
    SURVEY.md §2.4).
    """

    variant: str = "resnet18"
    emb_dim: int = 32
    psp_out: int = 1024
    sizes: Sequence[int] = (1, 2, 3, 6)
    drop1: float = 0.3
    drop2: float = 0.15
    log_softmax_emb: bool = True
    dtype: type | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f, _class_f = DilatedResNet(variant=self.variant, dtype=self.dtype,
                                    name="trunk")(x)
        p = PSPModule(out_features=self.psp_out, sizes=self.sizes,
                      dtype=self.dtype, name="psp")(f)
        p = Dropout2d(self.drop1, name="drop1")(p, deterministic=not train)

        p = PSPUpsample(256, dtype=self.dtype, name="up1")(p)
        p = Dropout2d(self.drop2, name="drop2a")(p, deterministic=not train)
        p = PSPUpsample(64, dtype=self.dtype, name="up2")(p)
        p = Dropout2d(self.drop2, name="drop2b")(p, deterministic=not train)
        p = PSPUpsample(64, dtype=self.dtype, name="up3")(p)

        # zero-init final projection: the embedding starts at the uniform
        # log-softmax (-log emb_dim) instead of inheriting the trunk's
        # activation spread — with the BN-free trunk + he init, a non-tiny
        # init here produces O(100)-magnitude log-probs that destabilize the
        # fusion net (torch's default small conv init gave the reference the
        # same near-uniform start implicitly).
        p = nn.Conv(self.emb_dim, (1, 1), kernel_init=nn.initializers.zeros,
                    dtype=self.dtype, name="final")(p)
        # log-softmax in f32 for numerical stability under bf16 compute
        p = p.astype(jnp.float32)
        if self.log_softmax_emb:
            p = jax.nn.log_softmax(p, axis=-1)
        return p
