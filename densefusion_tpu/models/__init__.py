"""Model zoo (flax.linen, NHWC layout, MXU-friendly shapes).

TPU-native re-designs of the reference networks:

* :class:`PSPNet` — dilated BN-free ResNet trunk + pyramid pooling + decoder
  producing the 32-d per-pixel color embedding (``lib/pspnet.py``,
  ``lib/extractors.py``).
* :class:`PoseNet` — dense per-pixel fusion of color embeddings with cloud
  features, per-point pose-hypothesis heads with confidence
  (``lib/network.py:39-132``) — fully batched (the reference is batch-1 with a
  hardcoded ``b = 0``, ``lib/network.py:123``).
* :class:`PoseRefineNet` — residual pose head over the canonicalized cloud
  (``lib/network.py:136-206``).
* :class:`SegNet` — VGG16-shape encoder-decoder with argmax unpooling
  (``vanilla_segmentation/segnet.py``).
"""

from densefusion_tpu.models.resnet import DilatedResNet, RESNET_SPECS
from densefusion_tpu.models.pspnet import PSPNet, PSPModule, PSPUpsample
from densefusion_tpu.models.posenet import PoseNet, DenseFusionFeat
from densefusion_tpu.models.refiner import PoseRefineNet, RefineFeat
from densefusion_tpu.models.segnet import SegNet

__all__ = [
    "DilatedResNet", "RESNET_SPECS", "PSPNet", "PSPModule", "PSPUpsample",
    "PoseNet", "DenseFusionFeat", "PoseRefineNet", "RefineFeat", "SegNet",
]
