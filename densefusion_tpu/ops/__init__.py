"""Custom compute kernels (Pallas TPU + pure-XLA references).

The only native kernel the reference carries is the CUDA K-nearest-neighbour
library used by the symmetric-object ADD-S loss and eval metric
(``lib/knn/src/knn_cuda_kernel.cu``). Here it is a tiled Pallas kernel that
fuses the ``‖a‖²+‖b‖²−2a·b`` distance matmul (MXU) with a running argmin, so
the Q×R distance matrix never exists in HBM (SURVEY.md §2.2, §5.7).
"""

from densefusion_tpu.ops.knn import (
    nearest_neighbor,
    knn,
    adds_remap_targets,
    nearest_neighbor_xla,
    nearest_neighbor_pallas,
)
from densefusion_tpu.ops.add_dist import (
    hypothesis_mean_dist,
    hypothesis_mean_dist_xla,
)
from densefusion_tpu.ops.phase_conv import (
    conv3x3_valid,
    conv3x3_valid_xla,
)

__all__ = [
    "nearest_neighbor", "knn", "adds_remap_targets",
    "nearest_neighbor_xla", "nearest_neighbor_pallas",
    "hypothesis_mean_dist", "hypothesis_mean_dist_xla",
    "conv3x3_valid", "conv3x3_valid_xla",
]
