"""Parallelism: device mesh setup, batch shardings, collectives.

The reference's only parallelism is a single-process ``nn.DataParallel``
pinned to one GPU (``lib/network.py:33``; SURVEY.md §2.3). Here parallelism
is a first-class subsystem: a ``(data,)`` (optionally ``(data, point)``)
mesh, batch-dim sharding with XLA-inserted gradient psum over ICI/DCN,
multi-host initialization, and a reference-axis-sharded nearest-neighbour
reduction for large model clouds (SURVEY.md §5.7-5.8).
"""

from densefusion_tpu.parallel.mesh import (
    make_mesh, initialize_distributed, local_batch_slice,
)
from densefusion_tpu.parallel.sharding import (
    batch_sharding, replicate, make_shard_batch_fn,
)
from densefusion_tpu.parallel.collectives import (
    ring_nearest_neighbor, sharded_nearest_neighbor,
    sharded_hypothesis_mean_dist, psum_mean,
)

__all__ = [
    "make_mesh", "initialize_distributed", "local_batch_slice",
    "batch_sharding", "replicate", "make_shard_batch_fn",
    "ring_nearest_neighbor", "sharded_nearest_neighbor",
    "sharded_hypothesis_mean_dist", "psum_mean",
]
