"""Device mesh construction and multi-host initialization."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (``jax.distributed.initialize``): the TPU-native
    replacement for a NCCL/MPI process-group init — afterwards
    ``jax.devices()`` spans the whole slice and collectives ride ICI/DCN.
    No-ops when env provides the coordination (TPU pods auto-configure)."""
    kwargs = {}
    if coordinator:
        kwargs.update(coordinator_address=coordinator,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        pass  # single-process (already initialized or no cluster env)


def make_mesh(n_devices: int | None = None,
              axis_names: tuple[str, ...] = ("data",),
              shape: tuple[int, ...] | None = None) -> Mesh:
    """Build a Mesh over the first ``n_devices`` devices. Default: 1-D
    ``(data,)`` mesh over all devices — frames/object-crops are
    embarrassingly parallel, so data parallelism is the natural first axis
    (SURVEY.md §2.3); a ``(data, point)`` 2-D mesh is supported for sharding
    the point/reference axes of very large clouds."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def local_batch_slice(global_batch: int, mesh: Mesh) -> slice:
    """This host's slice of a globally-sharded batch: each host loads only its
    shard of frames (host-sharded input pipeline, SURVEY.md §5.8)."""
    n_proc = jax.process_count()
    per = global_batch // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
