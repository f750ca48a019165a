"""Worker process for the 2-process ``jax.distributed`` CPU-cluster test.

Each worker owns 4 virtual CPU devices; together they form an 8-device
cluster with a localhost coordinator — the same multi-controller bring-up a
TPU pod uses over DCN (``parallel/mesh.py:initialize_distributed``,
SURVEY.md §5.8), executed for real. The worker host-shards a deterministic
global batch by ``local_batch_slice``, assembles global arrays, and runs two
REAL data-parallel pose train steps whose gradient psums cross the process
boundary.

Usage: python _distributed_worker.py <coordinator> <nproc> <pid> <out.json>
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

N_LOCAL_DEVICES = 4
GLOBAL_BATCH = 8
_CFG = dict(num_objects=3, num_points=16, crop_size=48, lr=1e-4)
_N, _M = 16, 16


def build_batch():
    """Deterministic GLOBAL batch, identical on every process."""
    from densefusion_tpu.data import PoseSample

    b, n, m, crop = GLOBAL_BATCH, _N, _M, _CFG["crop_size"]
    rng = np.random.default_rng(42)
    return PoseSample(
        points=rng.standard_normal((b, n, 3)).astype(np.float32) * 0.05,
        choose=rng.integers(0, crop * crop, (b, n)).astype(np.int32),
        img=rng.standard_normal((b, crop, crop, 3)).astype(np.float32),
        target=rng.standard_normal((b, m, 3)).astype(np.float32) * 0.05,
        model_points=rng.standard_normal((b, m, 3)).astype(np.float32) * 0.05,
        obj_idx=rng.integers(0, 3, (b,)).astype(np.int32),
        sym=np.asarray([True, False] * (b // 2), bool),
        valid=np.ones((b,), bool),
    )


def build_models_and_state(batch):
    import jax

    from densefusion_tpu.models import PoseNet, PoseRefineNet
    from densefusion_tpu.train import create_train_state
    from densefusion_tpu.utils.config import RunConfig

    cfg = RunConfig(**_CFG)
    posenet = PoseNet(num_obj=cfg.num_objects)
    refiner = PoseRefineNet(num_obj=cfg.num_objects)
    state = create_train_state(posenet, refiner, cfg, jax.random.key(0),
                               batch)
    return posenet, state, cfg


def run_two_steps(posenet, state, cfg, mesh, global_batch_arrays):
    """Two donated pose train steps over the mesh; returns (loss1, loss2)."""
    import jax

    from densefusion_tpu.train.state import make_optimizer
    from densefusion_tpu.train.steps import make_pose_train_step

    tx = make_optimizer(cfg.lr)
    step = make_pose_train_step(posenet, tx, use_adds=True, knn_backend="xla")
    w = np.float32(0.015)
    state, metrics1 = step(state, global_batch_arrays, w)
    state, metrics2 = step(state, global_batch_arrays, w)
    get = lambda x: float(np.asarray(
        x.addressable_data(0) if hasattr(x, "addressable_data") else x))
    return get(metrics1["loss"]), get(metrics2["loss"])


def main() -> None:
    coordinator, nproc, pid, out_path = sys.argv[1:5]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={N_LOCAL_DEVICES}")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from jax.sharding import NamedSharding, PartitionSpec as P

    from densefusion_tpu.parallel import (
        initialize_distributed, local_batch_slice, make_mesh,
    )

    initialize_distributed(coordinator, int(nproc), int(pid))
    assert jax.process_count() == int(nproc), (
        f"distributed init fell back to single-process "
        f"(process_count={jax.process_count()})")
    assert jax.device_count() == int(nproc) * N_LOCAL_DEVICES
    assert len(jax.local_devices()) == N_LOCAL_DEVICES

    mesh = make_mesh()  # all GLOBAL devices on the `data` axis
    batch = build_batch()
    # host-sharded input pipeline: this process materializes ONLY its slice
    sl = local_batch_slice(GLOBAL_BATCH, mesh)
    local = jax.tree.map(
        lambda x: x[sl] if getattr(x, "ndim", 0) else x, batch)
    data_sh = NamedSharding(mesh, P("data"))
    global_batch = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            data_sh, np.asarray(x)), local)

    posenet, state, cfg = build_models_and_state(batch)
    rep = NamedSharding(mesh, P())

    def replicate(x):
        if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype,
                                                         jax.dtypes.prng_key):
            data = np.asarray(jax.random.key_data(x))
            arr = jax.make_array_from_callback(
                data.shape, rep, lambda idx: data[idx])
            return jax.random.wrap_key_data(arr)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, rep, lambda idx: x[idx])

    state = jax.tree.map(replicate, state)

    loss1, loss2 = run_two_steps(posenet, state, cfg, mesh, global_batch)
    with open(out_path, "w") as f:
        json.dump({
            "process_id": int(pid),
            "process_count": jax.process_count(),
            "device_count": jax.device_count(),
            "local_devices": len(jax.local_devices()),
            "loss1": loss1,
            "loss2": loss2,
        }, f)


if __name__ == "__main__":
    main()
