"""Parallelism tests on the virtual 8-device CPU mesh: sharded training step
equivalence with single-device, sharded KNN correctness, batch placement
(SURVEY.md §4 'multi-device tests on CPU')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from densefusion_tpu.parallel import (
    make_mesh, batch_sharding, replicate, make_shard_batch_fn,
    sharded_nearest_neighbor,
)
from densefusion_tpu.ops import nearest_neighbor_xla


def test_mesh_has_8_cpu_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_sharded_knn_matches_single_device(rng):
    mesh = make_mesh()
    q = jnp.asarray(rng.standard_normal((96, 3)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((64, 3)), jnp.float32)  # 8 per shard
    d_ref, i_ref = nearest_neighbor_xla(q, r)
    d, i = sharded_nearest_neighbor(q, r, mesh, backend="xla")
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)


def test_shard_batch_places_on_mesh(rng):
    from densefusion_tpu.data import PoseSample, collate
    mesh = make_mesh()
    shard = make_shard_batch_fn(mesh)
    batch = collate([PoseSample.invalid(16, 16, 32) for _ in range(8)])
    sharded = shard(batch)
    assert sharded.points.sharding.num_devices == 8
    # axis-0 split across devices
    shard_shapes = [s.data.shape for s in sharded.points.addressable_shards]
    assert all(s == (1, 16, 3) for s in shard_shapes)


@pytest.mark.slow
def test_data_parallel_train_step_matches_single(rng):
    """One jitted pose train step, batch sharded over 8 devices, must produce
    (numerically close) identical params to the unsharded run — XLA inserts
    the gradient reduction."""
    from densefusion_tpu.models import PoseNet, PoseRefineNet
    from densefusion_tpu.train import create_train_state, make_pose_train_step
    from densefusion_tpu.train.state import make_optimizer
    from densefusion_tpu.data import PoseSample, collate
    from densefusion_tpu.utils.config import RunConfig

    cfg = RunConfig(num_objects=2, num_points=16, crop_size=32, lr=1e-3)
    b, n, m, crop = 8, 16, 16, 32

    def make_batch():
        r = np.random.default_rng(3)
        return PoseSample(
            points=r.standard_normal((b, n, 3)).astype(np.float32) * 0.05,
            choose=r.integers(0, crop * crop, (b, n)).astype(np.int32),
            img=r.standard_normal((b, crop, crop, 3)).astype(np.float32),
            target=r.standard_normal((b, m, 3)).astype(np.float32) * 0.05,
            model_points=r.standard_normal((b, m, 3)).astype(np.float32) * 0.05,
            obj_idx=r.integers(0, 2, (b,)).astype(np.int32),
            sym=np.zeros((b,), bool),
            valid=np.ones((b,), bool),
        )

    posenet, refiner = PoseNet(num_obj=2), PoseRefineNet(num_obj=2)
    batch = make_batch()
    rng_key = jax.random.key(0)
    tx = make_optimizer(cfg.lr)
    step = make_pose_train_step(posenet, tx, use_adds=False)

    state1 = create_train_state(posenet, refiner, cfg, rng_key, batch)
    state1, m1 = step(state1, batch, np.float32(0.015))

    mesh = make_mesh()
    shard = make_shard_batch_fn(mesh)
    state2 = create_train_state(posenet, refiner, cfg, rng_key, batch)
    state2 = jax.device_put(state2, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    state2, m2 = step(state2, shard(batch), np.float32(0.015))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    l1 = jax.tree.leaves(state1.params_pose)
    l2 = jax.tree.leaves(state2.params_pose)
    # cross-device reduction order differs; Adam's grad normalization can
    # amplify ulp-level grad differences, so compare loosely per-element
    for a, b_ in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3)


def test_replicate(rng):
    mesh = make_mesh()
    tree = {"w": jnp.ones((4, 4))}
    rep = replicate(tree, mesh)
    assert rep["w"].sharding.is_fully_replicated


def test_sharded_knn_non_divisible_ref(rng):
    """M=2600 (the YCB refine-phase mesh cloud) does not divide 8 — the
    sentinel padding must keep results exact (VERDICT round-1 weak #5)."""
    from densefusion_tpu.parallel.collectives import sharded_nearest_neighbor
    mesh = make_mesh()
    q = jnp.asarray(rng.standard_normal((130, 3)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((2600, 3)), jnp.float32)
    d_ref, i_ref = nearest_neighbor_xla(q, r)
    d, i = sharded_nearest_neighbor(q, r, mesh, backend="xla")
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)


def test_ring_knn_matches_single_device(rng):
    """Ring-pass variant (query+ref both sharded, tiles rotated by ppermute,
    SURVEY.md §5.7) at M=2600 on the 8-device CPU mesh."""
    from densefusion_tpu.parallel.collectives import ring_nearest_neighbor
    mesh = make_mesh()
    q = jnp.asarray(rng.standard_normal((101, 3)), jnp.float32)  # non-div Q
    r = jnp.asarray(rng.standard_normal((2600, 3)), jnp.float32)
    d_ref, i_ref = nearest_neighbor_xla(q, r)
    d, i = ring_nearest_neighbor(q, r, mesh, backend="xla")
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)


def test_ring_knn_tiny_ref_fewer_than_shards(rng):
    from densefusion_tpu.parallel.collectives import ring_nearest_neighbor
    mesh = make_mesh()
    q = jnp.asarray(rng.standard_normal((17, 3)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((5, 3)), jnp.float32)  # R < 8 shards
    d_ref, i_ref = nearest_neighbor_xla(q, r)
    d, i = ring_nearest_neighbor(q, r, mesh, backend="xla")
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-5)


def test_sharded_hypothesis_mean_dist_matches_single(rng):
    """Hypothesis-axis-sharded fused ADD(-S) distance (SURVEY.md §5.7) on the
    8-device mesh: values AND (R, t) gradients match the unsharded op, with a
    non-divisible N and a mixed-sym batch."""
    from densefusion_tpu.geometry import quat_to_matrix, random_quaternion
    from densefusion_tpu.ops.add_dist import hypothesis_mean_dist_xla
    from densefusion_tpu.parallel import sharded_hypothesis_mean_dist

    mesh = make_mesh()
    b, n, m = 3, 13, 11                       # N=13 does not divide 8
    R = quat_to_matrix(random_quaternion(jax.random.key(2), (b, n)))
    t = jnp.asarray(rng.uniform(-0.3, 0.3, (b, n, 3)), jnp.float32)
    model = jnp.asarray(rng.uniform(-0.05, 0.05, (b, m, 3)), jnp.float32)
    target = model @ jnp.swapaxes(
        quat_to_matrix(random_quaternion(jax.random.key(4), (b,))), -1, -2) \
        + jnp.asarray(rng.uniform(-0.3, 0.3, (b, 1, 3)), jnp.float32)
    sym = jnp.asarray([True, False, True])
    wgt = jnp.asarray(rng.uniform(0.2, 1.0, (b, n)), jnp.float32)

    def loss_ref(R_, t_):
        return jnp.sum(hypothesis_mean_dist_xla(R_, t_, model, target,
                                                sym, True) * wgt)

    def loss_sharded(R_, t_):
        return jnp.sum(sharded_hypothesis_mean_dist(
            R_, t_, model, target, sym, mesh, backend="xla") * wgt)

    want = hypothesis_mean_dist_xla(R, t, model, target, sym, True)
    got = sharded_hypothesis_mean_dist(R, t, model, target, sym, mesh,
                                       backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-7)

    gR_ref, gt_ref = jax.grad(loss_ref, argnums=(0, 1))(R, t)
    gR, gt_ = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(R, t)
    np.testing.assert_allclose(np.asarray(gR), np.asarray(gR_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt_), np.asarray(gt_ref),
                               rtol=1e-4, atol=1e-6)


def test_2d_mesh_data_point_sharding(rng):
    """2-D (data, point) mesh (SURVEY.md §5.8): batch sharded over `data`
    while the hypothesis axis of the fused loss distance and the 1-NN
    collectives ride `point` — values and gradients match 1-device math."""
    from densefusion_tpu.geometry import quat_to_matrix, random_quaternion
    from densefusion_tpu.ops.add_dist import hypothesis_mean_dist_xla
    from densefusion_tpu.parallel import (
        sharded_hypothesis_mean_dist, sharded_nearest_neighbor,
        ring_nearest_neighbor,
    )

    mesh = make_mesh(8, axis_names=("data", "point"), shape=(4, 2))
    b, n, m = 4, 13, 11
    R = quat_to_matrix(random_quaternion(jax.random.key(2), (b, n)))
    t = jnp.asarray(rng.uniform(-0.3, 0.3, (b, n, 3)), jnp.float32)
    model = jnp.asarray(rng.uniform(-0.05, 0.05, (b, m, 3)), jnp.float32)
    target = model @ jnp.swapaxes(
        quat_to_matrix(random_quaternion(jax.random.key(4), (b,))), -1, -2) \
        + jnp.asarray(rng.uniform(-0.3, 0.3, (b, 1, 3)), jnp.float32)
    sym = jnp.asarray([True, False, True, False])
    wgt = jnp.asarray(rng.uniform(0.2, 1.0, (b, n)), jnp.float32)

    def loss_ref(R_, t_):
        return jnp.sum(hypothesis_mean_dist_xla(R_, t_, model, target,
                                                sym, True) * wgt)

    def loss_2d(R_, t_):
        return jnp.sum(sharded_hypothesis_mean_dist(
            R_, t_, model, target, sym, mesh, axis="point",
            batch_axis="data", backend="xla") * wgt)

    want = hypothesis_mean_dist_xla(R, t, model, target, sym, True)
    got = sharded_hypothesis_mean_dist(R, t, model, target, sym, mesh,
                                       axis="point", batch_axis="data",
                                       backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-7)
    gR_ref, gt_ref = jax.grad(loss_ref, argnums=(0, 1))(R, t)
    gR, gt_ = jax.jit(jax.grad(loss_2d, argnums=(0, 1)))(R, t)
    np.testing.assert_allclose(np.asarray(gR), np.asarray(gR_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt_), np.asarray(gt_ref),
                               rtol=1e-4, atol=1e-6)

    # 1-NN collectives on the `point` axis of the same mesh
    q = jnp.asarray(rng.standard_normal((33, 3)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((21, 3)), jnp.float32)
    from densefusion_tpu.ops import nearest_neighbor_xla as nn_xla
    dw, iw = nn_xla(q, r)
    d1, i1 = sharded_nearest_neighbor(q, r, mesh, axis="point",
                                      backend="xla")
    d2, i2 = ring_nearest_neighbor(q, r, mesh, axis="point", backend="xla")
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(iw))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(iw))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(dw), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(dw), rtol=1e-5,
                               atol=1e-6)
