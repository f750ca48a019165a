"""Fused ADD/ADD-S hypothesis mean-distance: Pallas kernels (interpreter
mode) vs the XLA reference — values AND gradients (the kernels emit their
gradient coefficients in forward; backward is a pointwise multiply)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from densefusion_tpu.geometry import quat_to_matrix, random_quaternion
from densefusion_tpu.ops.add_dist import (
    hypothesis_mean_dist, hypothesis_mean_dist_xla, _fused_mean_dist,
)


def _problem(rng, b=2, n=5, m=12, noise=0.05):
    key = jax.random.key(11)
    q = random_quaternion(key, (b, n))
    R = quat_to_matrix(q)
    t = jnp.asarray(rng.uniform(-0.3, 0.3, (b, n, 3)), jnp.float32)
    model = jnp.asarray(rng.uniform(-0.05, 0.05, (b, m, 3)), jnp.float32)
    q_gt = random_quaternion(jax.random.key(3), (b,))
    target = model @ jnp.swapaxes(quat_to_matrix(q_gt), -1, -2) \
        + jnp.asarray(rng.uniform(-0.3, 0.3, (b, 1, 3)), jnp.float32)
    if noise == 0.0:
        # predictions == a valid pose pair so distances are ~0
        R = jnp.broadcast_to(quat_to_matrix(q_gt)[:, None], (b, n, 3, 3))
        t = jnp.broadcast_to(target.mean(1)[:, None] * 0
                             + (target - model @ jnp.swapaxes(
                                 quat_to_matrix(q_gt), -1, -2))[:, :1],
                             (b, n, 3))
    return R, t, model, target


@pytest.mark.parametrize("b,n,m", [(2, 5, 12), (1, 16, 24), (3, 130, 9)])
def test_fused_matches_xla_asym(rng, b, n, m):
    R, t, model, target = _problem(rng, b, n, m)
    sym = jnp.zeros((b,), bool)
    want = hypothesis_mean_dist_xla(R, t, model, target, sym, True)
    with pltpu.force_tpu_interpret_mode():
        got = _fused_mean_dist(R, t, model, target, sym, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-7)


def test_fused_matches_xla_sym(rng):
    R, t, model, target = _problem(rng, b=2, n=6, m=10)
    sym = jnp.ones((2,), bool)
    want = hypothesis_mean_dist_xla(R, t, model, target, sym, True)
    with pltpu.force_tpu_interpret_mode():
        got = _fused_mean_dist(R, t, model, target, sym, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-7)


def test_fused_mixed_sym_batch(rng):
    R, t, model, target = _problem(rng, b=4, n=5, m=11)
    sym = jnp.asarray([True, False, True, False])
    want = hypothesis_mean_dist_xla(R, t, model, target, sym, True)
    with pltpu.force_tpu_interpret_mode():
        got = _fused_mean_dist(R, t, model, target, sym, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-7)


def test_fused_use_adds_false_ignores_sym(rng):
    R, t, model, target = _problem(rng, b=2, n=5, m=9)
    sym = jnp.ones((2,), bool)
    want = hypothesis_mean_dist_xla(R, t, model, target, sym, False)
    with pltpu.force_tpu_interpret_mode():
        got = _fused_mean_dist(R, t, model, target, sym, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("sym_pattern", ["none", "all", "mixed"])
def test_fused_gradients_match_xla(rng, sym_pattern):
    """The in-kernel gradient coefficients must reproduce XLA autodiff of the
    reference formula, for both branches."""
    b, n, m = 3, 6, 10
    R, t, model, target = _problem(rng, b, n, m)
    sym = {"none": jnp.zeros((b,), bool),
           "all": jnp.ones((b,), bool),
           "mixed": jnp.asarray([True, False, True])}[sym_pattern]
    wgt = jnp.asarray(rng.uniform(0.2, 1.0, (b, n)), jnp.float32)

    def loss_xla(R_, t_):
        return jnp.sum(hypothesis_mean_dist_xla(R_, t_, model, target,
                                                sym, True) * wgt)

    def loss_fused(R_, t_):
        return jnp.sum(_fused_mean_dist(R_, t_, model, target,
                                        sym, True) * wgt)

    gR_x, gt_x = jax.grad(loss_xla, argnums=(0, 1))(R, t)
    with pltpu.force_tpu_interpret_mode():
        gR_f, gt_f = jax.grad(loss_fused, argnums=(0, 1))(R, t)
    np.testing.assert_allclose(np.asarray(gR_f), np.asarray(gR_x),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt_f), np.asarray(gt_x),
                               rtol=1e-4, atol=1e-6)


def test_fused_no_gradient_to_data(rng):
    """model/target/sym are data: their cotangents must be zero."""
    R, t, model, target = _problem(rng, 2, 4, 9)
    sym = jnp.asarray([True, False])

    def f(model_, target_):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(_fused_mean_dist(R, t, model_, target_, sym, True))

    gm, gt_ = jax.grad(f, argnums=(0, 1))(model, target)
    assert float(jnp.abs(gm).max()) == 0.0
    assert float(jnp.abs(gt_).max()) == 0.0


def test_fused_refiner_shape_n1(rng):
    """The refiner loss calls with a single hypothesis (N=1)."""
    R, t, model, target = _problem(rng, b=2, n=1, m=13)
    sym = jnp.asarray([True, False])
    want = hypothesis_mean_dist_xla(R, t, model, target, sym, True)
    with pltpu.force_tpu_interpret_mode():
        got = _fused_mean_dist(R, t, model, target, sym, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-7)


def test_fused_finite_gradient_at_exact_pose(rng):
    """sqrt floor: exact poses (d² ≈ 0) must yield finite gradients in both
    branches — the factored form NaNs here without the floor."""
    b, n, m = 2, 4, 8
    key = jax.random.key(5)
    q_gt = random_quaternion(key, (b,))
    R_gt = quat_to_matrix(q_gt)
    t_gt = jnp.asarray(rng.uniform(-0.2, 0.2, (b, 3)), jnp.float32)
    model = jnp.asarray(rng.uniform(-0.05, 0.05, (b, m, 3)), jnp.float32)
    target = model @ jnp.swapaxes(R_gt, -1, -2) + t_gt[:, None]
    R = jnp.broadcast_to(R_gt[:, None], (b, n, 3, 3))
    t = jnp.broadcast_to(t_gt[:, None], (b, n, 3))

    for sym in (jnp.ones((b,), bool), jnp.zeros((b,), bool)):
        def f(R_, t_):
            with pltpu.force_tpu_interpret_mode():
                return jnp.sum(_fused_mean_dist(R_, t_, model, target,
                                                sym, True))
        dis = f(R, t)
        assert float(dis) < n * 1e-5
        gR, gt_ = jax.grad(f, argnums=(0, 1))(R, t)
        assert np.all(np.isfinite(np.asarray(gR)))
        assert np.all(np.isfinite(np.asarray(gt_)))


def test_dispatch_and_bf16_inputs(rng):
    """backend='xla' on CPU goes to the reference; bf16 inputs are accepted
    and produce f32-accurate results through the cast wrapper."""
    R, t, model, target = _problem(rng, 2, 4, 9)
    sym = jnp.zeros((2,), bool)
    want = hypothesis_mean_dist(R, t, model, target, sym, backend="xla")
    with pltpu.force_tpu_interpret_mode():
        got = hypothesis_mean_dist(
            R.astype(jnp.bfloat16), t.astype(jnp.bfloat16), model, target,
            sym, backend="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=1e-4)

    def f(R_):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(hypothesis_mean_dist(R_, t, model, target, sym,
                                                backend="pallas"))
    g = jax.grad(f)(R.astype(jnp.bfloat16))
    assert g.dtype == jnp.bfloat16


def test_fused_multi_tile_m_gt_512(rng):
    """M > 512 exercises the kernels' multi-tile loops (the YCB refine mesh
    is 2600): the paired fori_loop over model tiles and the min kernel's
    multi-ref_tile search + shrunken hypothesis group."""
    b, n, m = 1, 8, 600
    q = random_quaternion(jax.random.key(11), (b, n))
    R = quat_to_matrix(q)
    t = jnp.asarray(rng.uniform(-0.3, 0.3, (b, n, 3)), jnp.float32)
    model = jnp.asarray(rng.uniform(-0.05, 0.05, (b, m, 3)), jnp.float32)
    target = model @ jnp.swapaxes(quat_to_matrix(
        random_quaternion(jax.random.key(3), (b,))), -1, -2) + 0.1
    for sym in (jnp.zeros((b,), bool), jnp.ones((b,), bool)):
        want = hypothesis_mean_dist_xla(R, t, model, target, sym, True)
        with pltpu.force_tpu_interpret_mode():
            got = _fused_mean_dist(R, t, model, target, sym, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-7)
