"""Eval tests: VOCap AUC against hand-computed MATLAB semantics, protocol
metrics, and the jitted estimate+refine pipeline (composition correctness via
an identity refiner)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from densefusion_tpu.eval import (
    add_distance, adds_distance, pose_distances, vocap_auc,
    accuracy_under_threshold, success_rate, InferencePipeline,
)
from densefusion_tpu.geometry import quat_to_matrix, random_quaternion
from densefusion_tpu.models import PoseNet, PoseRefineNet


def test_vocap_matches_matlab_semantics():
    # single pose at 0.05: VOCap's right-step integral gives 1.0 (the known
    # MATLAB quirk we must reproduce exactly, plot_accuracy_keyframe.m:150-170)
    assert vocap_auc(np.array([0.05])) == pytest.approx(1.0)
    # all failures
    assert vocap_auc(np.array([0.2, 0.5])) == pytest.approx(0.0)
    # empty
    assert vocap_auc(np.array([])) == 0.0
    # mixed: one at 0.02 (acc 0.5 from 0.02), one failure
    # mrec=[0,.02,.1], mpre=[0,.5,.5] -> (.02*.5 + .08*.5)/0.1 = 0.5
    assert vocap_auc(np.array([0.02, 0.3])) == pytest.approx(0.5)
    # two successes at 0.01, 0.03:
    # mrec=[0,.01,.03,.1], mpre=[0,.5,1,1] -> (.01*.5+.02*1+.07*1)/.1 = 0.95
    assert vocap_auc(np.array([0.01, 0.03])) == pytest.approx(0.95)


def test_vocap_monotone_in_quality():
    rng = np.random.default_rng(0)
    good = rng.uniform(0.0, 0.02, 200)
    bad = rng.uniform(0.0, 0.2, 200)
    assert vocap_auc(good) > vocap_auc(bad)


def test_threshold_metrics():
    d = np.array([0.01, 0.019, 0.02, 0.5])
    assert accuracy_under_threshold(d, 0.02) == pytest.approx(0.5)
    thr = np.array([0.02, 0.01, 0.1, 0.1])
    assert success_rate(d, thr) == pytest.approx(0.5)


def test_pose_distances_sym_vs_nonsym(rng):
    theta = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    ring = np.stack([np.cos(theta), np.sin(theta), np.zeros_like(theta)],
                    -1).astype(np.float32) * 0.04
    model = jnp.asarray(ring)[None]
    target = model
    phi = 2 * np.pi / 100 * 7
    quat = jnp.array([[np.cos(phi / 2), 0, 0, np.sin(phi / 2)]], jnp.float32)
    trans = jnp.zeros((1, 3))
    d_sym = pose_distances(model, quat, trans, target,
                           sym=jnp.ones((1,), bool), backend="xla")
    d_nonsym = pose_distances(model, quat, trans, target,
                              sym=jnp.zeros((1,), bool), backend="xla")
    assert float(d_sym[0]) < 1e-6 < float(d_nonsym[0])


def test_add_adds_relation(rng):
    pred = jnp.asarray(rng.standard_normal((2, 50, 3)), jnp.float32)
    gt = jnp.asarray(rng.standard_normal((2, 50, 3)), jnp.float32)
    add = add_distance(pred, gt)
    adds = adds_distance(pred, gt, backend="xla")
    assert (np.asarray(adds) <= np.asarray(add) + 1e-6).all()


class _IdentityRefiner:
    """Fake refiner predicting a zero residual — the pipeline must then return
    the un-refined pose unchanged regardless of iteration count."""

    def apply(self, params, points, emb, obj):
        b = points.shape[0]
        return {"pred_r": jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (b, 1)),
                "pred_t": jnp.zeros((b, 3))}


@pytest.fixture(scope="module")
def small_posenet():
    model = PoseNet(num_obj=2)
    key = jax.random.key(0)
    img = jax.random.normal(key, (2, 48, 48, 3))
    pts = jax.random.normal(key, (2, 32, 3)) * 0.05
    choose = jax.random.randint(key, (2, 32), 0, 48 * 48)
    obj = jnp.array([0, 1], dtype=jnp.int32)
    params = model.init(key, img, pts, choose, obj)
    return model, params, (img, pts, choose, obj)


def test_pipeline_no_refine_shapes(small_posenet):
    model, params, args = small_posenet
    pipe = InferencePipeline(model, refine_iters=0)
    q, t, c = pipe(params, None, *args)
    assert q.shape == (2, 4) and t.shape == (2, 3) and c.shape == (2,)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0,
                               rtol=1e-5)


def test_pipeline_identity_refiner_is_noop(small_posenet):
    model, params, args = small_posenet
    pipe0 = InferencePipeline(model, refine_iters=0)
    pipe4 = InferencePipeline(model, _IdentityRefiner(), refine_iters=4)
    q0, t0, _ = pipe0(params, None, *args)
    q4, t4, _ = pipe4(params, {}, *args)
    np.testing.assert_allclose(np.asarray(q4), np.asarray(q0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t4), np.asarray(t0), atol=1e-5)


def test_pipeline_refiner_composition(small_posenet):
    """A refiner returning a fixed rotation must compose: 2 iterations of
    rotation phi about z == rotation 2*phi composed onto the initial pose."""
    model, params, args = small_posenet
    phi = 0.1

    class FixedRefiner:
        def apply(self, p, points, emb, obj):
            b = points.shape[0]
            q = jnp.array([np.cos(phi / 2), 0, 0, np.sin(phi / 2)],
                          jnp.float32)
            return {"pred_r": jnp.tile(q, (b, 1)), "pred_t": jnp.zeros((b, 3))}

    from densefusion_tpu.geometry import quat_multiply
    q0, t0, _ = InferencePipeline(model, refine_iters=0)(params, None, *args)
    q2, t2, _ = InferencePipeline(model, FixedRefiner(), refine_iters=2)(
        params, {}, *args)
    qr = jnp.array([np.cos(phi / 2), 0, 0, np.sin(phi / 2)], jnp.float32)
    expect = quat_multiply(quat_multiply(q0, jnp.tile(qr, (2, 1))),
                           jnp.tile(qr, (2, 1)))
    np.testing.assert_allclose(np.asarray(q2), np.asarray(expect), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t0), atol=1e-5)


def test_real_refiner_pipeline_runs(small_posenet):
    model, params, args = small_posenet
    refiner = PoseRefineNet(num_obj=2)
    _, pts, _, obj = args
    emb = jnp.zeros((2, 32, 32))
    rparams = refiner.init(jax.random.key(1), pts, emb, obj)
    pipe = InferencePipeline(model, refiner, refine_iters=2)
    q, t, c = pipe(params, rparams, *args)
    assert q.shape == (2, 4) and np.isfinite(np.asarray(t)).all()
