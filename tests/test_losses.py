"""Loss tests: exactness at the optimum, ADD-S symmetry behavior,
canonicalization geometry, confidence-term algebra, batched-vs-loop equality
(SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from densefusion_tpu.geometry import (
    quat_normalize, quat_to_matrix, random_quaternion,
)
from densefusion_tpu.losses import pose_loss, refiner_loss, segmentation_loss


def _make_problem(rng, b=2, n=16, m=24, noise=0.0):
    """Random gt poses + observed clouds; predictions = gt (+ noise)."""
    key = jax.random.key(7)
    q_gt = random_quaternion(key, (b,))
    R_gt = quat_to_matrix(q_gt)
    t_gt = jnp.asarray(rng.uniform(-0.5, 0.5, (b, 3)), dtype=jnp.float32)
    model = jnp.asarray(rng.uniform(-0.05, 0.05, (b, m, 3)), jnp.float32)
    target = model @ jnp.swapaxes(R_gt, -1, -2) + t_gt[:, None, :]
    points = jnp.asarray(rng.uniform(-0.1, 0.1, (b, n, 3)), jnp.float32) \
        + t_gt[:, None, :]
    pred_r = jnp.broadcast_to(q_gt[:, None, :], (b, n, 4))
    pred_t = t_gt[:, None, :] - points  # offset convention
    if noise:
        pred_r = pred_r + noise * jnp.asarray(rng.standard_normal((b, n, 4)),
                                              jnp.float32)
        pred_t = pred_t + noise * jnp.asarray(rng.standard_normal((b, n, 3)),
                                              jnp.float32)
    return dict(q_gt=q_gt, R_gt=R_gt, t_gt=t_gt, model=model, target=target,
                points=points, pred_r=pred_r, pred_t=pred_t)


def test_pose_loss_zero_at_optimum(rng):
    p = _make_problem(rng)
    b, n = p["points"].shape[:2]
    pred_c = jnp.full((b, n), 0.9)
    out = pose_loss(p["pred_r"], p["pred_t"], pred_c, p["target"], p["model"],
                    p["points"], sym=jnp.zeros((b,), bool), w=0.015,
                    knn_backend="xla")
    np.testing.assert_allclose(np.asarray(out.dis), 0.0, atol=1e-5)
    # loss = mean(0*c - w log c) = -w log 0.9
    np.testing.assert_allclose(np.asarray(out.loss), -0.015 * np.log(0.9),
                               atol=1e-6)
    # canonicalized target == model points when prediction is exact
    np.testing.assert_allclose(np.asarray(out.new_target), np.asarray(p["model"]),
                               atol=1e-5)
    # best_t == gt translation
    np.testing.assert_allclose(np.asarray(out.best_t), np.asarray(p["t_gt"]),
                               atol=1e-5)


def test_pose_loss_confidence_selects_best(rng):
    """Only the argmax-confidence hypothesis defines dis/new_points, matching
    the reference's which_max selection (lib/loss.py:54-70)."""
    p = _make_problem(rng, noise=0.0)
    b, n = p["points"].shape[:2]
    # corrupt all hypotheses except index 3
    bad_r = p["pred_r"].at[:, :3].add(0.5)
    conf = jnp.full((b, n), 0.5).at[:, 3].set(0.99)
    out = pose_loss(bad_r, p["pred_t"], conf, p["target"], p["model"],
                    p["points"], sym=jnp.zeros((b,), bool), w=0.015,
                    knn_backend="xla")
    np.testing.assert_allclose(np.asarray(out.dis), 0.0, atol=1e-5)


def test_pose_loss_matches_manual_formula(rng):
    """Batched implementation == straightforward per-sample numpy evaluation."""
    p = _make_problem(rng, noise=0.05)
    b, n = p["points"].shape[:2]
    m = p["model"].shape[1]
    conf = jnp.asarray(rng.uniform(0.3, 0.9, (b, n)), jnp.float32)
    w = 0.02
    out = pose_loss(p["pred_r"], p["pred_t"], conf, p["target"], p["model"],
                    p["points"], sym=jnp.zeros((b,), bool), w=w,
                    knn_backend="xla")
    # manual
    q = np.asarray(quat_normalize(p["pred_r"]))
    R = np.asarray(quat_to_matrix(jnp.asarray(q)))
    t = np.asarray(p["points"] + p["pred_t"])
    model, target = np.asarray(p["model"]), np.asarray(p["target"])
    dis = np.zeros((b, n))
    for bi in range(b):
        for ni in range(n):
            pred = model[bi] @ R[bi, ni].T + t[bi, ni]
            dis[bi, ni] = np.linalg.norm(pred - target[bi], axis=-1).mean()
    c = np.asarray(conf)
    loss_manual = (dis * c - w * np.log(c)).mean()
    np.testing.assert_allclose(np.asarray(out.loss), loss_manual, rtol=1e-4)


def test_pose_loss_adds_symmetric_object(rng):
    """Ring target rotated by whole point-spacings: ADD-S ~ 0, ADD > 0."""
    n_ring, n_pts = 60, 8
    theta = np.linspace(0, 2 * np.pi, n_ring, endpoint=False)
    ring = np.stack([np.cos(theta), np.sin(theta), np.zeros_like(theta)],
                    -1).astype(np.float32) * 0.05
    phi = 2 * np.pi / n_ring * 5
    q_pred = np.array([np.cos(phi / 2), 0, 0, np.sin(phi / 2)], np.float32)

    model = jnp.asarray(ring)[None]
    target = model  # gt pose = identity
    points = jnp.zeros((1, n_pts, 3))
    pred_r = jnp.broadcast_to(jnp.asarray(q_pred), (1, n_pts, 4))
    pred_t = jnp.zeros((1, n_pts, 3))
    conf = jnp.full((1, n_pts), 0.8)

    out_sym = pose_loss(pred_r, pred_t, conf, target, model, points,
                        sym=jnp.ones((1,), bool), w=0.0, knn_backend="xla")
    out_asym = pose_loss(pred_r, pred_t, conf, target, model, points,
                         sym=jnp.zeros((1,), bool), w=0.0, knn_backend="xla")
    assert float(out_sym.dis[0]) < 1e-5
    assert float(out_asym.dis[0]) > 0.01


def test_pose_loss_finite_gradient_at_exact_pose(rng):
    """Regression: the factored symmetric d² (‖p‖² + kernel score) cancels to
    ≤0 under near-exact poses; without the sqrt floor the gradient NaNs.
    Both sym and non-sym rows must yield finite gradients at the optimum."""
    p = _make_problem(rng)
    b, n = p["points"].shape[:2]
    conf = jnp.full((b, n), 0.9)
    for sym in (jnp.ones((b,), bool), jnp.zeros((b,), bool)):
        def f(r, t):
            return pose_loss(r, t, conf, p["target"], p["model"], p["points"],
                             sym=sym, w=0.015, knn_backend="xla").loss
        gr, gt = jax.grad(f, argnums=(0, 1))(p["pred_r"], p["pred_t"])
        assert np.all(np.isfinite(np.asarray(gr)))
        assert np.all(np.isfinite(np.asarray(gt)))


def test_pose_loss_no_gradient_through_canonicalization(rng):
    p = _make_problem(rng, noise=0.05)
    b, n = p["points"].shape[:2]
    conf = jnp.full((b, n), 0.5)

    def f(pred_r):
        out = pose_loss(pred_r, p["pred_t"], conf, p["target"], p["model"],
                        p["points"], sym=jnp.zeros((b,), bool), w=0.015,
                        knn_backend="xla")
        return jnp.sum(out.new_points) + jnp.sum(out.new_target)

    g = jax.grad(f)(p["pred_r"])
    assert float(jnp.abs(g).max()) == 0.0


def test_refiner_loss_zero_at_optimum_and_canonicalizes(rng):
    p = _make_problem(rng)
    b = p["model"].shape[0]
    n = p["points"].shape[1]
    # operate in the gt canonical frame: target == model, residual = identity
    out = refiner_loss(
        jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (b, 4)),
        jnp.zeros((b, 3)), p["model"], p["model"],
        p["points"], sym=jnp.zeros((b,), bool), knn_backend="xla")
    # the loss floors sqrt(d²) at 1e-12, so dis reads exactly 1e-6 here
    np.testing.assert_allclose(np.asarray(out.dis), 0.0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.new_points),
                               np.asarray(p["points"]), atol=1e-6)


def test_refiner_loss_residual_composition(rng):
    """Applying the true residual pose zeroes the distance and re-canonicalizes
    the target back onto the model points."""
    p = _make_problem(rng)
    b = p["model"].shape[0]
    out = refiner_loss(
        jnp.broadcast_to(p["q_gt"], (b, 4)) if p["q_gt"].shape == (b, 4)
        else p["q_gt"],
        p["t_gt"], p["target"], p["model"], p["points"],
        sym=jnp.zeros((b,), bool), knn_backend="xla")
    np.testing.assert_allclose(np.asarray(out.dis), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.new_target),
                               np.asarray(p["model"]), atol=1e-5)


def test_segmentation_loss_matches_manual(rng):
    logits = jnp.asarray(rng.standard_normal((2, 4, 4, 5)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 5, (2, 4, 4)))
    got = segmentation_loss(logits, labels)
    lp = jax.nn.log_softmax(logits, axis=-1)
    manual = -np.mean([lp[b, i, j, labels[b, i, j]]
                       for b in range(2) for i in range(4) for j in range(4)])
    np.testing.assert_allclose(np.asarray(got), manual, rtol=1e-5)


def test_segmentation_loss_weighted_ignores(rng):
    logits = jnp.asarray(rng.standard_normal((1, 2, 2, 3)), jnp.float32)
    labels = jnp.zeros((1, 2, 2), jnp.int32)
    w = jnp.asarray([[[1.0, 0.0], [0.0, 0.0]]])
    got = segmentation_loss(logits, labels, weights=w)
    lp = jax.nn.log_softmax(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(got), -np.asarray(lp[0, 0, 0, 0]),
                               rtol=1e-5)


def test_pose_loss_pallas_backend_matches_xla(rng):
    """The fused Pallas distance path (interpreter mode) must agree with the
    XLA path through the whole loss — values and parameter gradients."""
    from jax.experimental.pallas import tpu as pltpu
    p = _make_problem(rng, b=3, n=8, m=12, noise=0.05)
    b, n = p["points"].shape[:2]
    conf = jnp.asarray(rng.uniform(0.3, 0.9, (b, n)), jnp.float32)
    sym = jnp.asarray([True, False, True])

    def f(r, t, backend):
        out = pose_loss(r, t, conf, p["target"], p["model"], p["points"],
                        sym=sym, w=0.015, knn_backend=backend)
        return out.loss, out.dis

    loss_x, dis_x = f(p["pred_r"], p["pred_t"], "xla")
    gr_x, gt_x = jax.grad(lambda r, t: f(r, t, "xla")[0], argnums=(0, 1))(
        p["pred_r"], p["pred_t"])
    with pltpu.force_tpu_interpret_mode():
        loss_p, dis_p = f(p["pred_r"], p["pred_t"], "pallas")
        gr_p, gt_p = jax.grad(
            lambda r, t: f(r, t, "pallas")[0], argnums=(0, 1))(
            p["pred_r"], p["pred_t"])
    np.testing.assert_allclose(np.asarray(loss_p), np.asarray(loss_x),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dis_p), np.asarray(dis_x),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gr_p), np.asarray(gr_x),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt_p), np.asarray(gt_x),
                               rtol=1e-4, atol=1e-6)


def test_refiner_loss_pallas_backend_matches_xla(rng):
    from jax.experimental.pallas import tpu as pltpu
    p = _make_problem(rng, b=2, n=6, m=10, noise=0.05)
    b = p["model"].shape[0]
    sym = jnp.asarray([True, False])
    pred_r = p["pred_r"][:, 0]
    pred_t = jnp.asarray(rng.uniform(-0.2, 0.2, (b, 3)), jnp.float32)

    def f(r, t, backend):
        return refiner_loss(r, t, p["target"], p["model"], p["points"],
                            sym=sym, knn_backend=backend).loss

    loss_x = f(pred_r, pred_t, "xla")
    g_x = jax.grad(f, argnums=(0, 1))(pred_r, pred_t, "xla")
    with pltpu.force_tpu_interpret_mode():
        loss_p = f(pred_r, pred_t, "pallas")
        g_p = jax.grad(f, argnums=(0, 1))(pred_r, pred_t, "pallas")
    np.testing.assert_allclose(np.asarray(loss_p), np.asarray(loss_x),
                               rtol=1e-5)
    for a, b_ in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)


def test_loss_dis_matches_eval_metric(rng):
    """The training loss's best-hypothesis distance must equal the eval
    metric's pose_distances for that pose — loss and metric share semantics
    (SURVEY.md §7.1 'implemented once and shared')."""
    from densefusion_tpu.eval import pose_distances
    p = _make_problem(rng, noise=0.05)
    b, n = p["points"].shape[:2]
    conf = jnp.asarray(rng.uniform(0.1, 0.9, (b, n)), jnp.float32)
    out = pose_loss(p["pred_r"], p["pred_t"], conf, p["target"], p["model"],
                    p["points"], sym=jnp.zeros((b,), bool), w=0.015,
                    knn_backend="xla")
    metric = pose_distances(p["model"], out.best_r, out.best_t, p["target"],
                            sym=jnp.zeros((b,), bool), backend="xla")
    np.testing.assert_allclose(np.asarray(out.dis), np.asarray(metric),
                               rtol=1e-4)
