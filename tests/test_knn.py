"""KNN kernel tests: XLA path vs brute-force numpy, Pallas kernel in
interpreter mode vs the XLA path (SURVEY.md §4 'KNN kernel vs brute-force
jnp reference')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from densefusion_tpu.ops import (
    nearest_neighbor, nearest_neighbor_xla, knn, adds_remap_targets,
)
from densefusion_tpu.ops.knn import nearest_neighbor_pallas


def _brute(query, ref):
    d = ((query[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
    return d.min(-1), d.argmin(-1)


def test_xla_matches_brute(rng):
    q = rng.standard_normal((257, 3)).astype(np.float32)
    r = rng.standard_normal((83, 3)).astype(np.float32)
    d, i = nearest_neighbor_xla(jnp.asarray(q), jnp.asarray(r))
    bd, bi = _brute(q, r)
    np.testing.assert_array_equal(np.asarray(i), bi)
    np.testing.assert_allclose(np.asarray(d), bd, atol=1e-5)


def test_xla_chunked_matches_brute(rng):
    q = rng.standard_normal((1000, 3)).astype(np.float32)
    r = rng.standard_normal((50, 3)).astype(np.float32)
    d, i = nearest_neighbor_xla(jnp.asarray(q), jnp.asarray(r), chunk=256)
    bd, bi = _brute(q, r)
    np.testing.assert_array_equal(np.asarray(i), bi)
    np.testing.assert_allclose(np.asarray(d), bd, atol=1e-4)


def test_pallas_reduction_variants_match(rng):
    """Both lane-reduction formulations (variadic argmin / masked-iota
    two-pass) must agree with the XLA path, including tie-breaking to the
    lowest index."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from densefusion_tpu.ops.knn import nearest_neighbor_xla
    q = rng.standard_normal((600, 3)).astype(np.float32)
    r = np.concatenate([rng.standard_normal((250, 3)).astype(np.float32)] * 2)
    d_want, i_want = nearest_neighbor_xla(jnp.asarray(q), jnp.asarray(r))
    with jax.disable_jit():
        with pltpu.force_tpu_interpret_mode():
            for reduction in ("argmin", "iota"):
                d, i = nearest_neighbor_pallas(jnp.asarray(q), jnp.asarray(r),
                                               reduction=reduction)
                np.testing.assert_allclose(np.asarray(d), np.asarray(d_want),
                                           rtol=1e-5, atol=1e-5)
                # duplicated refs force ties: both must pick the low index
                np.testing.assert_array_equal(np.asarray(i),
                                              np.asarray(i_want),
                                              err_msg=reduction)


def test_pallas_batched_matches_xla(rng):
    """The batch-in-grid kernel (sublane reduction, transposed coords) must
    match the per-sample XLA path, each sample against its OWN refs."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from densefusion_tpu.ops.knn import (
        nearest_neighbor_pallas_batched, nearest_neighbor_xla)
    q = rng.standard_normal((3, 700, 3)).astype(np.float32)
    r = rng.standard_normal((3, 300, 3)).astype(np.float32)
    r[1] = np.concatenate([r[1, :150]] * 2)     # ties in sample 1
    with jax.disable_jit():
        with pltpu.force_tpu_interpret_mode():
            d, i = nearest_neighbor_pallas_batched(jnp.asarray(q),
                                                   jnp.asarray(r))
    for b in range(3):
        d_want, i_want = nearest_neighbor_xla(jnp.asarray(q[b]),
                                              jnp.asarray(r[b]))
        np.testing.assert_allclose(np.asarray(d)[b], np.asarray(d_want),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i)[b], np.asarray(i_want))


def test_fused_remap_matches_gather(rng):
    """The fused coord-remap kernel must equal XLA NN + gather, including
    tie-breaking (duplicated refs -> same coordinates either way)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from densefusion_tpu.ops.knn import (
        adds_remap_pallas_batched, nearest_neighbor_xla)
    q = rng.standard_normal((2, 600, 3)).astype(np.float32)
    r = rng.standard_normal((2, 300, 3)).astype(np.float32)
    with jax.disable_jit():
        with pltpu.force_tpu_interpret_mode():
            got, dm = adds_remap_pallas_batched(jnp.asarray(q),
                                                jnp.asarray(r))
    for b in range(2):
        d2, idx = nearest_neighbor_xla(jnp.asarray(q[b]), jnp.asarray(r[b]))
        want = r[b][np.asarray(idx)]
        np.testing.assert_allclose(np.asarray(got)[b], want, rtol=1e-5,
                                   atol=1e-6)
        # row-3 score = min squared distance minus ||q||^2
        want_dm = np.asarray(d2) - np.sum(q[b] * q[b], -1)
        np.testing.assert_allclose(np.asarray(dm)[b], want_dm, rtol=1e-4,
                                   atol=1e-5)


def test_fused_remap_active_mask(rng):
    """Inactive rows skip the search and return zeros; active rows match
    the gather reference (the sym-gating of the training loss)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu
    from densefusion_tpu.ops.knn import (
        adds_remap_pallas_batched, nearest_neighbor_xla)
    q = rng.standard_normal((3, 600, 3)).astype(np.float32)
    r = rng.standard_normal((3, 300, 3)).astype(np.float32)
    active = jnp.asarray([True, False, True])
    with jax.disable_jit():
        with pltpu.force_tpu_interpret_mode():
            got, _ = adds_remap_pallas_batched(jnp.asarray(q),
                                               jnp.asarray(r), active)
    got = np.asarray(got)
    assert not np.any(got[1])
    for b in (0, 2):
        _, idx = nearest_neighbor_xla(jnp.asarray(q[b]), jnp.asarray(r[b]))
        np.testing.assert_allclose(got[b], r[b][np.asarray(idx)], rtol=1e-5,
                                   atol=1e-6)


def test_min_sqdist_value_and_gradient(rng):
    """adds_min_sqdist_minus_qsq must match the direct min-distance and its
    custom VJP must equal the autodiff gradient of the materialized form
    (away from ties)."""
    from densefusion_tpu.ops.knn import adds_min_sqdist_minus_qsq
    pred = jnp.asarray(rng.standard_normal((2, 50, 3)), jnp.float32)
    target = jnp.asarray(rng.standard_normal((2, 30, 3)), jnp.float32)
    active = jnp.asarray([True, True])

    def factored(p):
        dm = adds_min_sqdist_minus_qsq(p, target, active, "xla")
        return jnp.sum(dm + jnp.sum(p * p, -1))

    def direct(p):
        d = jnp.sum((p[:, :, None] - target[:, None]) ** 2, -1)
        return jnp.sum(jnp.min(d, -1))

    np.testing.assert_allclose(np.asarray(factored(pred)),
                               np.asarray(direct(pred)), rtol=1e-5)
    g1 = np.asarray(jax.grad(factored)(pred))
    g2 = np.asarray(jax.grad(direct)(pred))
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)

    # gated rows return zero value and zero gradient
    gated = jnp.asarray([True, False])

    def factored_gated(p):
        return jnp.sum(adds_min_sqdist_minus_qsq(p, target, gated, "xla"))

    assert not np.any(np.asarray(
        adds_min_sqdist_minus_qsq(pred, target, gated, "xla"))[1])
    assert not np.any(np.asarray(jax.grad(factored_gated)(pred))[1])


def test_pallas_interpret_matches_xla(rng):
    # interpret mode runs the kernel logic on CPU
    q = rng.standard_normal((600, 3)).astype(np.float32) * 0.5
    r = rng.standard_normal((500, 3)).astype(np.float32) * 0.5
    with jax.disable_jit():  # interpret path under disable_jit uses interpreter
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            d, i = nearest_neighbor_pallas(jnp.asarray(q), jnp.asarray(r))
    bd, bi = _brute(q, r)
    np.testing.assert_array_equal(np.asarray(i), bi)
    np.testing.assert_allclose(np.asarray(d), bd, atol=1e-4)


def test_batched_nearest_neighbor(rng):
    q = rng.standard_normal((4, 100, 3)).astype(np.float32)
    r = rng.standard_normal((4, 37, 3)).astype(np.float32)
    d, i = nearest_neighbor(jnp.asarray(q), jnp.asarray(r), backend="xla")
    assert d.shape == (4, 100) and i.shape == (4, 100)
    for b in range(4):
        bd, bi = _brute(q[b], r[b])
        np.testing.assert_array_equal(np.asarray(i[b]), bi)


def test_knn_k3_sorted(rng):
    q = rng.standard_normal((40, 3)).astype(np.float32)
    r = rng.standard_normal((25, 3)).astype(np.float32)
    d, i = knn(jnp.asarray(q), jnp.asarray(r), k=3, backend="xla")
    assert d.shape == (40, 3) and i.shape == (40, 3)
    dn = np.asarray(d)
    assert (np.diff(dn, axis=-1) >= -1e-6).all()
    bd, bi = _brute(q, r)
    np.testing.assert_array_equal(np.asarray(i[:, 0]), bi)


def test_knn_k1_matches_wrapper(rng):
    q = rng.standard_normal((64, 3)).astype(np.float32)
    r = rng.standard_normal((32, 3)).astype(np.float32)
    d, i = knn(jnp.asarray(q), jnp.asarray(r), k=1, backend="xla")
    bd, bi = _brute(q, r)
    np.testing.assert_array_equal(np.asarray(i[:, 0]), bi)


def test_adds_remap_identity_when_same_cloud(rng):
    pts = rng.standard_normal((30, 3)).astype(np.float32)
    out = adds_remap_targets(jnp.asarray(pts), jnp.asarray(pts), backend="xla")
    np.testing.assert_allclose(np.asarray(out), pts, atol=1e-6)


def test_adds_remap_symmetric_invariance(rng):
    """A rotationally-symmetric ring: rotating the prediction around the axis
    must leave the ADD-S distance ~0 — the reason the remap exists."""
    theta = np.linspace(0, 2 * np.pi, 200, endpoint=False)
    ring = np.stack([np.cos(theta), np.sin(theta), np.zeros_like(theta)], -1)
    phi = 2 * np.pi / 200 * 3  # rotate by three whole point spacings
    rot = np.array([[np.cos(phi), -np.sin(phi), 0],
                    [np.sin(phi), np.cos(phi), 0], [0, 0, 1]])
    pred = ring @ rot.T
    remapped = adds_remap_targets(jnp.asarray(pred, dtype=jnp.float32),
                                  jnp.asarray(ring, dtype=jnp.float32),
                                  backend="xla")
    adds = np.linalg.norm(pred - np.asarray(remapped), axis=-1).mean()
    add = np.linalg.norm(pred - ring, axis=-1).mean()
    assert adds < add  # remap recognizes the symmetry
    assert adds < 1e-5  # rotation by whole spacings is an exact symmetry


def test_adds_remap_differentiable_around_pallas(rng):
    """The Pallas kernel has no VJP; adds_remap_targets must keep it out of
    the autodiff path (stop-gradient on the search inputs) so ADD-S losses
    differentiate — this is exercised here through the interpreted kernel."""
    from jax.experimental.pallas import tpu as pltpu
    pred = jnp.asarray(rng.standard_normal((1, 40, 3)), jnp.float32)
    target = jnp.asarray(rng.standard_normal((1, 30, 3)), jnp.float32)

    def loss(p):
        remapped = adds_remap_targets(p, target, backend="pallas")
        return jnp.sum((p - remapped) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss)(pred)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
