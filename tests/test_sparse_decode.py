"""Sparse-decode exactness: the sample_at path of PSPNet must equal the dense
decode + gather bit-for-bit-ish (same params, same math, different order of
operations), including crop edges; PoseNet sparse_emb parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from densefusion_tpu.models import PSPNet, PoseNet
from densefusion_tpu.models.pspnet import sparse_upsample_taps
from densefusion_tpu.models.layers import resize_bilinear


def test_sparse_upsample_taps_match_dense(rng):
    x = jnp.asarray(rng.standard_normal((2, 6, 7, 5)), jnp.float32)
    up = resize_bilinear(x, (12, 14))
    up_pad = jnp.pad(up, [(0, 0), (1, 1), (1, 1), (0, 0)])
    # probe every pixel including corners/edges
    coords = [(0, 0), (0, 13), (11, 0), (11, 13), (5, 6), (1, 2), (10, 12)]
    rows = jnp.array([[r for r, _ in coords]] * 2)
    cols = jnp.array([[c for _, c in coords]] * 2)
    taps = sparse_upsample_taps(x, rows, cols)
    for b in range(2):
        for k, (r, c) in enumerate(coords):
            want = up_pad[b, r:r + 3, c:c + 3, :]
            np.testing.assert_allclose(np.asarray(taps[b, k]),
                                       np.asarray(want), atol=1e-5,
                                       err_msg=f"pixel {(r, c)}")


@pytest.fixture(scope="module")
def psp_setup():
    model_dense = PSPNet()
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 48, 48, 3))
    choose = jax.random.randint(jax.random.key(1), (2, 40), 0, 48 * 48)
    params = model_dense.init(key, x)
    return model_dense, params, x, choose


def test_pspnet_sparse_equals_dense_gather(psp_setup):
    model, params, x, choose = psp_setup
    dense = model.apply(params, x)
    flat = dense.reshape(2, 48 * 48, 32)
    gathered = jnp.take_along_axis(flat, choose[..., None], axis=1)
    sparse = model.apply(params, x, sample_at=choose)
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(gathered),
                               atol=2e-5)


def test_posenet_sparse_equals_dense(psp_setup):
    key = jax.random.key(2)
    img = jax.random.normal(key, (2, 48, 48, 3))
    pts = jax.random.normal(key, (2, 32, 3)) * 0.05
    choose = jax.random.randint(key, (2, 32), 0, 48 * 48)
    obj = jnp.array([0, 1], dtype=jnp.int32)
    dense_model = PoseNet(num_obj=2, sparse_emb=False)
    sparse_model = PoseNet(num_obj=2, sparse_emb=True)
    params = dense_model.init(key, img, pts, choose, obj)
    out_d = dense_model.apply(params, img, pts, choose, obj)
    out_s = sparse_model.apply(params, img, pts, choose, obj)
    for k in ("pred_r", "pred_t", "pred_c", "emb"):
        np.testing.assert_allclose(np.asarray(out_s[k]), np.asarray(out_d[k]),
                                   atol=3e-4,
                                   err_msg=k)


@pytest.mark.slow
def test_sparse_gradients_flow(psp_setup):
    model, params, x, choose = psp_setup
    # the final projection is zero-init (uniform log-softmax start), which
    # blocks upstream gradients at exactly init — perturb it first
    params = jax.tree_util.tree_map_with_path(
        lambda path, v: jax.random.normal(jax.random.key(9), v.shape) * 0.1
        if any(getattr(k, "key", None) == "final" for k in path) else v,
        params)

    def loss(p):
        return jnp.sum(model.apply(p, x, sample_at=choose) ** 2)

    g = jax.grad(loss)(params)
    # gradients reach the trunk through the sparse gather
    leaves = jax.tree.leaves(g["params"]["trunk"])
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_phase_upsample_conv_exact_both_borders(rng):
    """phase_upsample_conv3x3 == resize2x + pad + VALID conv3x3, for both
    zero (torch-style, with boundary corrections) and replicate (native
    phase semantics) padding, including all border pixels."""
    import jax
    from densefusion_tpu.models.layers import (
        phase_upsample_conv3x3, resize_bilinear,
    )
    for (h, w, cin, cout) in [(5, 7, 4, 3), (1, 3, 2, 2)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
        for border, mode in (("zero", "constant"), ("replicate", "edge")):
            up = jnp.pad(resize_bilinear(x, (2 * h, 2 * w)),
                         [(0, 0), (1, 1), (1, 1), (0, 0)], mode=mode)
            dense = jax.lax.conv_general_dilated(
                up, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            fused = phase_upsample_conv3x3(x, k, b, border=border)
            np.testing.assert_allclose(np.asarray(fused), np.asarray(dense),
                                       atol=5e-5, err_msg=border)
