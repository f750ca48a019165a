"""bf16 compute-path tests: outputs stay f32, results close to the f32 path,
gradients still flow (params are f32 master copies)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from densefusion_tpu.models import PoseNet, PoseRefineNet


@pytest.fixture(scope="module")
def inputs():
    key = jax.random.key(0)
    img = jax.random.normal(key, (2, 48, 48, 3))
    pts = jax.random.normal(key, (2, 32, 3)) * 0.05
    choose = jax.random.randint(key, (2, 32), 0, 48 * 48)
    obj = jnp.array([0, 1], dtype=jnp.int32)
    return img, pts, choose, obj


@pytest.mark.slow
def test_bf16_posenet_close_to_f32(inputs):
    img, pts, choose, obj = inputs
    m32 = PoseNet(num_obj=2)
    mbf = PoseNet(num_obj=2, dtype=jnp.bfloat16)
    params = m32.init(jax.random.key(1), img, pts, choose, obj)
    o32 = m32.apply(params, img, pts, choose, obj)
    obf = mbf.apply(params, img, pts, choose, obj)  # same f32 params
    for k in ("pred_r", "pred_t", "pred_c"):
        assert obf[k].dtype == jnp.float32
        a, b = np.asarray(o32[k]), np.asarray(obf[k])
        # bf16 has ~3 decimal digits; a deep net amplifies that
        assert np.abs(a - b).max() < 0.5
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.98


@pytest.mark.slow
def test_bf16_gradients_are_f32_and_nonzero(inputs):
    img, pts, choose, obj = inputs
    mbf = PoseNet(num_obj=2, dtype=jnp.bfloat16)
    params = mbf.init(jax.random.key(1), img, pts, choose, obj)

    def loss(p):
        out = mbf.apply(p, img, pts, choose, obj)
        return jnp.sum(out["pred_r"] ** 2) + jnp.sum(out["pred_t"] ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_bf16_refiner(inputs):
    img, pts, choose, obj = inputs
    refiner = PoseRefineNet(num_obj=2, dtype=jnp.bfloat16)
    emb = jax.random.normal(jax.random.key(2), (2, 32, 32))
    params = refiner.init(jax.random.key(3), pts, emb, obj)
    out = refiner.apply(params, pts, emb, obj)
    assert out["pred_r"].dtype == jnp.float32
    assert out["pred_t"].shape == (2, 3)
