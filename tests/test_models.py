"""Model shape/behavior tests: static-shape compile checks for every network,
gradient-flow checks for the per-object head selection, pool/unpool inverses
(SURVEY.md §4, §7.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from densefusion_tpu.models import (
    DilatedResNet, PSPNet, PoseNet, PoseRefineNet, SegNet,
)
from densefusion_tpu.models.layers import (
    max_pool_argmax, max_unpool, adaptive_avg_pool2d, PReLU,
)


def test_max_pool_unpool_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), dtype=jnp.float32)
    pooled, pos = max_pool_argmax(x)
    assert pooled.shape == (2, 4, 4, 3) and pos.dtype == jnp.int8
    un = max_unpool(pooled, pos)
    assert un.shape == x.shape
    # unpooled keeps exactly the max values at their original positions
    np.testing.assert_allclose(np.asarray(un.max(axis=(1, 2))),
                               np.asarray(x.max(axis=(1, 2))), atol=0)
    # each 2x2 window has exactly one nonzero
    w = np.asarray(un).reshape(2, 4, 2, 4, 2, 3)
    assert ((w != 0).sum(axis=(2, 4)) <= 1).all()
    # and it equals the window max (sum works since each window has <=1 nonzero)
    np.testing.assert_allclose(w.sum(axis=(2, 4)), np.asarray(pooled),
                               atol=1e-7)


def test_adaptive_avg_pool_matches_mean():
    x = jnp.arange(2 * 12 * 12 * 1, dtype=jnp.float32).reshape(2, 12, 12, 1)
    p1 = adaptive_avg_pool2d(x, (1, 1))
    np.testing.assert_allclose(np.asarray(p1[..., 0, 0, 0]),
                               np.asarray(x.mean(axis=(1, 2))[:, 0]), rtol=1e-6)
    p3 = adaptive_avg_pool2d(x, (3, 3))
    assert p3.shape == (2, 3, 3, 1)
    np.testing.assert_allclose(np.asarray(p3[0, 0, 0, 0]),
                               np.asarray(x[0, :4, :4, 0].mean()), rtol=1e-6)


def test_adaptive_avg_pool_non_divisible():
    x = jnp.ones((1, 7, 5, 2))
    p = adaptive_avg_pool2d(x, (3, 2))
    assert p.shape == (1, 3, 2, 2)
    np.testing.assert_allclose(np.asarray(p), 1.0, rtol=1e-6)


def test_resnet_output_stride_8():
    model = DilatedResNet(variant="resnet18")
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.key(0), x)
    f4, f3 = model.apply(params, x)
    assert f4.shape == (1, 8, 8, 512)
    assert f3.shape == (1, 8, 8, 256)


def test_s2d_stem_exact_and_tree_identical():
    """The space-to-depth stem is the same map as the plain conv7x7/s2 stem
    (phase decomposition of the strided kernel) and reads the SAME parameter
    tree — checkpoints and the torch importer are formulation-agnostic."""
    x = jax.random.normal(jax.random.key(3), (2, 48, 48, 3))
    plain = DilatedResNet(variant="resnet18", s2d_stem=False)
    s2d = DilatedResNet(variant="resnet18", s2d_stem=True)
    params = plain.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(s2d.init(jax.random.key(0), x))
    a4, a3 = plain.apply(params, x)
    b4, b3 = s2d.apply(params, x)
    np.testing.assert_allclose(np.asarray(a4), np.asarray(b4),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a3), np.asarray(b3),
                               rtol=1e-4, atol=1e-4)


def test_pspnet_embedding_shape_and_logsoftmax():
    model = PSPNet()
    x = jnp.zeros((2, 48, 48, 3))
    params = model.init(jax.random.key(0), x)
    emb = model.apply(params, x)
    assert emb.shape == (2, 48, 48, 32)
    # log-softmax: logsumexp over channels == 0
    lse = jax.nn.logsumexp(emb, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), 0.0, atol=1e-4)


@pytest.fixture(scope="module")
def posenet_setup():
    num_obj, n_pts, hw = 5, 64, 48
    model = PoseNet(num_obj=num_obj)
    key = jax.random.key(1)
    img = jax.random.normal(key, (2, hw, hw, 3))
    pts = jax.random.normal(key, (2, n_pts, 3))
    choose = jax.random.randint(key, (2, n_pts), 0, hw * hw)
    obj = jnp.array([1, 3], dtype=jnp.int32)
    params = model.init(key, img, pts, choose, obj)
    return model, params, (img, pts, choose, obj)


def test_posenet_shapes(posenet_setup):
    model, params, (img, pts, choose, obj) = posenet_setup
    out = model.apply(params, img, pts, choose, obj)
    assert out["pred_r"].shape == (2, 64, 4)
    assert out["pred_t"].shape == (2, 64, 3)
    assert out["pred_c"].shape == (2, 64)
    assert out["emb"].shape == (2, 64, 32)
    c = np.asarray(out["pred_c"])
    assert (c > 0).all() and (c < 1).all()


@pytest.mark.slow
def test_posenet_per_object_grad_isolation(posenet_setup):
    """Gradients must flow only into the selected object's head slice —
    the batched equivalent of index_select backprop (lib/network.py:123-126)."""
    model, params, (img, pts, choose, obj) = posenet_setup

    def loss_fn(p):
        out = model.apply(p, img, pts, choose, obj)
        return jnp.sum(out["pred_r"] ** 2)

    g = jax.grad(loss_fn)(params)
    w = g["params"]["head_r"]["fc4"]["kernel"]  # (128, num_obj*4)
    w = np.asarray(w).reshape(128, 5, 4)
    sel = {int(o) for o in np.asarray(obj)}
    for o in range(5):
        nz = np.abs(w[:, o, :]).sum()
        if o in sel:
            assert nz > 0
        else:
            assert nz == 0


def test_posenet_emb_is_stop_gradiented(posenet_setup):
    model, params, (img, pts, choose, obj) = posenet_setup

    def loss_fn(p):
        out = model.apply(p, img, pts, choose, obj)
        return jnp.sum(out["emb"] ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g["params"]["cnn"])
    assert all(float(jnp.abs(l).sum()) == 0.0 for l in leaves)


def test_refiner_shapes():
    model = PoseRefineNet(num_obj=5)
    key = jax.random.key(2)
    pts = jax.random.normal(key, (3, 32, 3))
    emb = jax.random.normal(key, (3, 32, 32))
    obj = jnp.array([0, 2, 4], dtype=jnp.int32)
    params = model.init(key, pts, emb, obj)
    out = model.apply(params, pts, emb, obj)
    assert out["pred_r"].shape == (3, 4)
    assert out["pred_t"].shape == (3, 3)


@pytest.mark.slow
def test_segnet_shapes_and_train_state():
    model = SegNet(num_classes=22)
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (1, 64, 96, 22)
    # train step updates batch stats
    logits, mutated = model.apply(
        variables, jnp.ones((1, 64, 96, 3)), train=True,
        mutable=["batch_stats"])
    assert "batch_stats" in mutated


@pytest.mark.parametrize("variant,out_ch", [("resnet34", 512),
                                            ("resnet50", 2048)])
def test_resnet_variants_compile(variant, out_ch):
    """The psp_models table supports resnet18..152 (lib/network.py:19-25);
    check a BasicBlock and a Bottleneck variant beyond the default."""
    model = DilatedResNet(variant=variant)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.key(0), x)
    f4, f3 = model.apply(params, x)
    assert f4.shape == (1, 4, 4, out_ch)



def test_merged_heads_equal_separate_stacks(rng):
    """apply_head_stacks (layer-1-merged) must equal the three independent
    _HeadStack applications parameter-for-parameter."""
    import jax
    import jax.numpy as jnp
    from densefusion_tpu.models import PoseNet
    from densefusion_tpu.models.posenet import _HeadStack

    num_obj = 3
    model = PoseNet(num_obj=num_obj)
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    pts = jnp.asarray(rng.standard_normal((1, 16, 3)), jnp.float32)
    choose = jnp.zeros((1, 16), jnp.int32)
    obj = jnp.zeros((1,), jnp.int32)
    params = jax.jit(model.init)(jax.random.key(0), img, pts, choose, obj)

    feat = jnp.asarray(rng.standard_normal((2, 10, 1408)), jnp.float32)
    from densefusion_tpu.models.posenet import apply_head_stacks
    heads_params = [params["params"][n] for n in ("head_r", "head_t",
                                                  "head_c")]
    heads = [[(p[f"fc{i}"]["kernel"], p[f"fc{i}"]["bias"])
              for i in range(1, 5)] for p in heads_params]
    rx, tx, cx = apply_head_stacks(feat, heads, num_obj, (4, 3, 1))

    for got, name, out_dim in ((rx, "head_r", 4), (tx, "head_t", 3),
                               (cx, "head_c", 1)):
        want = _HeadStack(num_obj, out_dim).apply(
            {"params": params["params"][name]}, feat)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_posenet_remat_cnn_identical(posenet_setup):
    """remat_cnn=True must be a pure autodiff-schedule change: same parameter
    tree, same outputs, same gradients (jax.checkpoint semantics)."""
    model, params, (img, pts, choose, obj) = posenet_setup
    rm = PoseNet(num_obj=5, remat_cnn=True)
    # identical parameter tree -> checkpoints interchangeable
    rm_params = rm.init(jax.random.key(1), img, pts, choose, obj)
    assert (jax.tree_util.tree_structure(rm_params)
            == jax.tree_util.tree_structure(params))

    out_a = model.apply(params, img, pts, choose, obj)
    out_b = rm.apply(params, img, pts, choose, obj)
    np.testing.assert_allclose(np.asarray(out_b["pred_r"]),
                               np.asarray(out_a["pred_r"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_b["pred_c"]),
                               np.asarray(out_a["pred_c"]), atol=1e-6)

    def loss(mdl):
        def f(p):
            o = mdl.apply(p, img, pts, choose, obj)
            return (jnp.sum(o["pred_r"] ** 2) + jnp.sum(o["pred_t"] ** 2)
                    + jnp.sum(o["pred_c"]))
        return f

    g_a = jax.jit(jax.grad(loss(model)))(params)
    g_b = jax.jit(jax.grad(loss(rm)))(params)
    for a, b in zip(jax.tree.leaves(g_a), jax.tree.leaves(g_b)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
