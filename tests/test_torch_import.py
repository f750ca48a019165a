"""Torch ``.pth`` -> flax importer tests.

Synthetic state_dicts shaped exactly like the reference models
(``lib/network.py:70-206`` / ``lib/pspnet.py:40-77`` / ``lib/extractors.py``)
round-trip through the importer; the CNN-free parts (fusion pyramids + heads,
i.e. the whole refiner) are checked NUMERICALLY against an independent
functional torch forward pass, proving every layout transpose."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from densefusion_tpu.compat import (  # noqa: E402
    posenet_params_from_torch, refiner_params_from_torch,
    import_torch_checkpoint,
)

NUM_OBJ = 3
EMB = 32


def _t(*shape, gen):
    return torch.from_numpy(gen.standard_normal(shape).astype(np.float32))


def _conv_entries(sd, key, cout, cin, k, gen, bias=True):
    sd[f"{key}.weight"] = _t(cout, cin, k, k, gen=gen)
    if bias:
        sd[f"{key}.bias"] = _t(cout, gen=gen)


def make_posenet_state_dict(gen) -> dict:
    """Reference ``PoseNet(num_points, num_obj=3).state_dict()`` shapes,
    resnet18 backend (psp_size 512), built from the documented architecture —
    not from reference code."""
    sd = {}
    p = "cnn.model.module."
    # trunk (lib/extractors.py resnet18: layers [2,2,2,2], dilated 3/4)
    sd[p + "feats.conv1.weight"] = _t(64, 3, 7, 7, gen=gen)
    chans = [64, 64, 128, 256, 512]
    for layer in range(1, 5):
        cin, cout = chans[layer - 1], chans[layer]
        for b in range(2):
            base = f"{p}feats.layer{layer}.{b}"
            c0 = cin if b == 0 else cout
            sd[f"{base}.conv1.weight"] = _t(cout, c0, 3, 3, gen=gen)
            sd[f"{base}.conv2.weight"] = _t(cout, cout, 3, 3, gen=gen)
            if b == 0 and (cin != cout or layer == 2):
                sd[f"{base}.downsample.0.weight"] = _t(cout, cin, 1, 1,
                                                       gen=gen)
    # psp module (lib/pspnet.py:7-24), psp_size=512
    for i in range(4):
        sd[f"{p}psp.stages.{i}.1.weight"] = _t(512, 512, 1, 1, gen=gen)
    _conv_entries(sd, p + "psp.bottleneck", 1024, 512 * 5, 1, gen)
    # decoder (lib/pspnet.py:27-37,46-56)
    for name, cin, cout in (("up_1", 1024, 256), ("up_2", 256, 64),
                            ("up_3", 64, 64)):
        sd[f"{p}{name}.conv.1.weight"] = _t(cout, cin, 3, 3, gen=gen)
        sd[f"{p}{name}.conv.1.bias"] = _t(cout, gen=gen)
        sd[f"{p}{name}.conv.2.weight"] = _t(1, gen=gen)  # PReLU
    _conv_entries(sd, p + "final.0", EMB, 64, 1, gen)
    # unused aux classifier (lib/pspnet.py:58-62), deep_features_size=256
    sd[p + "classifier.0.weight"] = _t(256, 256, gen=gen)
    sd[p + "classifier.0.bias"] = _t(256, gen=gen)
    sd[p + "classifier.2.weight"] = _t(21, 256, gen=gen)
    sd[p + "classifier.2.bias"] = _t(21, gen=gen)
    # fusion (lib/network.py:39-68)
    for key, cout, cin in (("feat.conv1", 64, 3), ("feat.conv2", 128, 64),
                           ("feat.e_conv1", 64, EMB),
                           ("feat.e_conv2", 128, 64),
                           ("feat.conv5", 512, 256),
                           ("feat.conv6", 1024, 512)):
        sd[f"{key}.weight"] = _t(cout, cin, 1, gen=gen)
        sd[f"{key}.bias"] = _t(cout, gen=gen)
    # heads (lib/network.py:77-91)
    dims = {"r": 4, "t": 3, "c": 1}
    widths = [1408, 640, 256, 128]
    for letter, d in dims.items():
        for i in range(1, 4):
            sd[f"conv{i}_{letter}.weight"] = _t(widths[i], widths[i - 1], 1,
                                                gen=gen)
            sd[f"conv{i}_{letter}.bias"] = _t(widths[i], gen=gen)
        sd[f"conv4_{letter}.weight"] = _t(NUM_OBJ * d, 128, 1, gen=gen)
        sd[f"conv4_{letter}.bias"] = _t(NUM_OBJ * d, gen=gen)
    return sd


def make_refiner_state_dict(gen) -> dict:
    """Reference ``PoseRefineNet.state_dict()`` shapes
    (``lib/network.py:136-187``): conv5 takes the 384-d level concat."""
    sd = {}
    for key, cout, cin in (("feat.conv1", 64, 3), ("feat.conv2", 128, 64),
                           ("feat.e_conv1", 64, EMB),
                           ("feat.e_conv2", 128, 64),
                           ("feat.conv5", 512, 384),
                           ("feat.conv6", 1024, 512)):
        sd[f"{key}.weight"] = _t(cout, cin, 1, gen=gen)
        sd[f"{key}.bias"] = _t(cout, gen=gen)
    dims = {"r": 4, "t": 3}
    widths = [1024, 512, 128]
    for letter, d in dims.items():
        for i in range(1, 3):
            sd[f"conv{i}_{letter}.weight"] = _t(widths[i], widths[i - 1],
                                                gen=gen)
            sd[f"conv{i}_{letter}.bias"] = _t(widths[i], gen=gen)
        sd[f"conv3_{letter}.weight"] = _t(NUM_OBJ * d, 128, gen=gen)
        sd[f"conv3_{letter}.bias"] = _t(NUM_OBJ * d, gen=gen)
    return sd


def _c1d(sd, key, x):
    """Functional torch Conv1d(k=1): x (B, C, N)."""
    return F.conv1d(x, sd[f"{key}.weight"], sd[f"{key}.bias"])


@pytest.mark.slow
def test_posenet_import_structural(rng):
    """Every flax leaf filled from the right-shaped torch tensor; every torch
    key consumed except the dead aux classifier."""
    sd = {k: v.numpy() for k, v in make_posenet_state_dict(rng).items()}
    params = posenet_params_from_torch(sd, num_obj=NUM_OBJ)
    # spot-check two transposes
    np.testing.assert_allclose(
        np.asarray(params["params"]["cnn"]["trunk"]["stem"]["kernel"]),
        sd["cnn.model.module.feats.conv1.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(params["params"]["fusion"]["mix2"]["kernel"]),
        sd["feat.conv6.weight"][:, :, 0].T)
    # wrong-shape tensor must be rejected
    bad = dict(sd)
    bad["conv4_r.weight"] = sd["conv4_r.weight"][:, :64]
    with pytest.raises(ValueError, match="shape mismatch"):
        posenet_params_from_torch(bad, num_obj=NUM_OBJ)
    # leftover unknown key must be rejected
    extra = dict(sd)
    extra["surprise.weight"] = sd["conv4_r.bias"]
    with pytest.raises(ValueError, match="unconsumed"):
        posenet_params_from_torch(extra, num_obj=NUM_OBJ)


def test_posenet_fusion_heads_numerical(rng):
    """DenseFusionFeat + head stacks with imported weights reproduce a
    functional torch forward of the reference fusion/head math exactly."""
    from densefusion_tpu.models.posenet import DenseFusionFeat, _HeadStack

    sd_t = make_posenet_state_dict(rng)
    sd = {k: v.numpy() for k, v in sd_t.items()}
    params = posenet_params_from_torch(sd, num_obj=NUM_OBJ)

    n = 16
    pts = rng.standard_normal((1, n, 3)).astype(np.float32)
    emb = rng.standard_normal((1, n, EMB)).astype(np.float32)

    # torch reference forward (lib/network.py:53-68 semantics)
    x = torch.from_numpy(pts.transpose(0, 2, 1))
    e = torch.from_numpy(emb.transpose(0, 2, 1))
    g1 = F.relu(_c1d(sd_t, "feat.conv1", x))
    c1 = F.relu(_c1d(sd_t, "feat.e_conv1", e))
    f1 = torch.cat((g1, c1), dim=1)
    g2 = F.relu(_c1d(sd_t, "feat.conv2", g1))
    c2 = F.relu(_c1d(sd_t, "feat.e_conv2", c1))
    f2 = torch.cat((g2, c2), dim=1)
    mx = F.relu(_c1d(sd_t, "feat.conv5", f2))
    mx = F.relu(_c1d(sd_t, "feat.conv6", mx))
    ap = mx.mean(dim=2, keepdim=True).repeat(1, 1, n)
    ref_feat = torch.cat([f1, f2, ap], dim=1)          # (1, 1408, N)

    got_feat = DenseFusionFeat().apply(
        {"params": params["params"]["fusion"]}, jnp.asarray(pts),
        jnp.asarray(emb))
    np.testing.assert_allclose(np.asarray(got_feat),
                               ref_feat.numpy().transpose(0, 2, 1),
                               rtol=1e-4, atol=1e-4)

    # head stack r (conv1_r..conv4_r), viewed (num_obj, 4) like network.py:118
    hx = ref_feat
    for i in range(1, 4):
        hx = F.relu(_c1d(sd_t, f"conv{i}_r", hx))
    hx = _c1d(sd_t, "conv4_r", hx)                     # (1, num_obj*4, N)
    ref_rx = hx.numpy().reshape(1, NUM_OBJ, 4, n).transpose(0, 3, 1, 2)

    got_rx = _HeadStack(NUM_OBJ, 4).apply(
        {"params": params["params"]["head_r"]}, got_feat)
    np.testing.assert_allclose(np.asarray(got_rx), ref_rx,
                               rtol=2e-4, atol=2e-4)


def test_refiner_import_numerical(rng):
    """The FULL PoseRefineNet (no CNN inside) matches a functional torch
    forward end to end, including per-object head selection."""
    from densefusion_tpu.models import PoseRefineNet

    sd_t = make_refiner_state_dict(rng)
    sd = {k: v.numpy() for k, v in sd_t.items()}
    params = refiner_params_from_torch(sd, num_obj=NUM_OBJ)

    n, obj = 24, 2
    pts = rng.standard_normal((1, n, 3)).astype(np.float32)
    emb = rng.standard_normal((1, n, EMB)).astype(np.float32)

    # torch reference forward (lib/network.py:147-206 semantics)
    x = torch.from_numpy(pts.transpose(0, 2, 1))
    e = torch.from_numpy(emb.transpose(0, 2, 1))
    g1 = F.relu(_c1d(sd_t, "feat.conv1", x))
    c1 = F.relu(_c1d(sd_t, "feat.e_conv1", e))
    f1 = torch.cat([g1, c1], dim=1)
    g2 = F.relu(_c1d(sd_t, "feat.conv2", g1))
    c2 = F.relu(_c1d(sd_t, "feat.e_conv2", c1))
    f2 = torch.cat([g2, c2], dim=1)
    f3 = torch.cat([f1, f2], dim=1)                    # (1, 384, N)
    mx = F.relu(_c1d(sd_t, "feat.conv5", f3))
    mx = F.relu(_c1d(sd_t, "feat.conv6", mx))
    ap = mx.mean(dim=2)                                # (1, 1024)
    rx, tx = ap, ap
    for i in range(1, 3):
        rx = F.relu(F.linear(rx, sd_t[f"conv{i}_r.weight"],
                             sd_t[f"conv{i}_r.bias"]))
        tx = F.relu(F.linear(tx, sd_t[f"conv{i}_t.weight"],
                             sd_t[f"conv{i}_t.bias"]))
    rx = F.linear(rx, sd_t["conv3_r.weight"], sd_t["conv3_r.bias"])
    tx = F.linear(tx, sd_t["conv3_t.weight"], sd_t["conv3_t.bias"])
    ref_r = rx.numpy().reshape(NUM_OBJ, 4)[obj]
    ref_t = tx.numpy().reshape(NUM_OBJ, 3)[obj]

    out = PoseRefineNet(num_obj=NUM_OBJ).apply(
        params, jnp.asarray(pts), jnp.asarray(emb),
        jnp.asarray([obj], jnp.int32))
    np.testing.assert_allclose(np.asarray(out["pred_r"])[0], ref_r,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["pred_t"])[0], ref_t,
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_import_checkpoint_end_to_end(tmp_path, rng):
    """.pth files -> framework checkpoint -> loadable + runnable via the
    standard InferencePipeline path (the cli.import_torch flow)."""
    pose_pth = str(tmp_path / "pose.pth")
    refine_pth = str(tmp_path / "refine.pth")
    torch.save(make_posenet_state_dict(rng), pose_pth)
    torch.save(make_refiner_state_dict(rng), refine_pth)

    out = str(tmp_path / "imported")
    import_torch_checkpoint(pose_pth, out, num_obj=NUM_OBJ,
                            refine_pth=refine_pth, dataset="ycb",
                            num_points=32, crop_size=64)

    from densefusion_tpu.data import collate
    from densefusion_tpu.data.schema import PoseSample
    from densefusion_tpu.models import PoseNet, PoseRefineNet
    from densefusion_tpu.train import create_train_state, load_checkpoint
    from densefusion_tpu.train.checkpoint import peek_curriculum
    from densefusion_tpu.eval import InferencePipeline
    from densefusion_tpu.utils.config import RunConfig

    assert peek_curriculum(out).refine_started

    posenet, refiner = PoseNet(num_obj=NUM_OBJ), PoseRefineNet(num_obj=NUM_OBJ)
    cfg = RunConfig.preset("ycb", num_points=32, crop_size=64)
    batch = collate([PoseSample.invalid(32, 16, 64)])
    state = create_train_state(posenet, refiner, cfg, jax.random.key(1),
                               batch)
    state, cur, _ = load_checkpoint(out, state, restore_opt=False)
    np.testing.assert_allclose(
        np.asarray(state.params_pose["params"]["fusion"]["geo1"]["bias"]),
        load_pth_bias(pose_pth))

    pipe = InferencePipeline(posenet, refiner, refine_iters=2)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    pts = jnp.asarray(rng.standard_normal((1, 32, 3)), jnp.float32)
    choose = jnp.zeros((1, 32), jnp.int32)
    q, t, c = pipe(state.params_pose, state.params_refine, img, pts,
                   choose, jnp.zeros((1,), jnp.int32))
    assert np.isfinite(np.asarray(q)).all()


def load_pth_bias(path):
    sd = torch.load(path, map_location="cpu")
    return sd["feat.conv1.bias"].numpy()


# ---------------------------------------------------------------------------
# Export (flax -> torch) round trips
# ---------------------------------------------------------------------------

def test_refiner_export_roundtrip(rng):
    """export(import(sd)) == sd for the refiner (bit-exact both ways)."""
    from densefusion_tpu.compat import refiner_state_dict_from_params

    sd = {k: v.numpy() for k, v in make_refiner_state_dict(rng).items()}
    params = refiner_params_from_torch(sd, num_obj=NUM_OBJ)
    back = refiner_state_dict_from_params(params)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)

    # and import(export(params)) == params
    again = refiner_params_from_torch(back, num_obj=NUM_OBJ)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(again)[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_posenet_export_roundtrip(rng):
    """PoseNet export reproduces every torch tensor except the dead aux
    classifier (which the importer ignores and the exporter doesn't emit)."""
    from densefusion_tpu.compat import posenet_state_dict_from_params

    sd = {k: v.numpy() for k, v in make_posenet_state_dict(rng).items()}
    params = posenet_params_from_torch(sd, num_obj=NUM_OBJ)
    back = posenet_state_dict_from_params(params)
    classifier = {k for k in sd if ".classifier." in k}
    assert set(back) == set(sd) - classifier
    for k in back:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


@pytest.mark.slow
def test_export_checkpoint_cli(tmp_path, rng):
    """Framework checkpoint -> cli.export_torch -> .pth files that re-import
    to the identical parameters (full circle through both CLIs' cores)."""
    from densefusion_tpu.cli.export_torch import main as export_main
    from densefusion_tpu.data import collate
    from densefusion_tpu.data.schema import PoseSample
    from densefusion_tpu.models import PoseNet, PoseRefineNet
    from densefusion_tpu.train import create_train_state, save_checkpoint
    from densefusion_tpu.train.state import Curriculum
    from densefusion_tpu.utils.config import RunConfig

    cfg = RunConfig.preset("ycb", num_points=32, crop_size=64,
                           num_objects=NUM_OBJ)
    posenet = PoseNet(num_obj=NUM_OBJ)
    refiner = PoseRefineNet(num_obj=NUM_OBJ)
    batch = collate([PoseSample.invalid(32, cfg.num_mesh_points, 64)])
    state = create_train_state(posenet, refiner, cfg, jax.random.key(7),
                               batch)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, Curriculum(), cfg)

    pose_pth = str(tmp_path / "pose.pth")
    refine_pth = str(tmp_path / "refine.pth")
    export_main(["--checkpoint", ckpt, "--pose_out", pose_pth,
                 "--refine_out", refine_pth])

    sd = {k: v.numpy() for k, v in
          torch.load(pose_pth, map_location="cpu").items()}
    re_pose = posenet_params_from_torch(sd, num_obj=NUM_OBJ)
    want = jax.device_get(state.params_pose)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(want)[0],
            jax.tree_util.tree_flatten_with_path(re_pose)[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))
    sd_r = {k: v.numpy() for k, v in
            torch.load(refine_pth, map_location="cpu").items()}
    re_ref = refiner_params_from_torch(sd_r, num_obj=NUM_OBJ)
    want_r = jax.device_get(state.params_refine)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(want_r)[0],
            jax.tree_util.tree_flatten_with_path(re_ref)[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# SegNet (vanilla_segmentation/segnet.py:6-121)
# ---------------------------------------------------------------------------

SEG_ENC = (2, 2, 3, 3, 3)          # convs per VGG16 pooling stage
SEG_CLASSES = 5


def make_segnet_state_dict(gen, num_classes=SEG_CLASSES,
                           tracked=True) -> dict:
    """Reference ``SegNet.state_dict()`` shapes built from the documented
    architecture (13 conv+BN per side + final classifier). ``tracked=True``
    adds the ``num_batches_tracked`` entries a modern-torch save carries."""
    enc_ch = [(3, 64), (64, 128), (128, 256), (256, 512), (512, 512)]
    sd = {}

    def add(conv, bn, cin, cout):
        # he-ish scaling keeps activations O(1) through 26 layers so the
        # numerical-parity comparison isn't swamped by compounding float
        # error on astronomically scaled values
        sd[f"{conv}.weight"] = _t(cout, cin, 3, 3, gen=gen) / np.sqrt(
            9.0 * cin)
        sd[f"{conv}.bias"] = _t(cout, gen=gen)
        sd[f"{bn}.weight"] = _t(cout, gen=gen)
        sd[f"{bn}.bias"] = _t(cout, gen=gen)
        sd[f"{bn}.running_mean"] = _t(cout, gen=gen)
        sd[f"{bn}.running_var"] = torch.from_numpy(
            np.abs(gen.standard_normal(cout).astype(np.float32)) + 0.5)
        if tracked:
            sd[f"{bn}.num_batches_tracked"] = torch.tensor(7)

    for s, (cin, cout) in enumerate(enc_ch, start=1):
        for i in range(1, SEG_ENC[s - 1] + 1):
            add(f"conv{s}{i}", f"bn{s}{i}", cin if i == 1 else cout, cout)
    # decoder: stage s applies conv{s}{n}d..conv{s}1d; last conv of each
    # stage steps down to the previous stage's width; conv11d = classifier
    dec_ch = {5: [(512, 512)] * 3,
              4: [(512, 512), (512, 512), (512, 256)],
              3: [(256, 256), (256, 256), (256, 128)],
              2: [(128, 128), (128, 64)],
              1: [(64, 64)]}
    for s in range(5, 0, -1):
        n = SEG_ENC[s - 1]
        for k, (cin, cout) in enumerate(dec_ch[s]):
            j = n - k       # descending torch index: conv{s}{n}d first
            add(f"conv{s}{j}d", f"bn{s}{j}d", cin, cout)
    sd["conv11d.weight"] = _t(num_classes, 64, 3, 3, gen=gen) / 24.0
    sd["conv11d.bias"] = _t(num_classes, gen=gen)
    return sd


def _torch_segnet_forward(sd, x):
    """Independent functional forward of the reference SegNet (eval mode)."""
    def cbr(x, conv, bn, relu=True):
        x = F.conv2d(x, sd[f"{conv}.weight"], sd[f"{conv}.bias"], padding=1)
        x = F.batch_norm(x, sd[f"{bn}.running_mean"],
                         sd[f"{bn}.running_var"], sd[f"{bn}.weight"],
                         sd[f"{bn}.bias"], training=False)
        return F.relu(x) if relu else x

    ids = []
    for s in range(1, 6):
        for i in range(1, SEG_ENC[s - 1] + 1):
            x = cbr(x, f"conv{s}{i}", f"bn{s}{i}")
        x, idx = F.max_pool2d(x, 2, 2, return_indices=True)
        ids.append(idx)
    for s in range(5, 0, -1):
        x = F.max_unpool2d(x, ids[s - 1], 2, 2)
        n = SEG_ENC[s - 1]
        lo = 2 if s == 1 else 1     # conv11d is the classifier, applied last
        for j in range(n, lo - 1, -1):
            x = cbr(x, f"conv{s}{j}d", f"bn{s}{j}d")
    return F.conv2d(x, sd["conv11d.weight"], sd["conv11d.bias"], padding=1)


@pytest.mark.slow
def test_segnet_import_numerical(rng):
    """Whole-network activation parity: flax SegNet with imported weights ==
    an independent functional torch forward of the reference architecture
    (eval mode, running BN stats), including the pool/unpool index plumbing."""
    from densefusion_tpu.compat import segnet_variables_from_torch
    from densefusion_tpu.models import SegNet

    sd_t = make_segnet_state_dict(rng)
    sd = {k: v.numpy() for k, v in sd_t.items()}
    variables = segnet_variables_from_torch(sd, num_classes=SEG_CLASSES)

    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ours = SegNet(num_classes=SEG_CLASSES).apply(
        variables, jnp.asarray(x), train=False)
    theirs = _torch_segnet_forward(
        sd_t, torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(
        np.asarray(ours), np.transpose(theirs.numpy(), (0, 2, 3, 1)),
        rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_segnet_export_roundtrip(rng):
    """export(import(sd)) == sd bit-exactly (params AND running stats);
    num_batches_tracked is tolerated on import, not re-emitted."""
    from densefusion_tpu.compat import (
        segnet_state_dict_from_variables, segnet_variables_from_torch,
    )

    sd = {k: v.numpy() for k, v in make_segnet_state_dict(rng).items()}
    variables = segnet_variables_from_torch(sd, num_classes=SEG_CLASSES)
    back = segnet_state_dict_from_variables(variables)
    tracked = {k for k in sd if k.endswith("num_batches_tracked")}
    assert set(back) == set(sd) - tracked
    for k in back:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


@pytest.mark.slow
def test_segnet_import_cli_and_segment(tmp_path, rng):
    """cli.import_torch --segnet_model writes a msgpack that cli.segment can
    run (masks from reference-trained weights); cli.export_torch inverts it."""
    from PIL import Image
    from densefusion_tpu.cli.export_torch import main as export_main
    from densefusion_tpu.cli.import_torch import main as import_main
    from densefusion_tpu.cli.segment import main as segment_main

    pth = str(tmp_path / "segnet.pth")
    torch.save(make_segnet_state_dict(rng), pth)
    msgpack = str(tmp_path / "segnet_best.msgpack")
    import_main(["--segnet_model", pth, "--num_classes", str(SEG_CLASSES),
                 "--out", msgpack])

    img_dir = tmp_path / "rgb"
    img_dir.mkdir()
    im = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    Image.fromarray(im).save(img_dir / "0000.png")
    out_dir = str(tmp_path / "masks")
    segment_main(["--checkpoint", msgpack, "--images",
                  str(img_dir / "*.png"), "--out_dir", out_dir,
                  "--num_classes", str(SEG_CLASSES), "--binary_class", "1"])
    import os
    assert os.path.exists(os.path.join(out_dir, "0000_label.png"))

    back_pth = str(tmp_path / "back.pth")
    export_main(["--segnet_ckpt", msgpack, "--segnet_out", back_pth,
                 "--num_classes", str(SEG_CLASSES)])
    orig = {k: v.numpy() for k, v in make_segnet_state_dict(rng).items()}
    back = {k: v.numpy() for k, v in
            torch.load(back_pth, map_location="cpu").items()}
    want = {k: v.numpy() for k, v in
            torch.load(pth, map_location="cpu").items()
            if not k.endswith("num_batches_tracked")}
    assert set(back) == set(want)
    for k in back:
        np.testing.assert_array_equal(back[k], want[k], err_msg=k)
