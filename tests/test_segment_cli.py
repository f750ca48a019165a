"""segment CLI smoke test: train-free SegNet checkpoint -> label PNGs in the
segnet_results naming that LineMOD eval mode consumes."""

import glob
import os

import numpy as np
import jax
import pytest
from flax import serialization
from PIL import Image

from densefusion_tpu.models import SegNet
from densefusion_tpu.cli import segment as segment_cli


def test_segment_cli_writes_masks(tmp_path):
    img_dir = tmp_path / "rgb"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)
        ).save(img_dir / f"{i:04d}.png")

    segnet = SegNet(num_classes=4)
    sample = np.zeros((1, 64, 96, 3), np.float32)
    variables = segnet.init(jax.random.key(0), sample, train=False)
    ckpt = tmp_path / "segnet.msgpack"
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})})))

    out_dir = tmp_path / "labels"
    segment_cli.main([
        "--checkpoint", str(ckpt),
        "--images", str(img_dir / "*.png"),
        "--out_dir", str(out_dir),
        "--num_classes", "4", "--binary_class", "1", "--batch_size", "2",
    ])
    outs = sorted(glob.glob(str(out_dir / "*_label.png")))
    assert len(outs) == 3
    lab = np.array(Image.open(outs[0]))
    assert lab.shape == (64, 96)
    assert set(np.unique(lab)) <= {0, 255}

    # --list filters to the named frame ids (plain and %04d forms)
    list_file = tmp_path / "test.txt"
    list_file.write_text("1\n0002\n")
    out2 = tmp_path / "labels2"
    segment_cli.main([
        "--checkpoint", str(ckpt),
        "--images", str(img_dir / "*.png"),
        "--list", str(list_file),
        "--out_dir", str(out2),
        "--num_classes", "4", "--binary_class", "1", "--batch_size", "2",
    ])
    names = sorted(os.path.basename(p) for p in glob.glob(str(out2 / "*")))
    assert names == ["0001_label.png", "0002_label.png"]


def test_segment_cli_class_vs_bg(tmp_path):
    """--class_vs_bg masks where the class logit beats background's — a
    superset of the argmax mask (pixels a third class's logit would steal
    are kept; the sequence's object identity is the query)."""
    img_dir = tmp_path / "rgb"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    Image.fromarray(
        rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)
    ).save(img_dir / "0000.png")

    segnet = SegNet(num_classes=4)
    sample = np.zeros((1, 64, 96, 3), np.float32)
    variables = segnet.init(jax.random.key(2), sample, train=False)
    ckpt = tmp_path / "segnet.msgpack"
    with open(ckpt, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})})))

    outs = {}
    for mode, flags in (("argmax", []), ("vs_bg", ["--class_vs_bg"])):
        out_dir = tmp_path / mode
        segment_cli.main([
            "--checkpoint", str(ckpt),
            "--images", str(img_dir / "*.png"),
            "--out_dir", str(out_dir),
            "--num_classes", "4", "--binary_class", "1",
        ] + flags)
        outs[mode] = np.array(Image.open(out_dir / "0000_label.png"))

    for lab in outs.values():
        assert set(np.unique(lab)) <= {0, 255}
    # vs_bg is a superset of the argmax mask (argmax==1 implies
    # logit1 > logit0)
    assert np.all(outs["vs_bg"][outs["argmax"] == 255] == 255)

    # exactness on a reference forward pass
    import jax.numpy as jnp
    from densefusion_tpu.data.schema import normalize_image
    x = normalize_image(np.array(Image.open(img_dir / "0000.png")))[None]
    logits = segnet.apply(variables, jnp.asarray(x), train=False)
    expect = np.asarray(logits[0, ..., 1] > logits[0, ..., 0])
    np.testing.assert_array_equal(outs["vs_bg"] == 255, expect)
