"""eval_cad CLI smoke: synthetic Unity-format dataset -> success rate + PLY
visual-QA dumps (tools/eval_cad.py parity)."""

import os

import jax
import pytest

from densefusion_tpu.data import CADDataset, collate
from densefusion_tpu.data.synthetic import generate_cad_style_dataset
from densefusion_tpu.models import PoseNet, PoseRefineNet
from densefusion_tpu.train import create_train_state, save_checkpoint
from densefusion_tpu.train.state import Curriculum
from densefusion_tpu.utils.config import RunConfig
from densefusion_tpu.cli import eval_cad as eval_cad_cli

DIMS = (260, 554)


@pytest.mark.slow
def test_eval_cad_cli(tmp_path, monkeypatch):
    root = str(tmp_path / "cad")
    generate_cad_style_dataset(root, n_train=2, n_test=20, img_h=DIMS[0],
                               img_w=DIMS[1], seed=2)

    ds = CADDataset(root, mode="test", num_points=64, crop_size=64,
                    num_mesh_points=64, image_dims=DIMS)
    batch = collate([ds[0]])
    posenet, refiner = PoseNet(num_obj=1), PoseRefineNet(num_obj=1)
    cfg = RunConfig.preset("cad", num_points=64, crop_size=64)
    state = create_train_state(posenet, refiner, cfg, jax.random.key(0),
                               batch)
    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, Curriculum(), cfg)

    # the CLI builds CADDataset with default image_dims; pin the fixture's
    import densefusion_tpu.cli.eval_cad as mod

    class DS(CADDataset):
        def __init__(self, root, **kw):
            kw["image_dims"] = DIMS
            kw["num_mesh_points"] = 64
            super().__init__(root, **kw)

    import densefusion_tpu.data as data_mod
    monkeypatch.setattr(data_mod, "CADDataset", DS)

    out_dir = str(tmp_path / "out")
    rate = eval_cad_cli.main([
        "--dataset_root", root, "--checkpoint", ckpt,
        "--iterations", "2", "--num_points", "64", "--crop_size", "64",
        "--dump_ply_frames", "1", "--output_dir", out_dir,
    ])
    assert 0.0 <= rate <= 1.0
    assert os.path.exists(os.path.join(out_dir, "pred_pcld_0.ply"))
    assert os.path.exists(os.path.join(out_dir, "target_pcld_0.ply"))
