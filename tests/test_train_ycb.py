"""End-to-end Trainer smoke on the synthetic YCB fixture through the default
dataset factory (build_dataset('ycb')): one epoch of each phase with the real
500-point mesh contract and mixed symmetric/asymmetric batches."""

import os

import numpy as np
import pytest

from densefusion_tpu.data.synthetic import generate_ycb_style_dataset
from densefusion_tpu.models import PoseNet, PoseRefineNet
from densefusion_tpu.train import Trainer
from densefusion_tpu.utils.config import RunConfig


@pytest.mark.slow
def test_ycb_trainer_end_to_end(tmp_path):
    root = str(tmp_path / "ycb")
    generate_ycb_style_dataset(root, n_classes=3, n_real=4, n_syn=2,
                               n_test=2, seed=3)
    out = str(tmp_path / "out")
    cfg = RunConfig.preset(
        "ycb", dataset_root=root, num_points=64, crop_size=64,
        batch_size=2, num_workers=1, repeat_epoch=1,
        out_dir=out, log_dir=os.path.join(out, "logs"),
        knn_backend="xla", checkpoint_every_steps=10**9)
    tr = Trainer(cfg, posenet=PoseNet(num_obj=3),
                 refiner=PoseRefineNet(num_obj=3))
    tr.setup()
    avg = tr.train_epoch()
    assert np.isfinite(avg) and avg > 0
    test_avg = tr.test_epoch()
    assert np.isfinite(test_avg)
    # phase 2 with the YCB 2600-point refine mesh contract
    tr.curriculum.refine_started = True
    tr._build_data(refine=True)
    assert tr.train_ds.num_points_mesh == 2600
    tr._rebuild_steps(reset_opt=True)
    avg2 = tr.train_epoch()
    assert np.isfinite(avg2)
