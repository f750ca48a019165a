"""CLI smoke tests: train briefly on the synthetic fixture, checkpoint, then
drive the eval_linemod CLI end-to-end (loader -> pipeline -> metrics -> log
files)."""

import os

import numpy as np
import pytest

from densefusion_tpu.data import generate_linemod_style_dataset
from densefusion_tpu.models import PoseNet, PoseRefineNet
from densefusion_tpu.train import Trainer, save_checkpoint
from densefusion_tpu.utils.config import RunConfig
from densefusion_tpu.cli import eval_linemod as eval_linemod_cli


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lm_cli"))
    generate_linemod_style_dataset(root, objlist=(1,), n_train=4, n_test=20,
                                   seed=4)
    out = str(tmp_path_factory.mktemp("cli_out"))
    cfg = RunConfig(
        dataset="linemod", dataset_root=root, num_objects=1, num_points=64,
        num_mesh_points=64, refine_mesh_points=64, crop_size=64,
        batch_size=2, num_workers=1, repeat_epoch=1,
        out_dir=out, log_dir=os.path.join(out, "logs"), sym_list=(),
        knn_backend="xla", checkpoint_every_steps=10**9)

    def factory(c, mode, refine):
        from densefusion_tpu.data import LineModDataset
        return LineModDataset(
            root=c.dataset_root, mode=mode, num_points=c.num_points,
            crop_size=c.crop_size, refine=refine, seed=c.seed,
            num_mesh_points=c.num_mesh_points, objlist=[1],
            add_noise=(mode == "train"))

    tr = Trainer(cfg, posenet=PoseNet(num_obj=1),
                 refiner=PoseRefineNet(num_obj=1), dataset_factory=factory)
    tr.setup()
    tr.train_epoch()
    path = os.path.join(out, "checkpoint_smoke")
    save_checkpoint(path, tr.state, tr.curriculum, cfg)
    return root, path, out


@pytest.mark.slow
def test_eval_linemod_cli(trained_ckpt):
    root, ckpt, out = trained_ckpt
    rate = eval_linemod_cli.main([
        "--dataset_root", root, "--checkpoint", ckpt,
        "--iterations", "2", "--num_points", "64", "--num_mesh", "64",
        "--crop_size", "64", "--batch_size", "2", "--mode", "eval",
        "--objlist", "1",
        "--output_dir", os.path.join(out, "eval"),
    ])
    assert 0.0 <= rate <= 1.0
    assert os.path.exists(os.path.join(out, "eval", "eval_result_logs.txt"))


def test_train_cli_parser_defaults():
    from densefusion_tpu.cli.train import build_parser
    args = build_parser().parse_args(["--dataset_root", "/x"])
    assert args.dataset == "linemod" and args.batch_size == 8
    assert isinstance(args.lr, float)  # reference had untyped string flags


@pytest.mark.slow
def test_visualize_cli(trained_ckpt):
    """Overlay renderer: one batched dispatch, PNGs written, pred/gt dots
    actually painted (green + blue pixels present)."""
    from PIL import Image
    from densefusion_tpu.cli import visualize as visualize_cli

    root, ckpt, out = trained_ckpt
    vis_dir = os.path.join(out, "vis")
    visualize_cli.main([
        "--dataset_root", root, "--checkpoint", ckpt,
        "--num_points", "64", "--crop_size", "64", "--frames", "2",
        "--iterations", "1", "--objlist", "1", "--output_dir", vis_dir,
    ])
    pngs = sorted(f for f in os.listdir(vis_dir) if f.endswith(".png"))
    assert len(pngs) == 2
    img = np.asarray(Image.open(os.path.join(vis_dir, pngs[0])))
    assert (img == np.array([0, 220, 60])).all(-1).any(), "no pred dots"
    assert (img == np.array([60, 90, 255])).all(-1).any(), "no gt dots"


@pytest.mark.slow
def test_export_stablehlo_cli(trained_ckpt):
    """checkpoint -> StableHLO artifact -> deserialize with only jax ->
    outputs match the live pipeline bit-close."""
    from densefusion_tpu.cli.export_stablehlo import main as export_main
    from densefusion_tpu.export import load_exported
    from densefusion_tpu.data import LineModDataset, collate
    from densefusion_tpu.serve import PoseEstimator

    root, ckpt, out = trained_ckpt
    art = os.path.join(out, "posenet_b2.shlo")
    export_main(["--checkpoint", ckpt, "--batch", "2", "--iterations", "2",
                 "--out", art])
    fn = load_exported(open(art, "rb").read())

    ds = LineModDataset(root, "test", num_points=64, crop_size=64,
                        num_mesh_points=64, objlist=[1], add_noise=False)
    batch = collate([ds[0], ds[1]])
    q, t, c = fn(batch.img, batch.points, batch.choose, batch.obj_idx)

    est = PoseEstimator.from_checkpoint(ckpt, num_obj=1, num_points=64,
                                        crop_size=64, refine_iters=2)
    q2, t2, c2 = est.pipeline(est.params_pose, est.params_refine,
                              batch.img, batch.points, batch.choose,
                              batch.obj_idx)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c2),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_eval_linemod_immature_refiner_warning(trained_ckpt):
    """An immature phase-2 checkpoint (refine_steps below the maturity
    threshold) must surface the IMMATURE warning in the eval log, and when
    the refined rate comes out below per-pixel the post-hoc REFINEMENT
    DEGRADED warning names both numbers (VERDICT r4 item 2)."""
    import json
    import shutil

    root, ckpt, out = trained_ckpt
    ck2 = os.path.join(out, "checkpoint_immature")
    shutil.rmtree(ck2, ignore_errors=True)
    shutil.copytree(ckpt, ck2)
    with open(os.path.join(ck2, "curriculum.json")) as f:
        cur = json.load(f)
    cur["refine_started"], cur["refine_steps"] = True, 500
    with open(os.path.join(ck2, "curriculum.json"), "w") as f:
        json.dump(cur, f)

    eval_dir = os.path.join(out, "eval_immature")
    eval_linemod_cli.main([
        "--dataset_root", root, "--checkpoint", ck2,
        "--iterations", "2", "--num_points", "64", "--num_mesh", "64",
        "--crop_size", "64", "--batch_size", "2", "--mode", "eval",
        "--objlist", "1",
        "--output_dir", eval_dir,
    ])
    with open(os.path.join(eval_dir, "eval_result_logs.txt")) as f:
        log = f.read()
    assert "IMMATURE" in log
    with open(os.path.join(eval_dir, "result.json")) as f:
        res = json.load(f)
    # iterations NOT clamped: immaturity warns, only refine_steps==0 clamps
    assert res["iterations"] == 2
    if res["rate_refined"] < res["rate_per_pixel"]:
        assert "REFINEMENT DEGRADED ACCURACY" in log
