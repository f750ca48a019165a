"""Smokes for the two top-level e2e example scripts (VERDICT r4 item 6):
``examples/linemod_two_stage.py`` (the canonical two-stage protocol driver
behind ``experiments/scripts/linemod_two_stage.sh``) and
``examples/serve_soak.py`` (the deployment soak). One expensive two-stage
smoke run feeds both: the soak reuses its dataset + predicted masks +
checkpoint, so the highest-level user entry points stay guarded without a
second train."""

import importlib.util
import json
import os
import sys

import pytest

_EXAMPLES = os.path.join(os.path.dirname(__file__), os.pardir, "examples")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_EXAMPLES, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def two_stage_run(tmp_path_factory):
    work = str(tmp_path_factory.mktemp("two_stage"))
    out = os.path.join(work, "summary.json")
    mod = _load("linemod_two_stage")
    result = mod.main(["--cpu", "--smoke", "--root", work, "--out", out])
    return work, out, result


@pytest.mark.slow
def test_linemod_two_stage_smoke(two_stage_run):
    work, out, result = two_stage_run
    # the full chain ran: masks predicted (class-vs-bg default), pose
    # trained, eval consumed ONLY predictions
    assert result["predicted_masks"] > 0
    assert 0.0 <= result["success_rate_0.1d"] <= 1.0
    assert result["checkpoint"].startswith("checkpoint_")
    assert result["seg_best_epoch"] is not None
    per_object = result["eval"]["per_object"]
    assert {row["obj"] for row in per_object} == {1, 10}
    with open(out) as f:
        assert json.load(f)["work_dir"] == work
    # gt segnet_results were deleted before mask prediction; what's on disk
    # is the smoke's own predictions for the eval frames only
    sr = os.path.join(work, "dataset", "segnet_results")
    assert sorted(os.listdir(sr)) == ["01_label", "10_label"]


@pytest.mark.slow
def test_serve_soak_smoke(two_stage_run):
    work, _, result = two_stage_run
    mod = _load("serve_soak")
    ckpt = os.path.join(work, "trained", "linemod", result["checkpoint"])
    out = os.path.join(work, "soak.json")
    summary = mod.main([
        "--dataset_root", os.path.join(work, "dataset"),
        "--format", "linemod", "--objlist", "1,10",
        "--checkpoint", ckpt, "--passes", "3",
        "--num_points", "64", "--crop_size", "64", "--iterations", "1",
        "--out", out,
    ])
    assert summary["frames"] == 3 * summary["eval_frames"]
    assert summary["sustained_frames_per_s"] > 0
    assert summary["rss_peak_mb"] > 0
    assert len(summary["rss_per_pass_mb"]) == 3
    assert summary["rss_growth_last3_mb"] is not None
    with open(out) as f:
        assert json.load(f)["format"] == "linemod"
