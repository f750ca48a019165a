"""Smoke tests for the benchmark CLI's measurement functions."""

import pytest

from densefusion_tpu.cli import benchmark as bench


def test_bench_knn_smoke():
    out = bench.bench_knn(repeats=1)
    assert out["knn_us"] > 0 and out["knn_pairs_per_s"] > 0


@pytest.mark.slow
def test_bench_latency_smoke():
    out = bench.bench_latency(repeats=2)
    assert out["latency_ms_median"] > 0
    assert out["latency_ms_p90"] >= out["latency_ms_median"]
    assert out["latency_refine_iters"] == 2


@pytest.mark.slow
def test_bench_refine_step_smoke():
    out = bench.bench_refine_step(batch=2, repeats=1, mesh_points=128)
    assert out["refine_ms_per_step"] > 0
    assert out["refine_mesh_points"] == 128


def test_bench_py_train_sections_smoke():
    """The driver-run bench.py extras (f32/bf16 train grad, refine-phase
    step) execute end-to-end at tiny shapes and emit their guarded keys."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_root", os.path.join(os.path.dirname(__file__), os.pardir,
                                   "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = mod.train_step_bench(b=2, n=32, m=16, crop=48, reps=1)
    assert set(out) == {"train_grad_ms_b32", "train_fps_device"}
    out = mod.train_step_bench(bf16=True, b=2, n=32, m=16, crop=48, reps=1)
    assert set(out) == {"train_grad_ms_b32_bf16", "train_fps_device_bf16"}
    out = mod.refine_step_bench(b=2, n=32, m=64, crop=48, reps=1)
    assert set(out) == {"refine_step_ms_b32_M2600", "refine_fps_device"}


@pytest.mark.slow
def test_bench_seg_smoke():
    out = bench.bench_seg(batch=1, repeats=1, num_classes=4,
                          height=64, width=64)
    assert out["seg_train_ms_per_step"] > 0
    assert out["seg_infer_frames_per_s"] > 0
