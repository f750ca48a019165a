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
