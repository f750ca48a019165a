"""Utils coverage: config serialization, logging, step timer."""

import json
import logging
import os

import numpy as np
import pytest

from densefusion_tpu.utils import (
    RunConfig, DATASET_PRESETS, setup_logger, MetricsWriter, StepTimer,
    trace_context,
)


def test_config_roundtrip():
    cfg = RunConfig.preset("ycb", dataset_root="/x", batch_size=16)
    text = cfg.to_json()
    back = RunConfig.from_json(text)
    assert back == cfg
    assert back.sym_list == (12, 15, 18, 19, 20)
    assert back.num_points == 1000


def test_config_presets_match_reference_constants():
    # tools/train.py:56-76
    assert DATASET_PRESETS["ycb"]["num_objects"] == 21
    assert DATASET_PRESETS["linemod"]["num_points"] == 500
    assert DATASET_PRESETS["linemod"]["repeat_epoch"] == 20
    assert DATASET_PRESETS["cad"]["sym_list"] == ()
    assert DATASET_PRESETS["ycb"]["refine_mesh_points"] == 2600


def test_config_ignores_unknown_keys():
    cfg = RunConfig.from_json(json.dumps({"lr": 0.5, "bogus_key": 1}))
    assert cfg.lr == 0.5


def test_setup_logger_writes_file(tmp_path):
    path = str(tmp_path / "log" / "x.txt")
    logger = setup_logger("t_logger", path)
    logger.info("hello parity")
    for h in logger.handlers:
        h.flush()
    assert "hello parity" in open(path).read()


def test_metrics_writer_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    mw = MetricsWriter(path)
    mw.write(kind="test", value=1.5)
    mw.write(kind="test", value=2.5)
    lines = [json.loads(l) for l in open(path)]
    assert len(lines) == 2
    assert lines[1]["value"] == 2.5
    assert "ts" in lines[0]


def test_step_timer():
    t = StepTimer(items_per_step=4)
    for _ in range(3):
        with t:
            pass
    s = t.summary(skip_warmup=1)
    assert s["steps"] == 2
    assert s["items_per_s"] > 0


def test_trace_context_noop():
    with trace_context(None):
        x = 1 + 1
    assert x == 2
