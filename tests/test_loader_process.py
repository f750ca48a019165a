"""Fork-worker + shared-memory ring loader tests.

The process mode must be bit-identical to the thread/sequential modes (the
per-sample RNG contract: content is a function of (seed, epoch, index), not
of worker identity), survive mid-epoch resume and consumer abandonment, and
actually parallelize sample assembly (docs/PERF.md round 2c).
"""

import sys

import numpy as np
import pytest

from densefusion_tpu.data import BatchLoader
from densefusion_tpu.data.loader import _SlotLayout
from densefusion_tpu.data.schema import PoseSample

pytestmark = pytest.mark.skipif(
    not sys.platform.startswith("linux"),
    reason="fork workers are linux-only (thread fallback elsewhere)")


@pytest.fixture(scope="module")
def ycb_ds(tmp_path_factory):
    from densefusion_tpu.data.synthetic import generate_ycb_style_dataset
    from densefusion_tpu.data.ycb import YCBDataset
    root = str(tmp_path_factory.mktemp("ycb_proc"))
    generate_ycb_style_dataset(root, n_classes=3, n_real=6, n_syn=6,
                               n_test=2, seed=0, img_h=120, img_w=160)
    return YCBDataset(root, mode="train", num_points=200, crop_size=64,
                      cache_frames=64)


def _batches(loader, epoch, start=0):
    return list(loader.epoch(epoch, start_batch=start))


def test_slot_layout_roundtrip():
    template = PoseSample.invalid(17, 23, 8)
    layout = _SlotLayout(template)
    assert layout.slot_bytes % 64 == 0
    import multiprocessing as mp
    raw = mp.get_context("fork").RawArray("b", 3 * layout.slot_bytes)
    views = layout.views(raw, 3)
    rng = np.random.default_rng(0)
    sample = PoseSample(
        points=rng.standard_normal((17, 3)).astype(np.float32),
        choose=rng.integers(0, 64, 17).astype(np.int32),
        img=rng.standard_normal((8, 8, 3)).astype(np.float32),
        target=rng.standard_normal((23, 3)).astype(np.float32),
        model_points=rng.standard_normal((23, 3)).astype(np.float32),
        obj_idx=np.asarray(5, np.int32),
        sym=np.asarray(True, bool),
        valid=np.asarray(True, bool),
    )
    for d, s in zip(views[1], sample):
        np.copyto(d, s)
    for f, d, s in zip(sample._fields, views[1], sample):
        np.testing.assert_array_equal(d, s, err_msg=f)
    # neighboring slots untouched
    assert not np.any(np.asarray(views[0].img))
    assert not np.any(np.asarray(views[2].img))


def test_process_matches_sequential(ycb_ds):
    seq = BatchLoader(ycb_ds, 4, shuffle=True, num_workers=0,
                      drop_last=False, seed=3)
    proc = BatchLoader(ycb_ds, 4, shuffle=True, num_workers=2,
                       drop_last=False, seed=3, worker_mode="process")
    assert proc.worker_mode == "process"
    try:
        for ep in (0, 1):
            for a, b in zip(_batches(seq, ep), _batches(proc, ep)):
                for f, x, y in zip(a._fields, a, b):
                    np.testing.assert_array_equal(x, y, err_msg=f)
    finally:
        proc.close()


def test_process_mid_epoch_resume(ycb_ds):
    seq = BatchLoader(ycb_ds, 4, shuffle=True, num_workers=0,
                      drop_last=False, seed=7)
    proc = BatchLoader(ycb_ds, 4, shuffle=True, num_workers=2,
                       drop_last=False, seed=7, worker_mode="process")
    try:
        want = _batches(seq, 5, start=2)
        got = _batches(proc, 5, start=2)
        assert len(got) == len(want) > 0
        for a, b in zip(want, got):
            np.testing.assert_array_equal(a.points, b.points)
    finally:
        proc.close()


def test_process_abandon_then_reuse(ycb_ds):
    proc = BatchLoader(ycb_ds, 4, shuffle=True, num_workers=2,
                       drop_last=False, seed=1, worker_mode="process")
    try:
        it = proc.epoch(0)
        next(it)
        it.close()            # consumer breaks mid-epoch
        seq = BatchLoader(ycb_ds, 4, shuffle=True, num_workers=0,
                          drop_last=False, seed=1)
        for a, b in zip(_batches(seq, 1), _batches(proc, 1)):
            np.testing.assert_array_equal(a.points, b.points)
    finally:
        proc.close()


def test_process_worker_error_propagates(ycb_ds):
    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i >= 4:
                raise ValueError("boom")
            return ycb_ds[0]

    proc = BatchLoader(Broken(), 4, shuffle=False, num_workers=2,
                       drop_last=False, worker_mode="process")
    try:
        with pytest.raises(RuntimeError, match="boom"):
            _batches(proc, 0)
    finally:
        proc.close()


def test_non_linux_falls_back_to_thread(ycb_ds, monkeypatch):
    import densefusion_tpu.data.loader as loader_mod
    monkeypatch.setattr(loader_mod.sys, "platform", "darwin")
    ld = BatchLoader(ycb_ds, 4, num_workers=2, worker_mode="process")
    assert ld.worker_mode == "thread"


def test_axon_client_falls_back_to_thread(ycb_ds, monkeypatch):
    """Fork workers must not coexist with the in-process axon remote-TPU
    client (live gRPC threads at fork wedge the device session). The check
    is lazy — construction keeps mode='process'; the downgrade happens at
    the first epoch, once the backend registry can be trusted."""
    import densefusion_tpu.data.loader as loader_mod
    monkeypatch.setattr(loader_mod, "_axon_client_live", lambda: True)
    ld = BatchLoader(ycb_ds, 4, num_workers=2, worker_mode="process")
    assert ld.worker_mode == "process"
    with pytest.warns(UserWarning, match="axon"):
        next(ld.epoch(0))
    assert ld.worker_mode == "thread"


def test_axon_env_alone_keeps_process_mode(ycb_ds, monkeypatch):
    """Pool env vars without an initialized axon backend (e.g. a run pinned
    to JAX_PLATFORMS=cpu on a tunnel host) must NOT cost the fork workers."""
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    ld = BatchLoader(ycb_ds, 4, num_workers=2, worker_mode="process")
    try:
        next(ld.epoch(0))
        assert ld.worker_mode == "process"
    finally:
        ld.close()
