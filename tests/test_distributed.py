"""Multi-PROCESS distributed execution (SURVEY.md §5.8).

Everything else in the suite runs multi-DEVICE single-process; this is the
one place ``jax.distributed.initialize`` + cross-process collectives execute
for real: a 2-process CPU cluster (4 virtual devices each) runs the actual
data-parallel pose train step, with gradient psums crossing the process
boundary, and must reproduce the single-process 8-device result.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """Same batch/state/two-steps on this process's own 8-device mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from densefusion_tpu.parallel import make_mesh, make_shard_batch_fn
    from tests import _distributed_worker as w

    mesh = make_mesh(8)
    batch = w.build_batch()
    posenet, state, cfg = w.build_models_and_state(batch)
    state = jax.device_put(state, NamedSharding(mesh, P()))
    sharded = make_shard_batch_fn(mesh)(batch)
    return w.run_two_steps(posenet, state, cfg, mesh, sharded)


@pytest.mark.slow
def test_two_process_distributed_cpu(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.update(
        PALLAS_AXON_POOL_IPS="",          # skip the TPU-tunnel sitecustomize
        JAX_PLATFORMS="cpu",
        DF_JAX_CACHE="0",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH=os.pathsep.join(
            [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
            + env.get("PYTHONPATH", "").split(os.pathsep)),
    )
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"worker{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, f"localhost:{port}", "2", str(pid),
             str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    results = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        results.append((p.returncode, stdout))
    for rc, stdout in results:
        assert rc == 0, f"worker failed (rc={rc}):\n{stdout[-4000:]}"

    reports = [json.loads(o.read_text()) for o in outs]
    for r in reports:
        assert r["process_count"] == 2
        assert r["device_count"] == 8
        assert r["local_devices"] == 4
    # the psum'd loss is replicated: both controllers must agree exactly
    assert reports[0]["loss1"] == reports[1]["loss1"]
    assert reports[0]["loss2"] == reports[1]["loss2"]
    assert np.isfinite([reports[0]["loss1"], reports[0]["loss2"]]).all()
    # step 2 uses params updated through cross-process gradient psums
    assert reports[0]["loss2"] != reports[0]["loss1"]

    # 2 processes x 4 devices == 1 process x 8 devices
    ref1, ref2 = _single_process_reference()
    np.testing.assert_allclose(reports[0]["loss1"], ref1, rtol=1e-5)
    np.testing.assert_allclose(reports[0]["loss2"], ref2, rtol=1e-5)
