"""Driver entry-point contract: entry() yields a jittable fn + args, and
dryrun_multichip compiles/executes both training phases on the virtual
8-device mesh."""

import importlib.util
import os

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def graft():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..",
                                    "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles(graft):
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    r, t, c = out
    assert r.shape == (1, 1000, 4)
    assert t.shape == (1, 1000, 3)
    assert c.shape == (1, 1000)
    assert np.isfinite(np.asarray(c)).all()


@pytest.mark.slow
def test_dryrun_multichip(graft):
    graft.dryrun_multichip(8)  # raises on any sharding/compile failure
