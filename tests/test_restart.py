"""RSS-guard exec-restart: the child must be able to import the package.

Production failure this guards (docs/PERF.md round 5): ``python -m
densefusion_tpu.cli.train`` sets ``sys.argv[0]`` to the module FILE path;
re-exec'ing that path as a script puts ``.../cli`` at ``sys.path[0]`` and
the restarted run crashed with ``ModuleNotFoundError: densefusion_tpu``
whenever the shell had not exported ``PYTHONPATH=<repo root>``.
"""

import os
import subprocess
import sys

from densefusion_tpu.utils.restart import restart_env


def test_restart_env_prepends_pkg_root():
    env = restart_env({"PYTHONPATH": "/some/other"})
    parts = env["PYTHONPATH"].split(os.pathsep)
    import densefusion_tpu
    pkg_root = os.path.dirname(os.path.dirname(
        os.path.abspath(densefusion_tpu.__file__)))
    assert parts[0] == pkg_root
    # inherited entries are preserved, not clobbered
    assert "/some/other" in parts


def test_restart_env_idempotent():
    first = restart_env({})
    second = restart_env({"PYTHONPATH": first["PYTHONPATH"]})
    assert second["PYTHONPATH"] == first["PYTHONPATH"]


def test_reexeced_argv0_imports_package(tmp_path):
    """Simulate the restart: run the CLI module's FILE path as a script
    (exactly what execv receives after a ``-m`` launch) under restart_env
    from a neutral cwd — the import must succeed."""
    import densefusion_tpu.cli.train as train_mod
    argv0 = os.path.abspath(train_mod.__file__)
    env = restart_env({k: v for k, v in os.environ.items()
                       if k != "PYTHONPATH"})
    proc = subprocess.run(
        [sys.executable, argv0, "--help"], cwd=tmp_path,
        env=env, capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    assert "--rss_restart_gb" in proc.stdout
