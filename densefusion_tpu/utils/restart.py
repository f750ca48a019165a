"""Self-exec restart for the RSS leak guard (``cli.train``/``cli.train_seg``).

Some remote-TPU transports retain per-dispatch host buffers; long runs hit
tens of GiB of unreclaimable anon RSS (docs/PERF.md round 5). The guard
saves state and replaces the process image with ``os.execve`` so the leaked
address space is returned to the OS.

The subtlety this module owns: when the CLI was launched as ``python -m
densefusion_tpu.cli.train``, ``sys.argv[0]`` is the module's *file path* —
re-exec'ing that path as a script puts ``.../densefusion_tpu/cli`` (not the
repo root) at ``sys.path[0]``, and the restarted process dies with
``ModuleNotFoundError: densefusion_tpu`` unless the shell happened to export
``PYTHONPATH=<repo root>``. Measured in production (2026-08-21): a 36-epoch
YCB run restarted into exactly that crash. The fix: carry the package's
parent directory into the child's ``PYTHONPATH`` explicitly.
"""

from __future__ import annotations

import os
import sys


def restart_env(base_env=None) -> dict:
    """Environment for the re-exec'd child: the inherited environment with
    the package's parent directory prepended to ``PYTHONPATH`` (existing
    entries preserved — the clobber gotcha ``experiments/scripts`` documents
    applies here too)."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ if base_env is None else base_env)
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p]
    if pkg_root not in parts:
        parts.insert(0, pkg_root)
    env["PYTHONPATH"] = os.pathsep.join(parts)
    return env


def reexec_self(argv: list[str]) -> None:
    """Replace this process with ``python argv``, keeping imports working.

    ``argv`` is the full script argv (``sys.argv`` shaped, argv[0] = script
    path). Never returns.
    """
    os.execve(sys.executable, [sys.executable] + list(argv), restart_env())
