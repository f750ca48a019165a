"""Persistent XLA compilation cache for the CLIs.

The flagship YCB train program takes minutes to compile on a TPU (the
round-3 e2e run paid two ~10-minute first-compiles, docs/PERF.md), and the
reference has nothing comparable to amortize it (every ``tools/train.py``
launch pays full torch/CUDA warmup). JAX can serialize compiled executables
to disk and reload them across processes; this module turns that on for
every long-compile entry point so the second launch of the same
shape/config starts training in seconds.

Opt-out / relocation via environment:

* ``DF_JAX_CACHE=0``          — disable entirely.
* ``DF_JAX_CACHE_DIR=<path>`` — cache directory (default
  ``~/.cache/densefusion_tpu/jax``).

Enabling is best-effort: an unwritable directory or a backend that cannot
serialize executables must never break training, so failures degrade to a
warning and an ordinary in-memory compile.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "densefusion_tpu", "jax")
_enabled_dir: str | None = None


def enable_persistent_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (idempotent).

    Returns the cache directory in use, or ``None`` when disabled/failed.
    Call before the first ``jit`` compilation; later calls are no-ops.
    """
    global _enabled_dir
    if _enabled_dir is not None:
        return _enabled_dir
    if os.environ.get("DF_JAX_CACHE", "1").strip().lower() in ("0", "off",
                                                               "false"):
        return None
    path = path or os.environ.get("DF_JAX_CACHE_DIR") or _DEFAULT_DIR
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        prior = jax.config.jax_compilation_cache_dir
        try:
            jax.config.update("jax_compilation_cache_dir", path)
            # Big programs only: sub-second compiles aren't worth the disk/IO.
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              2.0)
        except Exception:
            # Leave no half-enabled state behind: if the second update fails
            # after the dir was already set, restore the prior dir so the
            # "disabled" return value is actually true.
            jax.config.update("jax_compilation_cache_dir", prior)
            raise
    except Exception as e:  # noqa: BLE001 — best-effort by contract
        import warnings

        warnings.warn(f"persistent compilation cache disabled: {e!r}",
                      stacklevel=2)
        return None
    _enabled_dir = path
    return path
