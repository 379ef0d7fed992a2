"""Persistent XLA compilation cache.

Kernel compiles can take minutes when the TPU is reached over a slow
control channel; caching compiled executables on disk makes every process
after the first start instantly.  Default location ``~/.cache/hpgq/xla``
(override with HPGQ_COMPILE_CACHE; set to ``off`` to disable).
"""

from __future__ import annotations

import os


def enable(default_dir: str = None) -> None:
    d = os.environ.get("HPGQ_COMPILE_CACHE")
    if d in ("off", "none", "0"):
        return
    if not d:
        d = default_dir or os.path.join(
            os.path.expanduser("~"), ".cache", "hpgq", "xla"
        )
    try:
        import jax

        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization; never fail the run
        pass
