"""Persistent XLA compilation cache.

The CTPN end-to-end program (conv backbone + Pallas NMS + connector) takes
minutes to compile on TPU; caching compiled executables across processes
makes every run after the first start in seconds. Enabled automatically by
the predictor and solver entry points.
"""

from __future__ import annotations

import os
import os.path as osp

_DEFAULT = osp.expanduser("~/.cache/ctpn_tpu/xla")
_enabled = False


def ensure_compilation_cache(
    path: str = None, min_compile_secs: float = 1.0
) -> None:
    """``min_compile_secs``: only executables that took at least this long
    to compile are written. The test suite passes 0 — its many small
    fixed-shape programs individually compile in ~100 ms but sum to tens
    of seconds per run; production entry points keep the 1 s threshold so
    the cache holds only the expensive programs."""
    global _enabled
    if _enabled:
        return
    import jax

    path = path or os.environ.get("CTPN_TPU_XLA_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
    _enabled = True
