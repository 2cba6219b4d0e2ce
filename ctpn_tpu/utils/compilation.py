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


def ensure_compilation_cache(path: str = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    path = path or os.environ.get("CTPN_TPU_XLA_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
