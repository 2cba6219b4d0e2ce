"""Network factory — string dispatch kept for reference API parity.

The reference dispatches "VGGnet_train"/"VGGnet_test" to two separate graph
classes (`lib/networks/factory.py:4-14`). Here one CTPN module serves both
roles (train/test differ only in what is composed around the forward pass),
so both names return the same module, configured from the global cfg.
"""

from __future__ import annotations

import jax.numpy as jnp

from ctpn_tpu.config import cfg
from ctpn_tpu.models.ctpn import CTPN

_DTYPES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}


def get_network(name: str) -> CTPN:
    if name not in ("VGGnet_train", "VGGnet_test", "ctpn"):
        raise KeyError(f"Unknown network: {name}")
    # the fused Pallas stem and the batch-packed stem are inference-path
    # options (fused: no custom VJP; packed: keep the training graph the
    # canonical one) — the training graph always uses the stock convs
    is_test = name == "VGGnet_test"
    fused_stem = bool(cfg.TPU.FUSED_STEM) and is_test
    packed_stem = (
        bool(cfg.TPU.PACKED_STEM) and is_test and not fused_stem
    )
    return CTPN(
        dtype=_DTYPES[cfg.TPU.COMPUTE_DTYPE],
        param_dtype=_DTYPES[cfg.TPU.PARAM_DTYPE],
        fused_stem=fused_stem,
        packed_stem=packed_stem,
    )
