"""Mesh construction helpers.

The reference has no parallelism (one GPU, one image per step —
SURVEY.md §2.3). Here data parallelism is first-class: a 1-D `jax.sharding.
Mesh` over all local devices (the v5e-8 target), batch axis sharded across
it. The axis name is configurable (cfg.TPU.MESH_AXIS) and left pluggable so
model axes (tp/pp) can be added without touching call sites, though a 15M-
param VGG head needs none.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ctpn_tpu.config import cfg


def make_mesh(devices: Optional[Sequence] = None, axis: Optional[str] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    axis = axis or cfg.TPU.MESH_AXIS
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-major arrays: shard dim 0 over the data axis."""
    return NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
