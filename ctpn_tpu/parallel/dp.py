"""Data-parallel wrappers: shard the batch, replicate params, let XLA
insert the gradient all-reduce over ICI.

TPU-native replacement for what the reference never had (single
GPU, `train_net.py:25`): the train step from `training/train_step.py` is
jit-compiled with `NamedSharding` annotations — parameters/optimizer state
replicated, batch arrays sharded on dim 0 — so the backward pass's gradient
reduction becomes an XLA `all-reduce` over the mesh (the pjit/GSPMD recipe;
no hand-written collectives needed for pure DP).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
from jax.sharding import Mesh

from ctpn_tpu.parallel.mesh import data_sharding, replicated
from ctpn_tpu.training.train_step import Batch, TrainState


def shard_batch(batch: Batch, mesh: Mesh) -> Batch:
    """Device_put every batch array with dim-0 sharded over the mesh."""
    ds = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, ds), batch)


def shard_train_step(
    step_fn: Callable[[TrainState, Batch], Tuple[TrainState, Any]],
    mesh: Mesh,
):
    """jit the step with DP shardings: params replicated, batch sharded."""
    repl = replicated(mesh)
    ds = data_sharding(mesh)

    # state (params/opt/rng) replicated; batch dim-0 sharded; metrics
    # replicated scalars
    return jax.jit(
        step_fn,
        in_shardings=(repl, jax.tree_util.tree_map(lambda _: ds, Batch(
            images=0, im_info=0, gt_boxes=0, gt_valid=0, gt_ishard=0,
            dontcare=0, dontcare_valid=0,
        ))),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    repl = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)


def shard_detect_fn(detect_fn, mesh: Mesh):
    """jit an inference fn(params, images, im_info) with DP shardings.

    Params replicated; the image batch and im_info shard on dim 0; outputs
    stay batch-sharded (pull per-image slices or device_get as needed).
    Inference is embarrassingly parallel over the mesh — no collectives.
    """
    repl = replicated(mesh)
    ds = data_sharding(mesh)
    return jax.jit(detect_fn, in_shardings=(repl, ds, ds))
