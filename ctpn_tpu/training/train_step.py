"""Train state and the fused train step (targets + forward + backward).

Replaces the reference's per-iteration choreography
(`lib/fast_rcnn/train.py:79-182`): one jit program computes anchor targets
(on device, `ops/anchor_target.py`), the forward pass, both losses, L2
decay, gradients, global-norm clipping, and the Adam update. The reference
round-trips to the host for targets every step and runs Adam at a fixed LR
(its LR-decay mutation never reaches the optimizer, `train.py:96,141-175` —
this implementation wires the step-decay schedule in properly).

Data parallelism: the step function is pure; `parallel/dp.py` wraps it with
sharding annotations so XLA inserts the gradient all-reduce over the mesh.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from ctpn_tpu.config import cfg
from ctpn_tpu.models.ctpn import CTPN
from ctpn_tpu.ops.anchor_target import anchor_target_batched
from ctpn_tpu.training.loss import ctpn_loss, weight_decay_loss


class TrainState(train_state.TrainState):
    rng: jax.Array = None


class Batch(NamedTuple):
    """One padded training batch (all arrays fixed-shape, batch-major)."""

    images: jnp.ndarray  # (N, bh, bw, 3) uint8 BGR wire format (or float32)
    im_info: jnp.ndarray  # (N, 3)
    gt_boxes: jnp.ndarray  # (N, G, 4)
    gt_valid: jnp.ndarray  # (N, G) bool
    gt_ishard: jnp.ndarray  # (N, G) bool
    dontcare: jnp.ndarray  # (N, D, 4)
    dontcare_valid: jnp.ndarray  # (N, D) bool


def make_lr_schedule(
    base_lr: Optional[float] = None,
    gamma: Optional[float] = None,
    stepsize: Optional[int] = None,
):
    """Step decay: LR * gamma^(step // stepsize) (`text.yml` GAMMA/STEPSIZE)."""
    base_lr = base_lr if base_lr is not None else cfg.TRAIN.LEARNING_RATE
    gamma = gamma if gamma is not None else cfg.TRAIN.GAMMA
    stepsize = stepsize if stepsize is not None else cfg.TRAIN.STEPSIZE

    def schedule(step):
        return base_lr * jnp.power(gamma, step // stepsize)

    return schedule


def make_optimizer(solver: Optional[str] = None) -> optax.GradientTransformation:
    """Solver select + global-norm clip 10 (`train.py:95-109`)."""
    solver = solver or cfg.TRAIN.SOLVER
    lr = make_lr_schedule()
    if solver == "Adam":
        opt = optax.adam(lr)
    elif solver == "RMS":
        opt = optax.rmsprop(lr, decay=0.9, momentum=0.0, eps=1.0)
    elif solver == "Momentum":
        opt = optax.sgd(lr, momentum=cfg.TRAIN.MOMENTUM)
    else:  # pragma: no cover
        raise ValueError(f"unknown solver {solver}")
    return optax.chain(optax.clip_by_global_norm(10.0), opt)


def create_train_state(
    rng: jax.Array,
    model: CTPN,
    input_shape: Tuple[int, int, int, int],
    params=None,
) -> TrainState:
    if params is None:
        params = model.init(rng, jnp.zeros(input_shape, jnp.float32))["params"]
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=make_optimizer(),
        rng=rng,
    )


def build_train_step(model: CTPN, feat_h: int, feat_w: int):
    """Returns jit-able step(state, batch) -> (state, metrics)."""
    wd = cfg.TRAIN.WEIGHT_DECAY
    at_kw = dict(
        positive_overlap=cfg.TRAIN.RPN_POSITIVE_OVERLAP,
        negative_overlap=cfg.TRAIN.RPN_NEGATIVE_OVERLAP,
        fg_fraction=cfg.TRAIN.RPN_FG_FRACTION,
        rpn_batchsize=cfg.TRAIN.RPN_BATCHSIZE,
        dontcare_hi=cfg.TRAIN.DONTCARE_AREA_INTERSECTION_HI,
        inside_weights=tuple(cfg.TRAIN.RPN_BBOX_INSIDE_WEIGHTS),
        clobber_positives=cfg.TRAIN.RPN_CLOBBER_POSITIVES,
        preclude_hard=cfg.TRAIN.PRECLUDE_HARD_SAMPLES,
        ohem=bool(cfg.TRAIN.OHEM),
    )
    ohem_bs = int(cfg.TRAIN.RPN_BATCHSIZE) if cfg.TRAIN.OHEM else None
    means = jnp.asarray(cfg.PIXEL_MEANS, dtype=jnp.float32)

    def step(state: TrainState, batch: Batch):
        rng, rng_targets = jax.random.split(state.rng)
        targets = anchor_target_batched(
            rng_targets,
            batch.gt_boxes,
            batch.gt_valid,
            batch.gt_ishard,
            batch.dontcare,
            batch.dontcare_valid,
            batch.im_info,
            feat_h,
            feat_w,
            **at_kw,
        )

        apply = state.apply_fn
        if cfg.TPU.REMAT:
            apply = jax.checkpoint(apply, static_argnums=())

        def loss_fn(params):
            # images arrive uint8 (wire format); normalize on device
            x = batch.images.astype(jnp.float32) - means
            outs = apply({"params": params}, x)
            model_loss, aux = ctpn_loss(
                outs.cls_score, outs.bbox_pred, targets,
                ohem_batchsize=ohem_bs,
            )
            reg = weight_decay_loss(params, wd)
            total = model_loss + reg
            aux["total_loss"] = total
            return total, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads=grads)
        new_state = new_state.replace(rng=rng)
        aux["grad_norm"] = optax.global_norm(grads)
        aux["learning_rate"] = make_lr_schedule()(state.step)
        # norm of the applied parameter delta: the direct evidence that the
        # LR decay reaches the optimizer (the reference's never did,
        # `train.py:96,141-175` — its lr Variable was ignored by Adam)
        aux["update_norm"] = optax.global_norm(
            jax.tree_util.tree_map(
                lambda a, b: a - b, new_state.params, state.params
            )
        )
        return new_state, aux

    return step
