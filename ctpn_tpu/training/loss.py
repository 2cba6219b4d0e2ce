"""CTPN training losses.

Contract from reference ``Network.build_loss`` (`lib/networks/network.py:376-409`):

* classification — sparse softmax cross-entropy over the (bg, fg) logits of
  every anchor with label != -1, MEAN-reduced over those anchors;
* box — smooth-L1 with sigma^2 = 9 (`network.py:367-372`) of
  ``inside_w * (pred - target)`` row-summed, weighted by ``outside_w``, and
  SUM-reduced then divided by (num_fg + 1);
* total — model loss + L2 weight decay ``wd * 0.5 * sum(w^2)`` over conv/fc
  kernels (TF ``l2_loss`` semantics; LSTM recurrent/input weights excluded,
  matching tf.contrib.rnn cells which were never regularized).

All reductions are mask-based (no gathers) and vmapped over the batch; the
reference supports only batch 1.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ctpn_tpu.ops.anchor_target import AnchorTargets

# parameter path fragments excluded from weight decay (LSTM cell weights and
# all biases); everything else named 'kernel' decays
_NO_DECAY = ("input_proj", "w_h_fw", "w_h_bw")


def smooth_l1(x: jnp.ndarray, sigma2: float = 9.0) -> jnp.ndarray:
    """Elementwise smooth-L1 with the reference's sigma^2 parameterization."""
    ax = jnp.abs(x)
    return jnp.where(
        ax < 1.0 / sigma2,
        0.5 * sigma2 * x * x,
        ax - 0.5 / sigma2,
    )


def ctpn_loss(
    cls_score: jnp.ndarray,  # (N, H, W, A*2) logits
    bbox_pred: jnp.ndarray,  # (N, H, W, A*4)
    targets: AnchorTargets,  # batched (N, H, W, ...)
    sigma2: float = 9.0,
    ohem_batchsize: int | None = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Per-batch model loss (cls + box), averaged over images.

    ``ohem_batchsize`` (static): online hard example mining — the anchor
    target layer left ALL negatives labeled 0 (`ops/anchor_target.py`,
    ohem=True) and the (ohem_batchsize - num_fg) highest-loss negatives are
    selected here, replacing the reference's random subsample. The
    reference's ``build_loss(ohem=...)`` accepts but ignores the flag
    (`lib/networks/network.py:376`).
    """

    def per_image(score, pred, labels, tgt, biw, bow):
        logits = score.reshape(-1, 2)
        lbl = labels.reshape(-1)
        keep = lbl != -1
        lbl_safe = jnp.maximum(lbl, 0)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, lbl_safe[:, None], axis=1)[:, 0]
        if ohem_batchsize is not None:
            is_fg = lbl == 1
            n_fg_sel = jnp.sum(is_fg.astype(jnp.int32))
            # rank negatives by descending loss (argsort of argsort);
            # keep the (batchsize - num_fg) hardest
            neg_ce = jnp.where(lbl == 0, ce, -jnp.inf)
            order = jnp.argsort(-neg_ce)
            rank = jnp.argsort(order)
            hard_bg = (lbl == 0) & (rank < ohem_batchsize - n_fg_sel)
            keep = is_fg | hard_bg
        n_keep = jnp.maximum(jnp.sum(keep.astype(jnp.float32)), 1.0)
        cls_loss = jnp.sum(jnp.where(keep, ce, 0.0)) / n_keep

        pred4 = pred.reshape(-1, 4)
        tgt4 = tgt.reshape(-1, 4)
        biw4 = biw.reshape(-1, 4)
        bow4 = bow.reshape(-1, 4)
        per_row = jnp.sum(bow4 * smooth_l1(biw4 * (pred4 - tgt4), sigma2), axis=1)
        n_fg = jnp.sum((lbl == 1).astype(jnp.float32))
        box_loss = jnp.sum(jnp.where(keep, per_row, 0.0)) / (n_fg + 1.0)
        return cls_loss, box_loss, n_fg

    cls_l, box_l, n_fg = jax.vmap(per_image)(
        cls_score,
        bbox_pred,
        targets.labels,
        targets.bbox_targets,
        targets.bbox_inside_weights,
        targets.bbox_outside_weights,
    )
    cls_loss = jnp.mean(cls_l)
    box_loss = jnp.mean(box_l)
    model_loss = cls_loss + box_loss
    aux = {
        "rpn_cls_loss": cls_loss,
        "rpn_box_loss": box_loss,
        "model_loss": model_loss,
        "num_fg": jnp.mean(n_fg),
    }
    return model_loss, aux


def weight_decay_loss(params, wd: float) -> jnp.ndarray:
    """TF-style L2 regularization: wd * 0.5 * sum(w^2) over decayed kernels."""

    def leaf_loss(path, leaf):
        name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        if "kernel" not in name:
            return 0.0
        if any(frag in name for frag in _NO_DECAY):
            return 0.0
        return 0.5 * jnp.sum(jnp.square(leaf.astype(jnp.float32)))

    flat = jax.tree_util.tree_leaves_with_path(params)
    return wd * sum(leaf_loss(path, leaf) for path, leaf in flat)
