"""On-device anchor-target assignment (training labels + regression targets).

Fixed-shape re-design of `lib/rpn_msr/anchor_target_layer_tf.py:10-276`,
which the reference runs on the host (Cython IoU + numpy.random sampling)
inside `tf.py_func` EVERY training step. Here it is a pure jit-able function
of padded gt arrays and a `jax.random` key — no host round-trip, reproducible
sampling (SURVEY.md §7 hard part 6).

Semantics preserved from the reference:

* only anchors fully inside the true image participate
  (`anchor_target_layer_tf.py:101-113`); everything else gets label -1,
  targets/weights 0 — the `_unmap` fill semantics (`:241-244`);
* bg where max-IoU < RPN_NEGATIVE_OVERLAP, then fg for each gt's argmax
  anchors (every anchor tying a gt's max IoU — `np.where(overlaps ==
  gt_max_overlaps)` `:140-142`), then fg for IoU >= RPN_POSITIVE_OVERLAP;
  with RPN_CLOBBER_POSITIVES=False bg is assigned first (`:135-149`);
* dontcare areas: anchors whose summed intersection fraction exceeds
  DONTCARE_AREA_INTERSECTION_HI -> -1 (`:152-159`);
* hard gt handling: anchors overlapping a hard gt >= RPN_POSITIVE_OVERLAP
  -> -1, plus each hard gt's own argmax anchor -> -1 (`:163-175`);
* subsample to RPN_FG_FRACTION*RPN_BATCHSIZE fg, fill with bg to
  RPN_BATCHSIZE total, by uniform choice without replacement (`:181-197`);
* regression targets encode EVERY inside anchor against its argmax gt
  (`:203-204`); inside weights [0,1,0,1] on fg only; outside weights 1 on
  fg/bg rows with RPN_POSITIVE_WEIGHT=-1 uniform scheme (`:207-226`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ctpn_tpu.ops.anchors import NUM_ANCHORS, shifted_anchors
from ctpn_tpu.ops.boxes import bbox_transform
from ctpn_tpu.ops.iou import pairwise_intersection_frac, pairwise_iou


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray  # (H, W, A) int32: 1 fg, 0 bg, -1 ignore
    bbox_targets: jnp.ndarray  # (H, W, A*4) float32
    bbox_inside_weights: jnp.ndarray  # (H, W, A*4)
    bbox_outside_weights: jnp.ndarray  # (H, W, A*4)


def _sample_to_cap(rng, eligible: jnp.ndarray, cap) -> jnp.ndarray:
    """Keep at most ``cap`` of the eligible entries, chosen uniformly.

    Fixed-shape analogue of the reference's ``npr.choice(..., replace=False)``
    disable step: rank eligible entries by an iid uniform draw and keep ranks
    below the cap. ``cap`` may be a traced scalar.
    """
    n = eligible.shape[0]
    u = jax.random.uniform(rng, (n,))
    key = jnp.where(eligible, u, 2.0)  # ineligible sorts last
    rank = jnp.argsort(jnp.argsort(key))  # rank of each entry by key
    return eligible & (rank < cap)


@functools.partial(
    jax.jit,
    static_argnames=(
        "feat_h",
        "feat_w",
        "fg_fraction",
        "rpn_batchsize",
        "inside_weights",
        "clobber_positives",
        "preclude_hard",
        "ohem",
    ),
)
def anchor_target_layer(
    rng: jax.Array,
    gt_boxes: jnp.ndarray,  # (G, 4) padded
    gt_valid: jnp.ndarray,  # (G,) bool
    gt_ishard: jnp.ndarray,  # (G,) bool
    dontcare: jnp.ndarray,  # (D, 4) padded
    dontcare_valid: jnp.ndarray,  # (D,) bool
    im_info: jnp.ndarray,  # (3,)
    feat_h: int,
    feat_w: int,
    positive_overlap: float = 0.7,
    negative_overlap: float = 0.3,
    fg_fraction: float = 0.5,
    rpn_batchsize: int = 300,
    dontcare_hi: float = 0.5,
    inside_weights=(0.0, 1.0, 0.0, 1.0),
    clobber_positives: bool = False,
    preclude_hard: bool = True,
    ohem: bool = False,
) -> AnchorTargets:
    anchors = jnp.asarray(shifted_anchors(feat_h, feat_w))  # (K, 4)
    k = anchors.shape[0]
    im_h, im_w = im_info[0], im_info[1]

    inside = (
        (anchors[:, 0] >= 0)
        & (anchors[:, 1] >= 0)
        & (anchors[:, 2] < im_w)
        & (anchors[:, 3] < im_h)
    )

    # IoU vs padded gt; invalid gt columns forced to 0 so they never match
    overlaps = pairwise_iou(anchors, gt_boxes)  # (K, G)
    overlaps = jnp.where(gt_valid[None, :] & inside[:, None], overlaps, 0.0)

    argmax_gt = jnp.argmax(overlaps, axis=1)  # (K,)
    max_overlap = jnp.max(overlaps, axis=1)  # (K,)
    gt_max = jnp.max(overlaps, axis=0)  # (G,)
    # every anchor achieving some valid gt's max IoU becomes fg
    # (mirror of np.where(overlaps == gt_max_overlaps)[0]; guard gt_max>0
    # so empty/degenerate gt columns don't mark anchors)
    is_gt_argmax = jnp.any(
        (overlaps == gt_max[None, :]) & gt_valid[None, :] & (gt_max[None, :] > 0.0),
        axis=1,
    )

    neg = max_overlap < negative_overlap
    pos = is_gt_argmax | (max_overlap >= positive_overlap)

    labels = jnp.full((k,), -1, dtype=jnp.int32)
    if not clobber_positives:
        labels = jnp.where(inside & neg, 0, labels)
        labels = jnp.where(inside & pos, 1, labels)
    else:
        labels = jnp.where(inside & pos, 1, labels)
        labels = jnp.where(inside & neg, 0, labels)

    # dontcare masking: summed intersection fraction over dontcare areas
    dc_frac = pairwise_intersection_frac(dontcare, anchors)  # (D, K)
    dc_frac = jnp.where(dontcare_valid[:, None], dc_frac, 0.0)
    dc_sum = jnp.sum(dc_frac, axis=0)
    labels = jnp.where(inside & (dc_sum > dontcare_hi), -1, labels)

    if preclude_hard:
        hard_valid = gt_valid & gt_ishard
        hard_overlaps = jnp.where(
            hard_valid[None, :] & inside[:, None], overlaps, 0.0
        )  # reuse: overlaps already computed vs all gt
        hard_max = jnp.max(hard_overlaps, axis=1)  # (K,)
        labels = jnp.where(inside & (hard_max >= positive_overlap), -1, labels)
        # each hard gt's best anchor is excluded too
        hard_argmax = jnp.argmax(hard_overlaps, axis=0)  # (G,)
        hard_hits = (
            jnp.zeros((k,), dtype=jnp.int32)
            .at[hard_argmax]
            .add(hard_valid.astype(jnp.int32), mode="drop")
            > 0
        )
        labels = jnp.where(hard_hits & inside, -1, labels)

    # subsample fg to num_fg, then bg to fill rpn_batchsize
    num_fg_cap = int(fg_fraction * rpn_batchsize)
    rng_fg, rng_bg = jax.random.split(rng)
    fg = labels == 1
    fg_kept = _sample_to_cap(rng_fg, fg, num_fg_cap)
    labels = jnp.where(fg & ~fg_kept, -1, labels)

    num_fg = jnp.sum(fg_kept.astype(jnp.int32))
    if not ohem:
        num_bg_cap = rpn_batchsize - num_fg
        bg = labels == 0
        bg_kept = _sample_to_cap(rng_bg, bg, num_bg_cap)
        labels = jnp.where(bg & ~bg_kept, -1, labels)
    # else: online hard example mining — every negative stays labeled 0 and
    # the LOSS selects the (rpn_batchsize - num_fg) hardest by their current
    # cross-entropy (training/loss.py::ctpn_loss ohem_batchsize). The
    # reference accepts build_loss(ohem=...) but never implements it
    # (`lib/networks/network.py:376`, `TRAIN.OHEM` in text.yml) — this makes
    # the flag real, replacing random bg subsampling with hardest-first.

    # regression targets for every inside anchor vs its argmax gt
    matched_gt = gt_boxes[argmax_gt]
    targets = bbox_transform(anchors, matched_gt)
    targets = jnp.where(inside[:, None], targets, 0.0).astype(jnp.float32)

    iw = jnp.asarray(inside_weights, dtype=jnp.float32)
    bbox_inside = jnp.where((labels == 1)[:, None], iw[None, :], 0.0)
    pos_w = jnp.ones((4,), jnp.float32)
    neg_w = jnp.zeros((4,), jnp.float32)
    bbox_outside = jnp.where(
        (labels == 1)[:, None],
        pos_w[None, :],
        jnp.where((labels == 0)[:, None], neg_w[None, :], 0.0),
    )

    a = NUM_ANCHORS
    return AnchorTargets(
        labels=labels.reshape(feat_h, feat_w, a),
        bbox_targets=targets.reshape(feat_h, feat_w, a * 4),
        bbox_inside_weights=bbox_inside.reshape(feat_h, feat_w, a * 4),
        bbox_outside_weights=bbox_outside.reshape(feat_h, feat_w, a * 4),
    )


def anchor_target_batched(rng, gt_boxes, gt_valid, gt_ishard, dontcare,
                          dontcare_valid, im_info, feat_h, feat_w, **kw):
    """vmap over batch; rng is split per image."""
    n = gt_boxes.shape[0]
    rngs = jax.random.split(rng, n)
    fn = functools.partial(anchor_target_layer, feat_h=feat_h, feat_w=feat_w, **kw)
    return jax.vmap(fn)(
        rngs, gt_boxes, gt_valid, gt_ishard, dontcare, dontcare_valid, im_info
    )
