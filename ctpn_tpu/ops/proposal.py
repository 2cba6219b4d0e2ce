"""On-device proposal decoding (the reference's `proposal_layer`).

Fixed-shape re-design of `lib/rpn_msr/proposal_layer_tf.py:14-157`, which the
reference runs on the host through `tf.py_func` every step. Pipeline, kept
semantically identical:

1. decode all H*W*A anchors with the y/h-only ``bbox_transform_inv``;
2. clip to the (dynamic) true image extent inside the padded bucket;
3. min-size filter (``>= RPN_MIN_SIZE * im_scale`` on both sides) — as a
   validity mask instead of a gather (`proposal_layer_tf.py:120,160-165`);
4. score-sort, keep top ``RPN_PRE_NMS_TOP_N``;
5. greedy NMS at ``RPN_NMS_THRESH``;
6. keep top ``RPN_POST_NMS_TOP_N`` survivors.

Output is a fixed-size (post_nms_top_n, 5) [score, x1, y1, x2, y2] block — the
same record layout as the reference's blob (`proposal_layer_tf.py:155`) — plus
a validity mask. Padding slots hold score -1 so downstream score-threshold
masks (> 0.7) drop them naturally.

Anchors outside the padded region of a bucket (rows/cols beyond the true
image) decode from real head outputs but are clipped into the image and then
removed by the min-size mask only if degenerate — to match the reference,
which never sees padded pixels, callers additionally mask anchors whose cell
lies outside the true feature extent (``cell_mask`` below).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ctpn_tpu.ops.anchors import FEAT_STRIDE, NUM_ANCHORS, shifted_anchors
from ctpn_tpu.ops.boxes import bbox_transform_inv, box_sizes, clip_boxes
from ctpn_tpu.ops.nms import nms_keep_sorted


class Proposals(NamedTuple):
    rois: jnp.ndarray  # (post_n, 5) [score, x1, y1, x2, y2]
    valid: jnp.ndarray  # (post_n,) bool
    count: jnp.ndarray  # () int32


def proposal_layer(
    cls_prob: jnp.ndarray,
    bbox_pred: jnp.ndarray,
    im_info: jnp.ndarray,
    pre_nms_top_n: int = 12000,
    post_nms_top_n: int = 1000,
    nms_thresh: float = 0.7,
    min_size: int = 8,
    use_pallas: Optional[bool] = None,
) -> Proposals:
    """Decode one image's head outputs into scored proposals.

    cls_prob:  (H, W, A) fg probabilities
    bbox_pred: (H, W, A*4) regression deltas
    im_info:   (3,) [true_h, true_w, scale] — dynamic values within the
               static padded bucket shape.
    """
    fh, fw, a = cls_prob.shape
    assert a == NUM_ANCHORS
    anchors = jnp.asarray(shifted_anchors(fh, fw))  # (K, 4) static constant
    k = fh * fw * a

    scores = cls_prob.reshape(k)
    deltas = bbox_pred.reshape(k, 4)
    im_h, im_w, im_scale = im_info[0], im_info[1], im_info[2]

    boxes = bbox_transform_inv(anchors, deltas)
    boxes = clip_boxes(boxes, im_h, im_w)

    # min-size filter (reference `_filter_boxes`)
    ws, hs = box_sizes(boxes)
    min_sz = min_size * im_scale
    valid = (ws >= min_sz) & (hs >= min_sz)

    # anchors whose grid cell lies beyond the true image extent see padded
    # pixels the reference never evaluates; drop them for parity
    cell_y = (jnp.arange(k) // (fw * a)) * FEAT_STRIDE
    cell_x = ((jnp.arange(k) // a) % fw) * FEAT_STRIDE
    valid &= (cell_y < im_h) & (cell_x < im_w)

    # sort by score desc (ties: descending index, matching argsort()[::-1]),
    # invalid rows pushed to the end. A multi-operand lax.sort carries the
    # box columns as payload — an argsort + gathers formulation offloads the
    # (K, 4) gathers to SparseCore on v5e, which profiled ~4x slower than
    # sorting the payload in place.
    sort_scores = jnp.where(valid, scores, -jnp.inf)
    s_key, s_x1, s_y1, s_x2, s_y2, s_valid = jax.lax.sort(
        (sort_scores, boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3],
         valid),
        dimension=0,
        is_stable=True,
        num_keys=1,
    )
    # ascending stable + flip == descending with ties toward larger index
    lo = max(k - pre_nms_top_n, 0)
    top_boxes = jnp.flip(
        jnp.stack([s_x1[lo:], s_y1[lo:], s_x2[lo:], s_y2[lo:]], axis=1),
        axis=0,
    )
    # kept rows are always valid, where sort key == raw score; invalid rows'
    # raw scores are never consumed downstream
    top_scores = jnp.flip(s_key[lo:])
    top_valid = jnp.flip(s_valid[lo:])

    keep = nms_keep_sorted(
        top_boxes, top_valid, nms_thresh, use_pallas, max_keep=post_nms_top_n
    )

    # compact survivors (sorted order preserved) into post_nms_top_n slots
    n = keep.shape[0]
    key = jnp.where(keep, jnp.arange(n), n + jnp.arange(n))
    compact = jnp.argsort(key)
    if post_nms_top_n > n:  # fewer candidates than output slots: pad gather
        compact = jnp.concatenate(
            [compact, jnp.zeros((post_nms_top_n - n,), dtype=compact.dtype)]
        )
    compact = compact[:post_nms_top_n]
    count = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), post_nms_top_n)
    slot_valid = jnp.arange(post_nms_top_n) < count

    out_boxes = jnp.where(slot_valid[:, None], top_boxes[compact], 0.0)
    out_scores = jnp.where(slot_valid, top_scores[compact], -1.0)
    rois = jnp.concatenate([out_scores[:, None], out_boxes], axis=1)
    return Proposals(rois=rois, valid=slot_valid, count=count)


def proposal_layer_batched(
    cls_prob: jnp.ndarray,
    bbox_pred: jnp.ndarray,
    im_info: jnp.ndarray,
    **kw,
) -> Proposals:
    """vmap over the batch axis: (N,H,W,A), (N,H,W,A*4), (N,3)."""
    fn = functools.partial(proposal_layer, **kw)
    return jax.vmap(fn)(cls_prob, bbox_pred, im_info)
