"""Box encode/decode/clip as pure jit-able jnp functions.

Behavioral contracts from the reference:

* ``bbox_transform``      — encode (dx,dy,dw,dh) with the +1-pixel size
  convention (`lib/fast_rcnn/bbox_transform.py:3-34`).
* ``bbox_transform_inv``  — the CTPN-specialized decode: x-center and width
  are NOT regressed; only dy/dh are applied
  (`lib/fast_rcnn/bbox_transform.py:36-65`, esp. `:50-53`).
* ``clip_boxes``          — clamp to ``[0, dim-1]`` (`bbox_transform.py:67-80`).

All functions are shape-polymorphic over leading dims and never filter —
validity is carried by masks computed with :func:`box_sizes`.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_sizes(boxes: jnp.ndarray):
    """Widths/heights with the +1 pixel convention. boxes: (..., 4)."""
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    return w, h


def box_ctrs(boxes: jnp.ndarray):
    w, h = box_sizes(boxes)
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return cx, cy, w, h


def bbox_transform(ex_rois: jnp.ndarray, gt_rois: jnp.ndarray) -> jnp.ndarray:
    """Encode gt boxes relative to example boxes. (..., 4) -> (..., 4).

    Unlike the reference there is no degenerate-box assert (jit cannot
    branch on data); callers mask invalid rows instead. ``gt_rois`` may have
    zero-size padding rows — the log is guarded to stay finite.
    """
    ex_cx, ex_cy, ex_w, ex_h = box_ctrs(ex_rois)
    gt_cx, gt_cy, gt_w, gt_h = box_ctrs(gt_rois)
    eps = 1e-6
    dx = (gt_cx - ex_cx) / ex_w
    dy = (gt_cy - ex_cy) / ex_h
    dw = jnp.log(jnp.maximum(gt_w, eps) / ex_w)
    dh = jnp.log(jnp.maximum(gt_h, eps) / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def bbox_transform_inv(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """CTPN decode: keep anchor x-center/width, apply dy/dh only.

    boxes: (..., 4) anchors; deltas: (..., 4) predicted (dx,dy,dw,dh) of which
    dx/dw are ignored (reference `bbox_transform.py:50-53`).
    """
    cx, cy, w, h = box_ctrs(boxes)
    dy = deltas[..., 1]
    dh = deltas[..., 3]
    pred_cy = dy * h + cy
    pred_h = jnp.exp(dh) * h
    x1 = cx - 0.5 * w
    y1 = pred_cy - 0.5 * pred_h
    x2 = cx + 0.5 * w
    y2 = pred_cy + 0.5 * pred_h
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def clip_boxes(boxes: jnp.ndarray, im_h, im_w) -> jnp.ndarray:
    """Clamp all coordinates into ``[0, im_dim - 1]``.

    ``im_h``/``im_w`` may be traced scalars (true image size inside a padded
    bucket), matching reference `clip_boxes(boxes, im_shape)`.
    """
    x = jnp.clip(boxes[..., 0::2], 0.0, im_w - 1.0)
    y = jnp.clip(boxes[..., 1::2], 0.0, im_h - 1.0)
    out = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], axis=-1)
    return out
