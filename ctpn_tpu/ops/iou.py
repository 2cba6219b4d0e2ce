"""Pairwise IoU / intersection kernels (vectorized; +1 pixel convention).

TPU-native replacements for the reference Cython kernels:

* :func:`pairwise_iou`               ~ ``bbox_overlaps`` (`lib/utils/bbox.pyx:15-55`)
* :func:`pairwise_intersection_frac` ~ ``bbox_intersections`` (`lib/utils/bbox.pyx:57-94`)

The reference runs these on the host (Cython double loops) in the middle of
every training step via ``tf.py_func``. Here they are pure ``jnp`` broadcast
ops that fuse into the surrounding jit program; for the anchor-target N×G
problem size (≈22k × 512) the dense form is a few MB and XLA handles it well
on the VPU, so no Pallas kernel is needed at this size.
"""

from __future__ import annotations

import jax.numpy as jnp


def _sizes(b):
    return b[..., 2] - b[..., 0] + 1.0, b[..., 3] - b[..., 1] + 1.0


def pairwise_intersection(boxes: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """(N, K) intersection areas with the +1 convention; negative overlap -> 0.

    The reference computes ``iw = min(x2) - max(x1) + 1`` and skips the pair
    when ``iw <= 0`` (`bbox.pyx:39-48`); clamping at zero is equivalent.
    """
    iw = (
        jnp.minimum(boxes[:, None, 2], query[None, :, 2])
        - jnp.maximum(boxes[:, None, 0], query[None, :, 0])
        + 1.0
    )
    ih = (
        jnp.minimum(boxes[:, None, 3], query[None, :, 3])
        - jnp.maximum(boxes[:, None, 1], query[None, :, 1])
        + 1.0
    )
    return jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)


def pairwise_iou(boxes: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """(N, K) IoU between ``boxes`` (N,4) and ``query`` (K,4)."""
    inter = pairwise_intersection(boxes, query)
    bw, bh = _sizes(boxes)
    qw, qh = _sizes(query)
    union = bw[:, None] * bh[:, None] + qw[None, :] * qh[None, :] - inter
    return inter / jnp.maximum(union, 1e-10)


def pairwise_intersection_frac(boxes: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """(N, K) intersection normalized by the QUERY box area.

    Matches ``bbox_intersections`` (`bbox.pyx:57-94`): used for dontcare-area
    masking where the normalizer is the query (anchor) area.
    """
    inter = pairwise_intersection(boxes, query)
    qw, qh = _sizes(query)
    return inter / jnp.maximum(qw[None, :] * qh[None, :], 1e-10)
