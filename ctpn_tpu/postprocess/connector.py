"""Vectorized on-device text-line connector (H and O modes).

TPU-native re-design of the reference's sequential graph heuristics
(`lib/text_connector/text_proposal_graph_builder.py`, `other.py`,
`text_proposal_connector*.py`). The reference walks per-column Python lists;
here the whole pipeline is fixed-shape XLA ops over the padded proposal set:

1. **Pairwise candidate matrix** — for N <= ~1000 post-NMS proposals the
   N x N matrix of "j is a successor candidate of i" (vertical IoU >= 0.7,
   size-similarity >= 0.7, 0 < col_j - col_i <= MAX_HORIZONTAL_GAP) is a few
   MB of VPU work — far cheaper than a serial walk on TPU.
2. **Nearest-column rule** — the reference scans columns left-to-right and
   stops at the first hit; equivalently the candidate set is restricted to
   ``col_j == min(candidate cols)`` (and mirrored for precursors).
3. **Mutual-best edges** — best successor by score (ties -> lowest index,
   matching ``np.argmax``), kept iff the source's score >= the best
   precursor score of the target (`text_proposal_graph_builder.py:34-38`).
4. **Chain membership** — the reference walks a chain from EVERY head node
   (no in-edge, has out-edge) to the end of the successor path; when two
   edges point into the same node the tail is walked twice and belongs to
   BOTH lines (`other.py:16-29`). That duplication is load-bearing (it can
   emit two overlapping lines) and no forest labeling can express it, so
   membership is the successor-path reachability matrix R[s, j], computed by
   log2(N) boolean squarings of (I + S) — MXU matmuls, not a serial walk.
5. **Per-chain least squares** — chain sums are rows of ``R @ F`` (one
   matmul for all statistics); x-coordinates are globally centered before
   squaring so the covariance form stays accurate in f32; evaluation and
   record assembly are elementwise.

All stages are mask-carrying and jit/vmap-compatible.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class TextLines(NamedTuple):
    recs: jnp.ndarray  # (max_lines, 9) float32 quadrilateral + score
    valid: jnp.ndarray  # (max_lines,) bool
    count: jnp.ndarray  # () int32


def _pairwise_candidates(boxes, valid, max_gap, min_v_overlaps, min_size_sim):
    """(N, N) bool: j is a successor candidate of i (any gap <= max_gap)."""
    y1, y2 = boxes[:, 1], boxes[:, 3]
    h = y2 - y1 + 1.0
    col = jnp.floor(boxes[:, 0]).astype(jnp.int32)

    inter = (
        jnp.minimum(y2[:, None], y2[None, :])
        - jnp.maximum(y1[:, None], y1[None, :])
        + 1.0
    )
    min_h = jnp.minimum(h[:, None], h[None, :])
    max_h = jnp.maximum(h[:, None], h[None, :])
    v_ov = jnp.maximum(inter, 0.0) / min_h
    sim = min_h / max_h
    meet = (v_ov >= min_v_overlaps) & (sim >= min_size_sim)

    dcol = col[None, :] - col[:, None]  # col_j - col_i
    pairv = valid[:, None] & valid[None, :]
    return meet & pairv & (dcol > 0) & (dcol <= max_gap), col


def build_successors(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    max_gap: int = 50,
    min_v_overlaps: float = 0.7,
    min_size_sim: float = 0.7,
) -> jnp.ndarray:
    """(N,) int32 successor index per node (or -1): the kept graph edges."""
    n = boxes.shape[0]
    cand, col = _pairwise_candidates(
        boxes, valid, max_gap, min_v_overlaps, min_size_sim
    )
    big = jnp.int32(1 << 30)

    # successor side: restrict to nearest candidate column of i
    cand_col = jnp.where(cand, col[None, :], big)
    min_col = jnp.min(cand_col, axis=1)  # (N,)
    succ_sel = cand & (col[None, :] == min_col[:, None])
    has_succ = jnp.any(succ_sel, axis=1)
    succ_scores = jnp.where(succ_sel, scores[None, :], -jnp.inf)
    best_j = jnp.argmax(succ_scores, axis=1).astype(jnp.int32)  # ties -> low idx

    # precursor side: restrict to nearest candidate column of j (from below)
    prec_col = jnp.where(cand, col[:, None], -big)
    max_col = jnp.max(prec_col, axis=0)  # (N,)
    prec_sel = cand & (col[:, None] == max_col[None, :])
    prec_scores = jnp.where(prec_sel, scores[:, None], -jnp.inf)
    prec_best = jnp.max(prec_scores, axis=0)  # (N,)

    edge = has_succ & (scores >= prec_best[best_j])
    return jnp.where(edge, best_j, -1)


def chain_reachability(succ: jnp.ndarray, max_len: int | None = None):
    """Successor-path reachability: R[s, j] = 1 iff j is on the path
    s -> succ[s] -> ... (inclusive of s).

    The reference walks every head node to the end of its path and SHARES
    tails between chains that merge (`other.py:16-29`, oracle
    ``sub_graphs_np``); row s of R is exactly that walk's member set.
    Transitive closure by repeated boolean squaring of (I + S): log2(N)
    (N, N) matmuls on the MXU.

    Returns (R float32 (N, N), is_start bool (N,)) where start nodes have an
    out-edge and no in-edge — one emitted line per start row.

    ``max_len`` (static) bounds the path length and hence the number of
    squarings: every edge advances >= 1 proposal column, so the image's
    16-px column count is a valid bound.
    """
    n = succ.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    has_out = succ >= 0
    edge = (succ[:, None] == idx[None, :]) & has_out[:, None]
    has_in = jnp.any(edge, axis=0)
    # bf16 operands are exact here (0/1 entries, f32 accumulation, counts
    # <= N < 2^24) and run 2x faster on the MXU
    m = (edge | (idx[:, None] == idx[None, :])).astype(jnp.bfloat16)
    bound = min(n, max_len) if max_len else n
    rounds = max(1, math.ceil(math.log2(max(bound, 2))))
    for _ in range(rounds):
        m = (
            jnp.matmul(m, m, preferred_element_type=jnp.float32) > 0.0
        ).astype(jnp.bfloat16)
    return m.astype(jnp.float32), has_out & ~has_in


def _fit(r, cnt, xc, y):
    """Per-chain least squares of y against globally-centered x.

    ``r``: (N, N) membership rows; ``xc``/``y``: (N,) node values. Returns
    (slope, mean_x, mean_y, degenerate) per row; evaluate with
    ``my + slope * (x_eval_c - mx)``. Degenerate = all member x equal
    (the reference then takes the head's y — caller substitutes).
    """
    # full-f32 matmuls: default MXU precision may bf16-truncate the
    # operands, and the subtractive covariance form below cancels most
    # leading digits for chains far from the image center
    dot = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    mx = dot(r, xc) / cnt
    my = dot(r, y) / cnt
    sxx = dot(r, xc * xc) - cnt * mx * mx
    sxy = dot(r, xc * y) - cnt * mx * my
    degenerate = sxx <= 1e-6
    slope = jnp.where(degenerate, 0.0, sxy / jnp.where(degenerate, 1.0, sxx))
    return slope, mx, my, degenerate


def connect_text_lines(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    im_info: jnp.ndarray,
    mode: str = "H",
    max_lines: int = 128,
    max_gap: int = 50,
    min_v_overlaps: float = 0.7,
    min_size_sim: float = 0.7,
    min_ratio: float = 0.5,
    line_min_score: float = 0.9,
    min_width: float = 32.0,
    max_chain_len: int | None = None,
) -> TextLines:
    """Group proposals into text lines and emit 9-float records.

    boxes: (N, 4) proposals (score-sorted or not — grouping is order-free);
    im_info: (3,) [h, w, scale]. ``mode`` "H" (axis-aligned) or "O"
    (oriented), static.
    """
    n = boxes.shape[0]
    succ = build_successors(
        boxes, scores, valid, max_gap, min_v_overlaps, min_size_sim
    )
    r, is_start = chain_reachability(succ, max_chain_len)

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    im_h, im_w = im_info[0], im_info[1]
    cnt = jnp.maximum(r.sum(axis=1), 1.0)
    # globally center x before squaring: keeps the covariance form accurate
    # in f32 (coordinates up to MAX_SCALE, squares up to ~1.4e6)
    xbar = im_w * 0.5
    x1c = x1 - xbar
    member = r > 0.0
    min_x1 = jnp.min(jnp.where(member, x1[None, :], jnp.inf), axis=1)
    max_x2 = jnp.max(jnp.where(member, x2[None, :], -jnp.inf), axis=1)
    mean_score = (r @ scores) / cnt

    # head = row node itself (the first element of the reference's chain)
    head_y1 = y1
    head_y2 = y2
    offset = (x2 - x1) * 0.5  # head proposal half width

    slope_t, mx_t, my_t, deg_t = _fit(r, cnt, x1c, y1)
    slope_b, mx_b, my_b, deg_b = _fit(r, cnt, x1c, y2)

    x_left_c = min_x1 + offset - xbar
    x_right_c = max_x2 - offset - xbar
    lt_y = jnp.where(deg_t, head_y1, my_t + slope_t * (x_left_c - mx_t))
    rt_y = jnp.where(deg_t, head_y1, my_t + slope_t * (x_right_c - mx_t))
    lb_y = jnp.where(deg_b, head_y2, my_b + slope_b * (x_left_c - mx_b))
    rb_y = jnp.where(deg_b, head_y2, my_b + slope_b * (x_right_c - mx_b))

    if mode == "H":
        lx0 = min_x1
        ly0 = jnp.minimum(lt_y, rt_y)
        lx1 = max_x2
        ly1 = jnp.maximum(lb_y, rb_y)
        # reference clips through other.clip_boxes before record assembly
        lx0 = jnp.clip(lx0, 0.0, im_w - 1.0)
        lx1 = jnp.clip(lx1, 0.0, im_w - 1.0)
        ly0 = jnp.clip(ly0, 0.0, im_h - 1.0)
        ly1 = jnp.clip(ly1, 0.0, im_h - 1.0)
        recs = jnp.stack(
            [lx0, ly0, lx1, ly0, lx0, ly1, lx1, ly1, mean_score], axis=1
        )
    elif mode == "O":
        cx = (x1 + x2) * 0.5
        cy = (y1 + y2) * 0.5
        k, mx_c, my_c, deg_c = _fit(r, cnt, cx - xbar, cy)
        height = (r @ (y2 - y1)) / cnt + 2.5

        def center_y(x):
            return jnp.where(deg_c, cy, my_c + k * (x - xbar - mx_c))

        xa, ya = min_x1, center_y(min_x1) - height / 2
        xb, yb = max_x2, center_y(max_x2) - height / 2
        xc, yc = min_x1, center_y(min_x1) + height / 2
        xd, yd = max_x2, center_y(max_x2) + height / 2
        dis_x = xb - xa
        dis_y = yb - ya
        width = jnp.sqrt(dis_x * dis_x + dis_y * dis_y)
        width = jnp.maximum(width, 1e-6)
        f0 = yc - ya
        f1 = f0 * dis_y / width
        ddx = jnp.abs(f1 * dis_x / width)
        ddy = jnp.abs(f1 * dis_y / width)
        neg = k < 0
        xa = jnp.where(neg, xa - ddx, xa)
        ya = jnp.where(neg, ya + ddy, ya)
        xd = jnp.where(neg, xd + ddx, xd)
        yd = jnp.where(neg, yd - ddy, yd)
        xb = jnp.where(neg, xb, xb + ddx)
        yb = jnp.where(neg, yb, yb + ddy)
        xc = jnp.where(neg, xc, xc - ddx)
        yc = jnp.where(neg, yc, yc - ddy)
        recs = jnp.stack([xa, ya, xb, yb, xc, yc, xd, yd, mean_score], axis=1)
    else:  # pragma: no cover
        raise ValueError(f"mode must be 'H' or 'O', got {mode}")

    # a line exists at each chain head
    idx = jnp.arange(n, dtype=jnp.int32)
    is_head = is_start

    # final filter (reference detectors.py:37-49)
    heights_f = (
        jnp.abs(recs[:, 5] - recs[:, 1]) + jnp.abs(recs[:, 7] - recs[:, 3])
    ) / 2.0 + 1.0
    widths_f = (
        jnp.abs(recs[:, 2] - recs[:, 0]) + jnp.abs(recs[:, 6] - recs[:, 4])
    ) / 2.0 + 1.0
    keep = (
        is_head
        & (widths_f / heights_f > min_ratio)
        & (recs[:, 8] > line_min_score)
        & (widths_f > min_width)
    )

    # compact heads (ascending head index = reference emission order)
    key = jnp.where(keep, idx, n + idx)
    order = jnp.argsort(key)
    if max_lines > n:  # fewer proposals than line slots: pad gather indices
        order = jnp.concatenate(
            [order, jnp.zeros((max_lines - n,), dtype=order.dtype)]
        )
    order = order[:max_lines]
    cnt_lines = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), max_lines)
    slot_valid = jnp.arange(max_lines) < cnt_lines
    out = jnp.where(slot_valid[:, None], recs[order], 0.0)
    return TextLines(recs=out.astype(jnp.float32), valid=slot_valid, count=cnt_lines)
