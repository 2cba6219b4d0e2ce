"""Fused Pallas NMS: bitmask build + greedy resolve in ONE kernel pass.

Replaces the two-phase pipeline (`ops/nms_pallas.py` bitmask build to HBM +
`ops/nms.py::nms_fixed_point_blocked` resolve) for the hot proposal path.
The reference analogue is the CUDA kernel + host merge
(`lib/utils/nms_kernel.cu:34-139`); this design goes further than a port:

* **Block-sequential greedy on device.** Boxes (score-sorted) are processed
  in blocks over a sequential TPU grid. Each block first collects
  suppression from already-KEPT earlier boxes (chunked (B, B) IoU sweeps on
  the VPU — only kept boxes suppress, so nothing is ever written to HBM but
  the final keep flags), then resolves itself exactly with a sub-block
  sweep scheme (after k sweeps the first k boxes of a sub-block are final —
  SUB sweeps of a (SUB, SUB) relation are exact).
* **Early exit.** Greedy keep status depends only on EARLIER kept boxes, so
  once ``max_keep`` boxes are kept every later block can be dropped without
  changing the first ``max_keep`` survivors — exactly what the proposal
  layer consumes (top ``RPN_POST_NMS_TOP_N``). With 12k candidates and a
  1000-box budget this usually skips >80% of all pairwise work, which the
  two-phase design must always pay.

Output is bit-identical to the greedy oracle (tested against ``py_nms``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 32  # sub-block width of the exact in-block resolve


def _iou_supp(rows: jnp.ndarray, cols: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """(R, C) bool: IoU(row_i, col_j) >= thresh and both valid.

    rows/cols are (8, R)/(8, C) transposed box blocks (x1, y1, x2, y2, valid).
    Divide-free compare; +1 pixel areas (reference convention).
    """
    ix1, iy1, ix2, iy2, iv = rows[0], rows[1], rows[2], rows[3], rows[4]
    jx1, jy1, jx2, jy2, jv = cols[0], cols[1], cols[2], cols[3], cols[4]
    iw = (
        jnp.minimum(ix2[:, None], jx2[None, :])
        - jnp.maximum(ix1[:, None], jx1[None, :])
        + 1.0
    )
    ih = (
        jnp.minimum(iy2[:, None], jy2[None, :])
        - jnp.maximum(iy1[:, None], jy1[None, :])
        + 1.0
    )
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    area_i = (ix2 - ix1 + 1.0) * (iy2 - iy1 + 1.0)
    area_j = (jx2 - jx1 + 1.0) * (jy2 - jy1 + 1.0)
    union = jnp.maximum(area_i[:, None] + area_j[None, :] - inter, 1e-10)
    return (
        (inter >= thresh * union)
        & (iv[:, None] > 0.5)
        & (jv[None, :] > 0.5)
    )


def _fused_kernel(
    rows_ref,  # (1, 1, 8, B): this block's boxes
    cols_ref,  # (1, nb, 8, B): the whole image's boxes
    keep_ref,  # (1, nb, 1, B) f32 out: keep flags, persists across b steps
    count_ref,  # SMEM (1,) int32: kept-so-far
    *,
    thresh: float,
    max_keep: int,
    nb: int,
    block: int,
):
    b = pl.program_id(1)

    @pl.when(b == 0)
    def _():
        count_ref[0] = 0

    live = count_ref[0] < max_keep

    @pl.when(live)
    def _():
        rows = rows_ref[0, 0]  # (8, B)
        base_valid = rows[4] > 0.5

        # -- suppression by kept boxes of earlier blocks (score order) -----
        def chunk(c, ext):
            cols = cols_ref[0, c]  # (8, B)
            kept_c = keep_ref[0, c, 0]  # (B,) f32 0/1
            over = _iou_supp(rows, cols, thresh)  # row i supp'd by col j
            hit = jnp.max(
                jnp.where(kept_c[None, :] > 0.5,
                          over.astype(jnp.float32), 0.0),
                axis=1,
            )
            return jnp.maximum(ext, hit)

        # dynamic bound: only the b earlier blocks can hold kept suppressors
        ext = jax.lax.fori_loop(
            0, b, chunk, jnp.zeros((block,), jnp.float32)
        )

        # -- exact in-block greedy via sequential SUB-wide sub-blocks ------
        # Mosaic-friendly scheme: never place a SUB-wide piece back into a
        # full-width vector (dynamic_update_slice / concatenate do not
        # lower); instead accumulate suppression full-width. A box is kept
        # iff it is valid and nothing earlier-kept suppresses it, so the
        # final keep flags fall out of the accumulator directly.
        supp = _iou_supp(rows, rows, thresh)  # (B, B); i==j handled below
        suppf = supp.astype(jnp.float32)
        tri = (
            jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
            > jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
        )
        # greedy-order mask for full-width row hits: row (global in-block
        # index lo+i) suppresses column j only when j > lo+i
        row_i = jax.lax.broadcasted_iota(jnp.int32, (SUB, block), 0)
        col_j = jax.lax.broadcasted_iota(jnp.int32, (SUB, block), 1)
        supp_acc = ext  # (B,) suppression by kept boxes seen so far
        for s in range(block // SUB):  # static unroll: static lane slices
            lo = s * SUB
            base_s = base_valid[lo:lo + SUB] & (supp_acc[lo:lo + SUB] < 0.5)
            local = jnp.where(
                tri, suppf[lo:lo + SUB, lo:lo + SUB], 0.0
            )  # i suppresses j only for i < j

            def sweep(act):
                hit = jnp.max(
                    jnp.where(act[:, None] > 0.5, local, 0.0), axis=0
                )
                return jnp.where(base_s, (hit < 0.5).astype(jnp.float32), 0.0)

            # After k sweeps the first k boxes are final => SUB sweeps are
            # always exact. Any fixed point equals the greedy solution (the
            # greedy recurrence has a unique solution by induction on j), so
            # stop as soon as a sweep changes nothing — typically 3-8 sweeps
            # instead of SUB.
            def sweep_cond(state):
                t, act, prev_changed = state
                return (t < SUB) & prev_changed

            def sweep_body(state):
                t, act, _ = state
                nxt = sweep(act)
                changed = jnp.any(nxt != act)
                return t + 1, nxt, changed

            _, act, _ = jax.lax.while_loop(
                sweep_cond,
                sweep_body,
                (jnp.int32(0), base_s.astype(jnp.float32), jnp.bool_(True)),
            )
            # fold this sub's kept boxes into the full-width accumulator
            # (order mask keeps it exact for both in-sub and later columns)
            hit_full = jnp.max(
                jnp.where(
                    (act[:, None] > 0.5) & (col_j > lo + row_i),
                    suppf[lo:lo + SUB, :],
                    0.0,
                ),
                axis=0,
            )
            supp_acc = jnp.maximum(supp_acc, hit_full)

        kept = jnp.where(
            base_valid, (supp_acc < 0.5).astype(jnp.float32), 0.0
        )
        keep_ref[0, b, 0] = kept
        count_ref[0] = count_ref[0] + jnp.sum(kept).astype(jnp.int32)

    @pl.when(jnp.logical_not(live))
    def _():
        # all max_keep survivors already found; later boxes are never read
        keep_ref[0, b, 0] = jnp.zeros((block,), jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("thresh", "max_keep", "block", "interpret")
)
def nms_keep_sorted_fused(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    thresh: float,
    max_keep: Optional[int] = None,
    block: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Batched greedy-NMS keep mask, boxes pre-sorted by score descending.

    boxes: (batch, K, 4) f32; valid: (batch, K) bool.
    Returns keep (batch, K) bool — identical to the greedy oracle for the
    first ``max_keep`` survivors of each image (all survivors if None).
    """
    if interpret is None:  # run anywhere: emulate the kernel off-TPU
        interpret = jax.default_backend() != "tpu"
    batch, k = boxes.shape[0], boxes.shape[1]
    nb = (k + block - 1) // block
    kp = nb * block
    if max_keep is None or max_keep <= 0:
        max_keep = kp

    bt = jnp.zeros((batch, 8, kp), dtype=jnp.float32)
    bt = bt.at[:, 0:4, :k].set(jnp.swapaxes(boxes, 1, 2).astype(jnp.float32))
    bt = bt.at[:, 4, :k].set(valid.astype(jnp.float32))
    bt4 = jnp.swapaxes(bt.reshape(batch, 8, nb, block), 1, 2)  # (batch,nb,8,B)

    keep = pl.pallas_call(
        functools.partial(
            _fused_kernel,
            thresh=float(thresh),
            max_keep=int(max_keep),
            nb=nb,
            block=block,
        ),
        grid=(batch, nb),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 8, block),
                lambda n, b: (n, b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nb, 8, block),
                lambda n, b: (n, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, nb, 1, block),
            lambda n, b: (n, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, nb, 1, block), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(bt4, bt4)

    return keep.reshape(batch, kp)[:, :k] > 0.5
