"""Pallas TPU kernel for the NMS suppression bitmask.

TPU-native port of the idea in the reference CUDA kernel
(`lib/utils/nms_kernel.cu:34-78`): tile the N x N "box i suppresses box j"
relation and emit packed bitmasks. Differences from the CUDA design, driven
by TPU hardware:

* Tiles are (TI, TJ) VPU-shaped blocks (default 256 x 2048, set by
  ``cfg.TPU.NMS_TILE`` / ``cfg.TPU.NMS_TILE_J``) instead of 64-thread
  blocks; IoU for the whole tile is one broadcast expression on the VPU,
  with a divide-free threshold (``inter >= t * union``).
* Bit packing cannot shuffle lanes cheaply on the VPU, so bits are packed
  with an MXU matmul: ``supp_f32 @ P`` where ``P[k, w] = 2^(k % 16)`` for
  ``k // 16 == w`` — halfword values <= 65535 are exactly representable in
  f32 (< 2^24). The caller combines halfword pairs into uint32 words with
  one cheap XLA pass. Packing to 16-bit halves both the packing FLOPs and
  the kernel's HBM output traffic vs byte packing.
* The sequential host-side mask merge of the reference
  (`nms_kernel.cu:124-139`) is replaced by the block-sequential resolve in
  `ctpn_tpu/ops/nms.py::nms_fixed_point_blocked` — fully on device.

Boxes are passed transposed as an (8, N) f32 array (rows x1,y1,x2,y2,valid)
so the lane dimension is N — the natural TPU layout for per-box scalars.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PACK = 16  # bits per packed halfword
BITS_PER_WORD = 32


def _default_tiles() -> tuple:
    from ctpn_tpu.config import cfg

    return int(cfg.TPU.NMS_TILE), int(cfg.TPU.NMS_TILE_J)


@functools.lru_cache(maxsize=8)
def _pack_matrix(tj: int) -> np.ndarray:
    """(TJ, TJ/16) f32: column w collects bits 16w..16w+15, weights 2^b."""
    p = np.zeros((tj, tj // PACK), dtype=np.float32)
    for k in range(tj):
        p[k, k // PACK] = float(1 << (k % PACK))
    return p


def _bitmask_kernel(
    boxes_i_ref, boxes_j_ref, pack_ref, out_ref, *,
    thresh: float, tile_i: int, tile_j: int,
):
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    # a tile can only carry bits when some col index j exceeds some row i
    tile_live = (bj * tile_j + tile_j - 1) > (bi * tile_i)

    @pl.when(tile_live)
    def _():
        bx = boxes_i_ref[:]  # (8, tile_i)
        by = boxes_j_ref[:]  # (8, tile_j)
        ix1, iy1, ix2, iy2, ivalid = bx[0], bx[1], bx[2], bx[3], bx[4]
        jx1, jy1, jx2, jy2, jvalid = by[0], by[1], by[2], by[3], by[4]

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
        # divide-free threshold (same form as the jnp builder): t * union
        over = inter >= thresh * union

        row_g = bi * tile_i + jax.lax.broadcasted_iota(
            jnp.int32, (tile_i, tile_j), 0
        )
        col_g = bj * tile_j + jax.lax.broadcasted_iota(
            jnp.int32, (tile_i, tile_j), 1
        )
        supp = (
            over
            & (col_g > row_g)
            & (ivalid[:, None] > 0.5)
            & (jvalid[None, :] > 0.5)
        )
        half_f = jnp.dot(
            supp.astype(jnp.float32), pack_ref[:], preferred_element_type=jnp.float32
        )  # (tile_i, tile_j/16), exact halfword values
        out_ref[:] = half_f.astype(jnp.int32)

    @pl.when(jnp.logical_not(tile_live))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)


@functools.partial(
    jax.jit, static_argnames=("thresh", "tile_i", "tile_j", "interpret")
)
def _bitmask_pallas(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    thresh: float,
    tile_i: int,
    tile_j: int,
    interpret: bool = False,
) -> jnp.ndarray:
    n = boxes.shape[0]
    n_pad = ((n + tile_j - 1) // tile_j) * tile_j
    bt = jnp.zeros((8, n_pad), dtype=jnp.float32)
    bt = bt.at[0:4, :n].set(boxes.T.astype(jnp.float32))
    bt = bt.at[4, :n].set(valid.astype(jnp.float32))

    pack = jnp.asarray(_pack_matrix(tile_j))

    halves_i32 = pl.pallas_call(
        functools.partial(
            _bitmask_kernel, thresh=float(thresh), tile_i=tile_i, tile_j=tile_j
        ),
        grid=(n_pad // tile_i, n_pad // tile_j),
        in_specs=[
            pl.BlockSpec((8, tile_i), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_j), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_j, tile_j // PACK),
                lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_i, tile_j // PACK),
            lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad // PACK), jnp.int32),
        interpret=interpret,
    )(bt, bt, pack)

    # combine halfword pairs -> uint32 (halfword h holds bits 16h..16h+15)
    h = halves_i32.astype(jnp.uint32).reshape(n_pad, n_pad // BITS_PER_WORD, 2)
    words = h[..., 0] | (h[..., 1] << 16)
    w_need = (n + BITS_PER_WORD - 1) // BITS_PER_WORD
    return words[:n, :w_need]


def suppression_bitmask_pallas(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    thresh: float,
    tile_i: int = None,
    tile_j: int = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, ceil(N/32)) uint32 suppression bitmask via the Pallas tile kernel.

    ``boxes`` (N, 4) must be sorted by score descending; ``valid`` (N,) bool.
    Tile sizes default to ``cfg.TPU.NMS_TILE`` x ``cfg.TPU.NMS_TILE_J``.
    """
    d_i, d_j = _default_tiles()
    tile_i = int(tile_i or d_i)
    tile_j = int(tile_j or d_j)
    assert tile_j % PACK == 0 and tile_i % 8 == 0, (tile_i, tile_j)
    return _bitmask_pallas(boxes, valid, thresh, tile_i, tile_j, interpret)
