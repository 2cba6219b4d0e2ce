"""Fused Pallas "stem" kernel: VGG block 1 (conv1_1+ReLU+conv1_2+ReLU+pool).

Why: block 1 is the trunk's bandwidth hog — at 608x912 the conv1 activation
is 64 channels at FULL resolution (~71 MB/image bf16), and the stock XLA
lowering round-trips it through HBM twice (conv1_1 -> HBM -> conv1_2 -> HBM
-> pool), ~13 ms/batch8 measured on v5e — while the whole block is only
~0.35 TFLOP. This kernel keeps the conv1 activation strip-resident in VMEM
and writes ONLY the pooled (H/2, W/2, 64) output to HBM.

Design (row-strip grid, everything MXU-shaped):

* The host-side wrapper computes 3x3 im2col patches of the (mean-subtracted)
  image with XLA (`lax.conv_general_dilated_patches`, 27 features — cheap:
  the *input* is only 3 channels), padded so patch row/col k is the conv
  window centered at image row/col k-1.
* conv1_1 then is a single K=27 matmul per strip; conv1_2 is nine K=64 tap
  matmuls over static slices of the strip-resident conv1 activation (full
  output width each — Mosaic requires the merged leading dims of a 3D dot to
  stay tileable, so taps slide by column offset, never shrink); the 2x2/2
  max-pool is two reshape+max steps. All shapes static.
* The row halo (conv1_2 needs conv1 rows [r-1, r+TH+1) to emit rows
  [r, r+TH)) is fetched WITHOUT materializing shifted copies: the same
  patches buffer is passed twice with different BlockSpecs — a (TH)-row main
  block at row-block index i and a 2-row tail block at row-block index
  (i+1)*TH/2 — and concatenated along the (untiled) leading axis in-kernel.
* conv1 outputs centered outside the image (the SAME-padding ring) must act
  as zeros for conv1_2 (TF SAME semantics, `lib/networks/network.py:176-180`);
  with a conv bias they would otherwise be relu(bias + partial-window dot).
  The ring is zeroed with two broadcastable iota masks — (TH+2,1,1) rows x
  (1,W+2,1) cols — which cost no materialized full-size mask.

Numerics: bf16 operands, f32 accumulation via ``preferred_element_type`` —
same contraction precision as the XLA conv path; sums are merely
reassociated (im2col K=27 vs feature-group accumulation), so results match
the stock path to bf16 resolution (tested in tests/test_stem.py).

Replaces the hot part of the reference's conv stack entry
(`lib/networks/VGGnet_train.py:28-30` — conv1_1/conv1_2/pool1).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8  # strip height; every bucket height (multiple of 16) divides


def _stem_kernel(
    main_ref,  # (1, TH, W+2, 27) bf16: patch rows [r, r+TH), centers r-1..
    tail_ref,  # (1, 2, W+2, 27) bf16: patch rows [r+TH, r+TH+2)
    w1_ref,  # (27, 64) bf16
    b1_ref,  # (1, 64) f32
    w2_ref,  # (3, 3, 64, 64) bf16
    b2_ref,  # (1, 64) f32
    out_ref,  # (1, TH//2, W//2, 64) bf16
    *,
    w: int,
    h: int,
    ch: int,
):
    i = pl.program_id(1)

    # (TH+2, W+2, 27); strip row j = center r-1+j, col c = center c-1
    xin = jnp.concatenate([main_ref[0], tail_ref[0]], axis=0)

    # conv1_1 as one K=27 matmul
    y1 = jax.lax.dot_general(
        xin,
        w1_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y1 = jnp.maximum(y1 + b1_ref[0], 0.0)

    # zero the SAME-padding ring (centers outside the image)
    grow = i * TH - 1 + jax.lax.broadcasted_iota(jnp.int32, (TH + 2, 1, 1), 0)
    gcol = -1 + jax.lax.broadcasted_iota(jnp.int32, (1, w + 2, 1), 1)
    y1 = jnp.where((grow >= 0) & (grow < h), y1, 0.0)
    y1 = jnp.where((gcol >= 0) & (gcol < w), y1, 0.0).astype(jnp.bfloat16)

    # conv1_2: nine K=64 tap matmuls over static full-width slices
    acc = jnp.zeros((TH, w, ch), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            acc += jax.lax.dot_general(
                y1[ky : ky + TH, kx : kx + w, :],
                w2_ref[ky, kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    y2 = jnp.maximum(acc + b2_ref[0], 0.0).astype(jnp.bfloat16)

    # 2x2/2 max-pool via reshape+max (leading split, then sublane split)
    p = jnp.max(y2.reshape(TH // 2, 2, w, ch), axis=1)
    p = jnp.max(p.reshape(TH // 2, w // 2, 2, ch), axis=2)
    out_ref[0] = p


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_stem_block(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """(N, H, W, 3) float -> (N, H/2, W/2, 64) bf16; H % 16 == 0, W % 8 == 0.

    Exactly relu(conv(relu(conv(x, w1)+b1), w2)+b2) |> maxpool2x2, with bf16
    operands / f32 accumulation.
    """
    if interpret is None:  # run anywhere: emulate the kernel off-TPU
        interpret = jax.default_backend() != "tpu"
    n, h, w, cin = x.shape
    ch = w2.shape[-1]
    if h % TH or w % 8:
        raise ValueError(f"stem geometry must have H%{TH}==0, W%8==0; got {h}x{w}")

    # im2col patches, feature order (cin, ky, kx); row/col k centers at k-1
    pp = jax.lax.conv_general_dilated_patches(
        x.astype(jnp.bfloat16),
        (3, 3),
        (1, 1),
        padding=((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (N, H+2, W+2, cin*9)
    w1m = (
        w1.astype(jnp.bfloat16).transpose(2, 0, 1, 3).reshape(cin * 9, ch)
    )  # match the (cin, ky, kx) patch feature order

    grid = (n, h // TH)
    kernel = functools.partial(_stem_kernel, w=w, h=h, ch=ch)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, TH, w + 2, cin * 9),
                lambda nn_, i: (nn_, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2, w + 2, cin * 9),
                lambda nn_, i: (nn_, (i + 1) * TH // 2, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH // 2, w // 2, ch),
            lambda nn_, i: (nn_, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w // 2, ch), jnp.bfloat16),
        # the 27-feature patch tensors are lane-padded 27->128 in VMEM, which
        # inflates the working set past the conservative 16M scoped default;
        # v5e VMEM has headroom (measured need: ~21M at 912-wide buckets)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=28 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        pp,
        pp,
        w1m,
        b1.astype(jnp.float32).reshape(1, ch),
        w2.astype(jnp.bfloat16),
        b2.astype(jnp.float32).reshape(1, ch),
    )
    return out
