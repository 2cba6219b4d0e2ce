"""VGG16 convolutional trunk (13 convs, 4 pools, stride 16).

Same receptive structure as the reference's layer chain
(`lib/networks/VGGnet_train.py:28-45`): 3x3 SAME convs + ReLU, 2x2/2 VALID
max-pools after blocks 1-4 (block 5 keeps full resolution → total stride 16).

TPU-first details:
* NHWC layout end to end (matches TPU conv layouts; also happens to match
  the reference's TF NHWC, which keeps weight conversion trivial).
* Convs run in a configurable compute dtype (bfloat16 by default) with
  float32 params — the MXU path; XLA fuses the ReLUs into the convolutions.
* Block 1 can optionally run through the fused Pallas stem kernel
  (`ops/stem_pallas.py`, gated by ``fused_stem``) — same params, same
  numerics to bf16 resolution. Off by default: on the current DMA-limited
  backend the stock XLA lowering is faster (docs/PERFORMANCE.md).
* Block 1 can alternatively run batch-packed (``packed_stem``): two batch
  images share the channel dimension through block-diagonal weights, so
  the 64-channel convs — half padding per (8,128) bf16 tile on the
  128-lane MXU — move half the HBM bytes. Exact up to bf16 accumulation
  order (the zero blocks kill every cross-image term); measured 1.06x on
  stage 1 (docs/PERFORMANCE.md round 4). Applies only when the batch is
  even (static shape); odd batches fall back to the stock convs.
"""

from __future__ import annotations

from typing import Any, Tuple  # noqa: F401 — Tuple used in field annotation

import flax.linen as nn
import jax
import jax.numpy as jnp

# (block, reps, channels) for VGG16's conv layers
VGG_STAGES: Tuple[Tuple[int, int, int], ...] = (
    (1, 2, 64),
    (2, 2, 128),
    (3, 3, 256),
    (4, 3, 512),
    (5, 3, 512),
)


class _ConvParams(nn.Module):
    """Bare conv parameters under the same scope/names as ``nn.Conv``.

    Lets two compute paths (stock lax conv / fused Pallas stem) share one
    parameter tree — checkpoints and the TF weight converter see the exact
    layout ``nn.Conv`` would create: ``{kernel: (3,3,Cin,Cout), bias: (Cout,)}``.
    """

    features: int
    in_features: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            self.param_dtype,
        )
        return kernel, bias


class VGG16Trunk(nn.Module):
    """Feature extractor: (N, H, W, 3) -> (N, H/16, W/16, C_out).

    ``stages`` defaults to VGG16; tests substitute a narrow 5-block ladder
    (same stride-16 pooling structure) to keep CPU compile times down.
    ``fused_stem`` routes block 1 through the Pallas stem kernel.
    """

    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    stages: Tuple[Tuple[int, int, int], ...] = VGG_STAGES
    fused_stem: bool = False
    packed_stem: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.fused_stem and self.packed_stem:
            raise ValueError("fused_stem and packed_stem are exclusive")
        x = x.astype(self.dtype)
        for block, reps, ch in self.stages:
            if block == 1 and self.fused_stem and reps == 2:
                x = self._fused_block1(x, ch)
                continue
            if (
                block == 1 and self.packed_stem and reps == 2
                and x.shape[0] % 2 == 0
            ):
                x = self._packed_block1(x, ch)
                continue
            for rep in range(1, reps + 1):
                x = nn.Conv(
                    ch,
                    (3, 3),
                    padding="SAME",
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"conv{block}_{rep}",
                )(x)
                x = nn.relu(x)
            if block < 5:  # pools 1-4 only: stride 16 at conv5_3
                x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")
        return x

    def _packed_block1(self, x: jnp.ndarray, ch: int) -> jnp.ndarray:
        """Block 1 with image pairs packed into channels (incl. pool1).

        x[2n], x[2n+1] become one (H, W, 2*Cin) frame; the conv kernels are
        block-diagonal ``[[W, 0], [0, W]]`` built from the SAME shared
        parameters (`_ConvParams` keeps the checkpoint layout identical to
        the stock path). The MXU cycle count is unchanged — the stock conv
        already pads 64 -> 128 lanes and multiplies the padding — but every
        HBM tile is full of real data. Unpack happens after pool1, where
        the tensor is 4x smaller than the conv1_2 activations.
        """
        w1, b1 = _ConvParams(
            ch, x.shape[-1], self.param_dtype, name="conv1_1"
        )()
        w2, b2 = _ConvParams(ch, ch, self.param_dtype, name="conv1_2")()

        def block_diag2(k):
            kh, kw, ci, co = k.shape
            z = jnp.zeros((kh, kw, ci, co), k.dtype)
            return jnp.concatenate(
                [
                    jnp.concatenate([k, z], axis=3),
                    jnp.concatenate([z, k], axis=3),
                ],
                axis=2,
            )

        n, h, w, c = x.shape
        y = x.reshape(n // 2, 2, h, w, c).transpose(0, 2, 3, 1, 4).reshape(
            n // 2, h, w, 2 * c
        )
        for kern, bias in ((w1, b1), (w2, b2)):
            y = jax.lax.conv_general_dilated(
                y,
                block_diag2(kern).astype(self.dtype),
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = nn.relu(y + jnp.tile(bias, 2).astype(self.dtype))
        y = nn.max_pool(y, (2, 2), strides=(2, 2), padding="VALID")
        hh, ww = y.shape[1], y.shape[2]
        return y.reshape(n // 2, hh, ww, 2, ch).transpose(
            0, 3, 1, 2, 4
        ).reshape(n, hh, ww, ch)

    def _fused_block1(self, x: jnp.ndarray, ch: int) -> jnp.ndarray:
        from ctpn_tpu.ops.stem_pallas import fused_stem_block

        w1, b1 = _ConvParams(
            ch, x.shape[-1], self.param_dtype, name="conv1_1"
        )()
        w2, b2 = _ConvParams(ch, ch, self.param_dtype, name="conv1_2")()
        return fused_stem_block(x, w1, b1, w2, b2).astype(self.dtype)
