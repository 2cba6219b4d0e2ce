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

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for block, reps, ch in self.stages:
            if block == 1 and self.fused_stem and reps == 2:
                x = self._fused_block1(x, ch)
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

    def _fused_block1(self, x: jnp.ndarray, ch: int) -> jnp.ndarray:
        from ctpn_tpu.ops.stem_pallas import fused_stem_block

        w1, b1 = _ConvParams(
            ch, x.shape[-1], self.param_dtype, name="conv1_1"
        )()
        w2, b2 = _ConvParams(ch, ch, self.param_dtype, name="conv1_2")()
        return fused_stem_block(x, w1, b1, w2, b2).astype(self.dtype)
