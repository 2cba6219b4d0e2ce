"""VGG16 convolutional trunk (13 convs, 4 pools, stride 16).

Same receptive structure as the reference's layer chain
(`lib/networks/VGGnet_train.py:28-45`): 3x3 SAME convs + ReLU, 2x2/2 VALID
max-pools after blocks 1-4 (block 5 keeps full resolution → total stride 16).

TPU-first details:
* NHWC layout end to end (matches TPU conv layouts; also happens to match
  the reference's TF NHWC, which keeps weight conversion trivial).
* Convs run in a configurable compute dtype (bfloat16 by default) with
  float32 params — the MXU path; XLA fuses the ReLUs into the convolutions.
* The first two conv blocks are optionally frozen by the training loop, as
  the reference does implicitly by loading VGG weights (the reference
  fine-tunes everything; freezing is off by default).
"""

from __future__ import annotations

from typing import Any, Tuple  # noqa: F401 — Tuple used in field annotation

import flax.linen as nn
import jax.numpy as jnp

# (block, reps, channels) for VGG16's conv layers
VGG_STAGES: Tuple[Tuple[int, int, int], ...] = (
    (1, 2, 64),
    (2, 2, 128),
    (3, 3, 256),
    (4, 3, 512),
    (5, 3, 512),
)


class VGG16Trunk(nn.Module):
    """Feature extractor: (N, H, W, 3) -> (N, H/16, W/16, C_out).

    ``stages`` defaults to VGG16; tests substitute a narrow 5-block ladder
    (same stride-16 pooling structure) to keep CPU compile times down.
    """

    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    stages: Tuple[Tuple[int, int, int], ...] = VGG_STAGES

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        for block, reps, ch in self.stages:
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
