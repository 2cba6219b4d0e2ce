"""The CTPN detection model: trunk + rpn conv + BiLSTM + anchor heads.

Single model covering both the reference's train/test graphs
(`lib/networks/VGGnet_train.py:20-64`, `VGGnet_test.py:16-55`): the forward
pass produces head tensors; proposal decoding / anchor targeting live in
`ctpn_tpu/ops` as pure functions composed around this module (the reference
wires them into the graph through `tf.py_func` host round-trips — here
everything stays on device inside one jit).

Output contract per image (A = 10 vertical anchors):
* ``bbox_pred``  (N, H, W, A*4) — (dx, dy, dw, dh) per anchor, of which only
  dy/dh are consumed by the decode (`bbox_transform.py:50-53`).
* ``cls_score``  (N, H, W, A*2) — (bg, fg) logits per anchor, channel layout
  [a0_bg, a0_fg, a1_bg, a1_fg, ...] matching the reference's
  spatial_reshape/softmax round-trip (`network.py:269-277,332-337`).
* ``cls_prob``   (N, H, W, A) — fg probability per anchor (softmax over the
  2-way logits; the only slice any consumer reads).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ctpn_tpu.models.rnn import BiLSTM
from ctpn_tpu.models.vgg import VGG16Trunk
from ctpn_tpu.ops.anchors import NUM_ANCHORS


class CTPNOutputs(NamedTuple):
    bbox_pred: jnp.ndarray  # (N, H, W, A*4) float32
    cls_score: jnp.ndarray  # (N, H, W, A*2) float32
    cls_prob: jnp.ndarray  # (N, H, W, A) float32 fg probabilities


class CTPN(nn.Module):
    """CTPN forward network (feature extraction through head tensors)."""

    num_anchors: int = NUM_ANCHORS
    lstm_hidden: int = 128
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    # None -> VGG16; tests pass a narrow ladder for fast CPU compiles
    trunk_stages: Any = None
    rpn_channels: int = 512
    fused_stem: bool = False  # route VGG block 1 through ops/stem_pallas.py
    packed_stem: bool = False  # batch-packed VGG block 1 (even batches)

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> CTPNOutputs:
        """images: (N, H, W, 3) float32, BGR, pixel-mean subtracted."""
        trunk_kw = dict(
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            fused_stem=self.fused_stem,
            packed_stem=self.packed_stem,
        )
        if self.trunk_stages is not None:
            trunk_kw["stages"] = self.trunk_stages
        feat = VGG16Trunk(**trunk_kw)(images)
        rpn = nn.Conv(
            self.rpn_channels,
            (3, 3),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="rpn_conv",
        )(feat)
        rpn = nn.relu(rpn)

        lstm_o = BiLSTM(
            hidden=self.lstm_hidden, d_out=self.rpn_channels, dtype=self.dtype,
            param_dtype=self.param_dtype, name="bilstm",
        )(rpn)

        bbox_pred = nn.Dense(
            self.num_anchors * 4,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            name="rpn_bbox_pred",
        )(lstm_o)
        cls_score = nn.Dense(
            self.num_anchors * 2,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
            name="rpn_cls_score",
        )(lstm_o)

        n, h, w, _ = cls_score.shape
        logits = cls_score.reshape(n, h, w, self.num_anchors, 2)
        probs = jax.nn.softmax(logits, axis=-1)
        cls_prob = probs[..., 1]  # fg slice — all any consumer reads

        return CTPNOutputs(
            bbox_pred=bbox_pred.astype(jnp.float32),
            cls_score=cls_score.astype(jnp.float32),
            cls_prob=cls_prob.astype(jnp.float32),
        )
