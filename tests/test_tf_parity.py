"""Weight-conversion parity against REAL TensorFlow numerics.

Round-1 converter tests were circular: they fabricated TF-style var dicts
with the converter's own inverse mapping. Here the reference forward graph
(`lib/networks/VGGnet_test.py:20-52`) is rebuilt with genuine TF ops —
``tf.nn.conv2d``/``max_pool``/``bias_add``/``relu``/``matmul``/``softmax``
for the layer chain of `lib/networks/network.py:144-196` and
``tf.raw_ops.BlockLSTM`` for the recurrence of `network.py:88-113`
(BlockLSTM is TF's fused C++ LSTM kernel; it shares TF1 ``LSTMCell``'s
fused ``[x; h] @ W`` layout, i,c̃,f,o gate order, and compute-time
``forget_bias`` — ``tf.compat.v1.nn.rnn_cell.LSTMCell`` itself is
unavailable under Keras 3).

Random variables with the reference's exact TF1 names are converted through
``convert_tf_vars`` and the JAX model must reproduce the TF head tensors to
~1e-4, and the full host postprocess must yield identical boxes. A negative
control (rolled gate order) proves the comparison actually detects layout
mistakes.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")

from ctpn_tpu.models.ctpn import CTPN
from ctpn_tpu.ops.anchors import shifted_anchors
from ctpn_tpu.postprocess.oracle import detect_np
from ctpn_tpu.utils.host_ref import proposal_layer_np
from ctpn_tpu.utils.weights import convert_tf_vars

HIDDEN = 128
A = 10

# (name, c_in, c_out) for the 13 VGG convs + rpn conv, pools after blocks 1-4
_CONVS = [
    ("conv1_1", 3, 64), ("conv1_2", 64, 64),
    ("conv2_1", 64, 128), ("conv2_2", 128, 128),
    ("conv3_1", 128, 256), ("conv3_2", 256, 256), ("conv3_3", 256, 256),
    ("conv4_1", 256, 512), ("conv4_2", 512, 512), ("conv4_3", 512, 512),
    ("conv5_1", 512, 512), ("conv5_2", 512, 512), ("conv5_3", 512, 512),
]
_POOL_AFTER = {"conv1_2", "conv2_2", "conv3_3", "conv4_3"}


def _make_tf_vars(rng: np.random.RandomState) -> dict:
    """Random float32 vars under the reference's exact TF1 names."""
    v = {}
    for name, ci, co in _CONVS:
        std = np.sqrt(2.0 / (9 * ci))  # keep activations alive through relu
        v[f"{name}/weights"] = rng.randn(3, 3, ci, co).astype(np.float32) * std
        v[f"{name}/biases"] = rng.randn(co).astype(np.float32) * 0.01
    v["rpn_conv/3x3/weights"] = (
        rng.randn(3, 3, 512, 512).astype(np.float32) * np.sqrt(2.0 / (9 * 512))
    )
    v["rpn_conv/3x3/biases"] = rng.randn(512).astype(np.float32) * 0.01
    for d in ("fw", "bw"):
        v[f"lstm_o/bidirectional_rnn/{d}/lstm_cell/kernel"] = (
            rng.randn(512 + HIDDEN, 4 * HIDDEN).astype(np.float32) * 0.05
        )
        v[f"lstm_o/bidirectional_rnn/{d}/lstm_cell/bias"] = (
            rng.randn(4 * HIDDEN).astype(np.float32) * 0.1
        )
    v["lstm_o/weights"] = rng.randn(2 * HIDDEN, 512).astype(np.float32) * 0.1
    v["lstm_o/biases"] = rng.randn(512).astype(np.float32) * 0.01
    v["rpn_bbox_pred/weights"] = rng.randn(512, A * 4).astype(np.float32) * 0.05
    v["rpn_bbox_pred/biases"] = rng.randn(A * 4).astype(np.float32) * 0.01
    v["rpn_cls_score/weights"] = rng.randn(512, A * 2).astype(np.float32) * 0.05
    v["rpn_cls_score/biases"] = rng.randn(A * 2).astype(np.float32) * 0.01
    return v


def _block_lstm(x_tmaj: tf.Tensor, kernel: np.ndarray, bias: np.ndarray):
    """One direction of `network.py:97-100` via TF's fused LSTM kernel.

    x_tmaj: (T, B, C) time-major input. Returns (T, B, HIDDEN) outputs.
    forget_bias=1.0 matches TF1 LSTMCell's default; cell_clip is disabled
    (LSTMCell never clips) by passing a huge threshold.
    """
    t, b, _ = x_tmaj.shape
    zero_state = tf.zeros((b, HIDDEN), tf.float32)
    zeros_peep = tf.zeros((HIDDEN,), tf.float32)
    out = tf.raw_ops.BlockLSTM(
        seq_len_max=tf.constant(int(t), tf.int64),
        x=x_tmaj,
        cs_prev=zero_state,
        h_prev=zero_state,
        w=tf.constant(kernel),
        wci=zeros_peep,
        wcf=zeros_peep,
        wco=zeros_peep,
        b=tf.constant(bias),
        forget_bias=1.0,
        cell_clip=1e9,
        use_peephole=False,
    )
    return out[6]  # h: (T, B, HIDDEN)


def _tf_forward(images: np.ndarray, v: dict):
    """The reference VGGnet_test forward in genuine TF ops.

    Mirrors `VGGnet_test.py:20-52`: conv trunk -> rpn_conv/3x3 -> Bilstm ->
    lstm_fc heads -> spatial softmax. Returns (cls_prob (N,H,W,A) fg slice,
    bbox_pred (N,H,W,A*4)) as numpy.
    """
    x = tf.constant(images, tf.float32)
    for name, _, _ in _CONVS:
        x = tf.nn.conv2d(x, v[f"{name}/weights"], [1, 1, 1, 1], "SAME")
        x = tf.nn.relu(tf.nn.bias_add(x, v[f"{name}/biases"]))
        if name in _POOL_AFTER:
            x = tf.nn.max_pool2d(x, 2, 2, "VALID")
    x = tf.nn.conv2d(x, v["rpn_conv/3x3/weights"], [1, 1, 1, 1], "SAME")
    x = tf.nn.relu(tf.nn.bias_add(x, v["rpn_conv/3x3/biases"]))

    n, h, w, c = x.shape
    rows = tf.reshape(x, [n * h, w, c])
    # bidirectional_dynamic_rnn == fw scan + time-reversed bw scan
    x_tmaj = tf.transpose(rows, [1, 0, 2])  # (W, N*H, C)
    fw = _block_lstm(
        x_tmaj,
        v["lstm_o/bidirectional_rnn/fw/lstm_cell/kernel"],
        v["lstm_o/bidirectional_rnn/fw/lstm_cell/bias"],
    )
    bw = tf.reverse(
        _block_lstm(
            tf.reverse(x_tmaj, [0]),
            v["lstm_o/bidirectional_rnn/bw/lstm_cell/kernel"],
            v["lstm_o/bidirectional_rnn/bw/lstm_cell/bias"],
        ),
        [0],
    )
    lstm_out = tf.transpose(tf.concat([fw, bw], axis=-1), [1, 0, 2])
    lstm_out = tf.reshape(lstm_out, [n * h * w, 2 * HIDDEN])
    lstm_o = tf.matmul(lstm_out, v["lstm_o/weights"]) + v["lstm_o/biases"]
    lstm_o = tf.reshape(lstm_o, [n, h, w, 512])

    flat = tf.reshape(lstm_o, [n * h * w, 512])
    bbox = tf.matmul(flat, v["rpn_bbox_pred/weights"]) + v["rpn_bbox_pred/biases"]
    bbox = tf.reshape(bbox, [n, h, w, A * 4])
    cls = tf.matmul(flat, v["rpn_cls_score/weights"]) + v["rpn_cls_score/biases"]
    # spatial_reshape_layer(2) + spatial_softmax (`network.py:269-277,332-337`)
    cls = tf.nn.softmax(tf.reshape(cls, [n, h, w, A, 2]))
    return cls.numpy()[..., 1], bbox.numpy()


@pytest.fixture(scope="module")
def tf_and_jax():
    rng = np.random.RandomState(7)
    images = rng.uniform(-120, 120, size=(2, 64, 96, 3)).astype(np.float32)
    tf_vars = _make_tf_vars(rng)
    cls_tf, bbox_tf = _tf_forward(images, tf_vars)

    model = CTPN(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))[
        "params"
    ]
    params = convert_tf_vars(params, tf_vars)
    out = model.apply({"params": params}, jnp.asarray(images))
    return images, tf_vars, cls_tf, bbox_tf, np.asarray(out.cls_prob), np.asarray(out.bbox_pred), params, model


def test_head_tensors_match_real_tf(tf_and_jax):
    _, _, cls_tf, bbox_tf, cls_jx, bbox_jx, _, _ = tf_and_jax
    assert cls_tf.shape == cls_jx.shape and bbox_tf.shape == bbox_jx.shape
    # cls_prob is a probability (bounded [0,1]); bbox_pred is logit-scale
    # (|values| up to ~3 here) so its atol carries the f32 reduction-order
    # noise of 13 stacked convs computed by different backends (oneDNN/XLA)
    np.testing.assert_allclose(cls_jx, cls_tf, atol=1e-4, rtol=0)
    np.testing.assert_allclose(bbox_jx, bbox_tf, atol=5e-4, rtol=0)


def test_boxes_identical_through_host_postprocess(tf_and_jax):
    """Both head pairs -> proposal oracle -> detector: identical boxes
    (the demo_pb.py flow, `ctpn/demo_pb.py:91-98`)."""
    images, _, cls_tf, bbox_tf, cls_jx, bbox_jx, _, _ = tf_and_jax
    h, w = images.shape[1:3]
    anchors = shifted_anchors(h // 16, w // 16)
    info = np.array([h, w, 1.0], np.float32)
    for b in range(images.shape[0]):
        blob_tf = proposal_layer_np(cls_tf[b], bbox_tf[b], info, anchors)
        blob_jx = proposal_layer_np(cls_jx[b], bbox_jx[b], info, anchors)
        # identical proposal sets in identical order; y-coords carry the
        # head-tensor f32 noise amplified by anchor heights (up to 283x)
        # through the decode, so they agree to ~0.01 px, not 1e-4
        assert blob_tf.shape == blob_jx.shape
        np.testing.assert_allclose(blob_jx[:, 0], blob_tf[:, 0], atol=1e-4)
        np.testing.assert_allclose(blob_jx[:, 1:], blob_tf[:, 1:], atol=0.1)
        recs_tf = detect_np(blob_tf[:, 1:], blob_tf[:, 0], (h, w), mode="H")
        recs_jx = detect_np(blob_jx[:, 1:], blob_jx[:, 0], (h, w), mode="H")
        assert recs_tf.shape == recs_jx.shape
        np.testing.assert_allclose(recs_jx, recs_tf, atol=0.1)
        # the demo's written output (integer corner CSV) is bit-identical
        np.testing.assert_array_equal(
            np.rint(recs_jx[:, :8]), np.rint(recs_tf[:, :8])
        )


def test_gate_order_mistake_is_detected(tf_and_jax):
    """Negative control: rolling the fw kernel's 4 gate blocks must break
    head parity — proves the comparison is sensitive to LSTM layout."""
    images, tf_vars, cls_tf, _, _, _, _, model = tf_and_jax
    bad = dict(tf_vars)
    k = bad["lstm_o/bidirectional_rnn/fw/lstm_cell/kernel"]
    bad["lstm_o/bidirectional_rnn/fw/lstm_cell/kernel"] = np.concatenate(
        np.split(k, 4, axis=1)[::-1], axis=1
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)))[
        "params"
    ]
    params = convert_tf_vars(params, bad)
    out = model.apply({"params": params}, jnp.asarray(images))
    assert np.abs(np.asarray(out.cls_prob) - cls_tf).max() > 1e-2
