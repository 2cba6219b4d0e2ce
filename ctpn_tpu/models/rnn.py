"""BiLSTM row encoder over the feature-map width axis.

Re-design of the reference's ``Bilstm`` op (`lib/networks/network.py:88-113`):
rows of the (N, H, W, C) feature map are folded into the batch axis and a
bidirectional LSTM scans along W, followed by a 2*hidden -> d_out projection.

TPU-first structure (differs from tf.nn.bidirectional_dynamic_rnn):

* All input projections for BOTH directions and ALL timesteps are hoisted
  into a single (N*H*W, C) @ (C, 8*hidden) MXU matmul before the scan; the
  `lax.scan` steps then only do the small recurrent (B, hidden) @ (hidden,
  4*hidden) matmuls. This keeps the serial stage minimal — W <= ~76 for
  1216-px-wide inputs (SURVEY.md §5), so the scan is short.
* The backward direction reuses the same scan with a flipped time axis.
* Recurrent math runs in float32 regardless of the conv compute dtype —
  LSTM state is precision-sensitive and the matmuls are tiny.

Gate ordering and forget-bias follow TF1's ``tf.contrib.rnn.LSTMCell``
(i, g/c̃, f, o with forget_bias=1.0) so converted reference checkpoints map
weight-for-weight (SURVEY.md §7 hard part 5).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _lstm_scan(xproj: jnp.ndarray, w_h: jnp.ndarray, hidden: int) -> jnp.ndarray:
    """Scan an LSTM over time given precomputed input projections.

    xproj: (B, T, 4*hidden) = x @ W_x + b (gate order i, g, f, o)
    w_h:   (hidden, 4*hidden) recurrent weights
    returns outputs (B, T, hidden)
    """
    B = xproj.shape[0]
    h0 = jnp.zeros((B, hidden), dtype=xproj.dtype)
    c0 = jnp.zeros((B, hidden), dtype=xproj.dtype)

    def step(carry, x_t):
        h, c = carry
        gates = x_t + h @ w_h
        i, g, f, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        g = jnp.tanh(g)
        f = jax.nn.sigmoid(f + 1.0)  # TF LSTMCell forget_bias=1.0
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    xs = jnp.swapaxes(xproj, 0, 1)  # (T, B, 4*hidden)
    _, ys = jax.lax.scan(step, (h0, c0), xs)
    return jnp.swapaxes(ys, 0, 1)  # (B, T, hidden)


class BiLSTM(nn.Module):
    """(N, H, W, C) -> (N, H, W, d_out); recurrence along W, rows batched.

    ``dtype`` applies to the two large MXU matmuls (input projection and
    output projection); the recurrent scan always runs float32 — LSTM state
    is precision-sensitive and its matmuls are tiny.
    """

    hidden: int = 128
    d_out: int = 512
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        xf = x.reshape(n * h, w, c)

        # one fused input projection for both directions: (.., C) @ (C, 8*hid)
        proj = nn.Dense(
            8 * self.hidden,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="input_proj",
        )(xf).astype(jnp.float32)
        pf, pb = jnp.split(proj, 2, axis=-1)

        w_h_fw = self.param(
            "w_h_fw",
            nn.initializers.orthogonal(),
            (self.hidden, 4 * self.hidden),
            self.param_dtype,
        )
        w_h_bw = self.param(
            "w_h_bw",
            nn.initializers.orthogonal(),
            (self.hidden, 4 * self.hidden),
            self.param_dtype,
        )

        out_fw = _lstm_scan(pf, w_h_fw, self.hidden)
        out_bw = jnp.flip(
            _lstm_scan(jnp.flip(pb, axis=1), w_h_bw, self.hidden), axis=1
        )
        cat = jnp.concatenate([out_fw, out_bw], axis=-1)  # (N*H, W, 2*hidden)

        out = nn.Dense(
            self.d_out,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="out_proj",
        )(cat)
        return out.astype(jnp.float32).reshape(n, h, w, self.d_out)
