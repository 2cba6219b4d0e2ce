"""Experiment: BiLSTM scan variants on chip.

The shipped BiLSTM (`models/rnn.py`) runs the forward and backward
directions as two sequential 57-step `lax.scan`s. Both directions are
independent, so the serial depth can be halved by stacking them into one
scan with a leading direction axis (block-diagonal recurrent matmul via
dot_general batching). Also probes `lax.scan(unroll=)` which amortizes
loop-iteration overhead without changing math.

Shapes mirror the headline bench: batch 48, H=38 rows, W=57 steps,
C=512 -> hidden 128 (rows folded into batch: B = 48*38 = 1824).
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ctpn_tpu.utils.compilation import ensure_compilation_cache

ensure_compilation_cache()

N, H, W, C = 48, 38, 57, 512
HID = 128
B = N * H


def lstm_cell(gates, c):
    i, g, f, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    g = jnp.tanh(g)
    f = jax.nn.sigmoid(f + 1.0)
    o = jax.nn.sigmoid(o)
    c = f * c + i * g
    return o * jnp.tanh(c), c


def scan_one(xproj, w_h, unroll=1):
    """Current design: (B, T, 4H) -> (B, T, H), one direction."""
    h0 = jnp.zeros((B, HID), jnp.float32)
    c0 = jnp.zeros((B, HID), jnp.float32)

    def step(carry, x_t):
        h, c = carry
        h, c = lstm_cell(x_t + h @ w_h, c)
        return (h, c), h

    xs = jnp.swapaxes(xproj, 0, 1)
    _, ys = jax.lax.scan(step, (h0, c0), xs, unroll=unroll)
    return jnp.swapaxes(ys, 0, 1)


def bilstm_sequential(pf, pb, w_fw, w_bw, unroll=1):
    out_fw = scan_one(pf, w_fw, unroll)
    out_bw = jnp.flip(scan_one(jnp.flip(pb, 1), w_bw, unroll), 1)
    return jnp.concatenate([out_fw, out_bw], -1)


def bilstm_merged(pf, pb, w_fw, w_bw, unroll=1):
    """One scan, directions stacked on a leading axis (batched matmul)."""
    xs = jnp.stack([pf, jnp.flip(pb, 1)], 0)  # (2, B, T, 4H)
    xs = jnp.transpose(xs, (2, 0, 1, 3))  # (T, 2, B, 4H)
    w = jnp.stack([w_fw, w_bw], 0)  # (2, H, 4H)
    h0 = jnp.zeros((2, B, HID), jnp.float32)
    c0 = jnp.zeros((2, B, HID), jnp.float32)

    def step(carry, x_t):
        h, c = carry
        gates = x_t + jnp.einsum("dbh,dhg->dbg", h, w)
        h, c = lstm_cell(gates, c)
        return (h, c), h

    _, ys = jax.lax.scan(step, (h0, c0), xs, unroll=unroll)  # (T, 2, B, H)
    out_fw = jnp.transpose(ys[:, 0], (1, 0, 2))
    out_bw = jnp.flip(jnp.transpose(ys[:, 1], (1, 0, 2)), 1)
    return jnp.concatenate([out_fw, out_bw], -1)


def bilstm_merged_flat(pf, pb, w_fw, w_bw, unroll=1):
    """One scan, directions stacked into the BATCH axis; the recurrent
    matmul uses the lane-concat trick: h @ [w_fw | w_bw] -> (2B, 8H), each
    half-row selects its direction's 4H slice (2x tiny-matmul FLOPs, no
    batched dims)."""
    xs = jnp.concatenate([pf, jnp.flip(pb, 1)], 0)  # (2B, T, 4H)
    xs = jnp.swapaxes(xs, 0, 1)  # (T, 2B, 4H)
    w = jnp.concatenate([w_fw, w_bw], 1)  # (H, 8H)
    sel = jnp.arange(2 * B)[:, None] < B  # fw rows
    h0 = jnp.zeros((2 * B, HID), jnp.float32)
    c0 = jnp.zeros((2 * B, HID), jnp.float32)

    def step(carry, x_t):
        h, c = carry
        both = h @ w  # (2B, 8H)
        gates = x_t + jnp.where(sel, both[:, : 4 * HID], both[:, 4 * HID :])
        h, c = lstm_cell(gates, c)
        return (h, c), h

    _, ys = jax.lax.scan(step, (h0, c0), xs, unroll=unroll)
    ys = jnp.swapaxes(ys, 0, 1)  # (2B, T, H)
    return jnp.concatenate([ys[:B], jnp.flip(ys[B:], 1)], -1)


def timeit(name, fn, *args, iters=20):
    red = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    np.asarray(red(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = red(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:7.2f} ms")
    return dt


def main():
    rng = np.random.RandomState(0)
    pf = jnp.asarray(rng.randn(B, W, 4 * HID).astype(np.float32) * 0.1)
    pb = jnp.asarray(rng.randn(B, W, 4 * HID).astype(np.float32) * 0.1)
    w_fw = jnp.asarray(rng.randn(HID, 4 * HID).astype(np.float32) * 0.05)
    w_bw = jnp.asarray(rng.randn(HID, 4 * HID).astype(np.float32) * 0.05)

    ref = np.asarray(jax.jit(bilstm_sequential)(pf, pb, w_fw, w_bw))
    for name, fn in [("merged", bilstm_merged), ("merged_flat", bilstm_merged_flat)]:
        got = np.asarray(jax.jit(fn)(pf, pb, w_fw, w_bw))
        err = np.abs(got - ref).max()
        print(f"{name} max|diff| vs sequential: {err:.2e}")
        assert err < 1e-5, name

    print(f"-- batch {N} (B={B}), T={W}, hidden {HID} --")
    timeit("sequential (shipped)", bilstm_sequential, pf, pb, w_fw, w_bw)
    for u in (2, 4, 8):
        timeit(
            f"sequential unroll={u}",
            lambda a, b, c, d, u=u: bilstm_sequential(a, b, c, d, u),
            pf, pb, w_fw, w_bw,
        )
    timeit("merged (batched-dim matmul)", bilstm_merged, pf, pb, w_fw, w_bw)
    for u in (2, 4, 8):
        timeit(
            f"merged unroll={u}",
            lambda a, b, c, d, u=u: bilstm_merged(a, b, c, d, u),
            pf, pb, w_fw, w_bw,
        )
    timeit("merged_flat (lane-concat)", bilstm_merged_flat, pf, pb, w_fw, w_bw)
    timeit(
        "merged_flat unroll=4",
        lambda a, b, c, d: bilstm_merged_flat(a, b, c, d, 4),
        pf, pb, w_fw, w_bw,
    )


if __name__ == "__main__":
    main()
