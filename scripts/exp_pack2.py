"""Experiment (VERDICT r3 #7): batch->channel PACKING for stage 1.

The one named trunk gap is stage 1's half-lane layout: conv1_1/conv1_2
run at 64 channels on a 128-lane MXU/VPU, so every (8,128) bf16 tile is
half padding — 2x the HBM bytes for the same useful data, on the largest
tensors in the network. Every full-lane reformulation measured in round 3
(s2d K3/P4, Pallas stem, int8) LOST because it inflated MACs or hit the
~70 GB/s Pallas DMA ceiling.

This experiment tries the one reformulation that inflates NOTHING useful:
pack TWO batch images into the channel dimension and make the stage-1
weights block-diagonal:

    x_packed[n, h, w, 0:C]  = x[2n]        (C = 64 after conv1_1)
    x_packed[n, h, w, C:2C] = x[2n+1]
    W_packed = [[W, 0], [0, W]]            (3,3,128,128) block-diag

The MXU cycle count is UNCHANGED — the stock conv already pads 64 -> 128
lanes and multiplies the padding — but every HBM tile is now full of real
data: half the bytes moved through the bandwidth-bound stage. The zero
blocks cost nothing extra (the padded lanes were already multiplied).
Exactness: zeros kill all cross-image terms, so packed == stock up to
bf16 accumulation order.

Variants timed (batch 32, 608x912, bf16, one jit each):
  stock    conv1_1 -> relu -> conv1_2 -> relu -> pool1
  pack2    pack(3ch) -> block-diag convs -> pool1 -> unpack to stock layout
  pack2pre same but input ALREADY packed (preprocessing can emit packed
           layout for free — the mean-subtract reshape fuses), unpack after
           pool1 where the tensor is 4x smaller than the conv1_2 activations

Run on the TPU:  python scripts/exp_pack2.py
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ctpn_tpu.utils.compilation import ensure_compilation_cache

B, H, W = 32, 608, 912


def conv(x, k, dtype=jnp.bfloat16):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), jnp.asarray(k).astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def pool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "SAME"
    )


def block_diag2(k):
    """(kh,kw,ci,co) -> (kh,kw,2ci,2co) with k on both diagonal blocks."""
    kh, kw, ci, co = k.shape
    out = np.zeros((kh, kw, 2 * ci, 2 * co), k.dtype)
    out[:, :, :ci, :co] = k
    out[:, :, ci:, co:] = k
    return out


def pack2(x):
    """(N,H,W,C) -> (N/2,H,W,2C): image pairs side by side in channels."""
    n, h, w, c = x.shape
    return x.reshape(n // 2, 2, h, w, c).transpose(0, 2, 3, 1, 4).reshape(
        n // 2, h, w, 2 * c
    )


def unpack2(x):
    n, h, w, c2 = x.shape
    c = c2 // 2
    return x.reshape(n, h, w, 2, c).transpose(0, 3, 1, 2, 4).reshape(
        2 * n, h, w, c
    )


def timeit(name, fn, *args, iters=10):
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
    ensure_compilation_cache()
    rng = np.random.RandomState(0)
    k1 = (rng.rand(3, 3, 3, 64).astype(np.float32) - 0.5) * 0.2
    k2 = (rng.rand(3, 3, 64, 64).astype(np.float32) - 0.5) * 0.2
    k1p, k2p = block_diag2(k1), block_diag2(k2)

    def stage1(x):
        y = jax.nn.relu(conv(x, k1))
        y = jax.nn.relu(conv(y, k2))
        return pool2(y)

    def stage1_pack2(x):
        y = pack2(x)
        y = jax.nn.relu(conv(y, k1p))
        y = jax.nn.relu(conv(y, k2p))
        return unpack2(pool2(y))

    def stage1_pack2_pre(xp):
        y = jax.nn.relu(conv(xp, k1p))
        y = jax.nn.relu(conv(y, k2p))
        return unpack2(pool2(y))

    # exactness: in f32 the block-diagonal form reproduces the stock stage
    # to rounding (zeros kill all cross-image terms); in bf16 only the
    # accumulation order differs (~2e-3 relative, within bf16 epsilon)
    small = jnp.asarray(np.random.RandomState(1).uniform(
        -120, 120, (4, 64, 80, 3)
    ).astype(np.float32))

    def stage1_f32(x):
        y = jax.nn.relu(conv(x, k1, jnp.float32))
        y = jax.nn.relu(conv(y, k2, jnp.float32))
        return pool2(y)

    def stage1_pack2_f32(x):
        y = pack2(x)
        y = jax.nn.relu(conv(y, k1p, jnp.float32))
        y = jax.nn.relu(conv(y, k2p, jnp.float32))
        return unpack2(pool2(y))

    a = np.asarray(jax.jit(stage1_f32)(small), np.float32)
    b = np.asarray(jax.jit(stage1_pack2_f32)(small), np.float32)
    rel = np.abs(a - b).max() / np.abs(a).max()
    print(f"pack2 vs stock rel|diff| (f32): {rel:.2e}")
    assert rel < 1e-5, "packed stage must reproduce the stock stage"

    x = jnp.asarray(
        rng.uniform(-120, 120, (B, H, W, 3)).astype(np.float32)
    )
    xp = jnp.asarray(np.asarray(pack2(np.asarray(x))))
    t0 = timeit("stage1 stock (conv+conv+pool)", jax.jit(stage1), x)
    t1 = timeit("stage1 pack2 (incl. pack of 3ch input)",
                jax.jit(stage1_pack2), x)
    t2 = timeit("stage1 pack2 pre-packed input",
                jax.jit(stage1_pack2_pre), xp)
    print(f"\nspeedups vs stock: pack2 {t0 / t1:.2f}x, "
          f"pre-packed {t0 / t2:.2f}x")


if __name__ == "__main__":
    main()
