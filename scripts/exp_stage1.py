"""Experiment: where does VGG stage-1 time go, and what fixes it.

Times conv1_1 / conv1_2 / pool individually and variants of the stage-1
block on the real chip (tunnel backend: fetch a scalar to synchronize).
"""

import sys
import os.path as osp
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ctpn_tpu.utils.compilation import ensure_compilation_cache

ensure_compilation_cache()

B, H, W = 8, 608, 912
rng = np.random.RandomState(0)
x3 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
k1 = jnp.asarray(rng.rand(3, 3, 3, 64).astype(np.float32) * 0.1)
k2 = jnp.asarray(rng.rand(3, 3, 64, 64).astype(np.float32) * 0.1)


def timeit(name, fn, *args, iters=10):
    # fetch ONE scalar to synchronize — a full-tensor fetch through the
    # tunnel is ~10 MB/s and would swamp the measurement
    red = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    out = red(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = red(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {dt:7.2f} ms")
    return dt


def conv(x, k, dtype=jnp.bfloat16):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), k.astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.jit
def stage1(x):
    y = jax.nn.relu(conv(x, k1))
    y = jax.nn.relu(conv(y, k2))
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


@jax.jit
def conv11_only(x):
    return jax.nn.relu(conv(x, k1))


@jax.jit
def conv12_only(y):
    return jax.nn.relu(conv(y, k2))


@jax.jit
def pool_only(y):
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


y64 = jnp.asarray(rng.rand(B, H, W, 64).astype(np.float32)).astype(jnp.bfloat16)

# variant: conv1_1 as patch-extract + matmul (27 -> 64)
@jax.jit
def conv11_im2col(x):
    p = jax.lax.conv_general_dilated_patches(
        x.astype(jnp.bfloat16), (3, 3), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B,H,W,27)
    kmat = k1.astype(jnp.bfloat16).reshape(27, 64)
    return jax.nn.relu(p @ kmat)


# variant: pad input to 8 channels
x8 = jnp.concatenate([x3, jnp.zeros((B, H, W, 5), jnp.float32)], axis=-1)
k1p = jnp.concatenate([k1, jnp.zeros((3, 3, 5, 64), jnp.float32)], axis=2)


@jax.jit
def conv11_pad8(x):
    return jax.nn.relu(conv(x, k1p))


# variant: fused whole stage with pooling folded as stride-2 conv1_2?
# (not semantics-preserving; skip)

# variant: f32 stage 1
@jax.jit
def stage1_f32(x):
    y = jax.nn.relu(conv(x, k1, jnp.float32))
    y = jax.nn.relu(conv(y, k2, jnp.float32))
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


# variant: pool BEFORE conv1_2? not semantics preserving. skip.

# variant: conv1_1 + pool fused, then conv1_2 at half res? not preserving.

# variant: uint8 input conversion fused (what the pipeline actually does)
xu8 = (x3 * 255).astype(jnp.uint8)


@jax.jit
def stage1_from_u8(x):
    xf = x.astype(jnp.bfloat16) - 127.5
    y = jax.nn.relu(conv(xf, k1))
    y = jax.nn.relu(conv(y, k2))
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


print(f"batch={B} {H}x{W}")
timeit("stage1 (conv11+conv12+pool, bf16)", stage1, x3)
timeit("stage1 f32", stage1_f32, x3)
timeit("stage1 from uint8", stage1_from_u8, xu8)
timeit("conv1_1 alone (bf16)", conv11_only, x3)
timeit("conv1_1 im2col-matmul", conv11_im2col, x3)
timeit("conv1_1 pad-to-8ch", conv11_pad8, x8)
timeit("conv1_2 alone (bf16)", conv12_only, y64)
timeit("pool alone", pool_only, y64)
