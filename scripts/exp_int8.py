"""Probe: does int8 conv/matmul hit the v5e's 2x-int8 MXU path via XLA?

If int8 convs run ~2x bf16, a quantized serving mode for the VGG trunk
(per-channel weight scales, per-tensor activation scales, f32 epilogues)
is the one remaining >10% throughput lever — the trunk is 90% of the
batch-48 pipeline (scripts/exp_breakdown.py).

All test tensors are generated ON DEVICE (a host-built (48,608,912,64)
int8 tensor is 1.7 GB = ~40 s through this tunnel's 42 MB/s H2D; the
first version of this probe timed out exactly that way). Batch 8 —
ratios are what matter.
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

B = 8


def devgen(shape, dtype):
    """Deterministic on-device int8/bf16 tensor, no H2D."""
    k = jax.random.PRNGKey(hash(shape) % (2 ** 31))
    x = jax.random.randint(k, shape, -127, 128, dtype=jnp.int32)
    return jax.block_until_ready(x.astype(dtype))


def timeit(name, fn, *args, iters=10):
    red = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    np.asarray(red(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = red(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


def conv(x, k, dtype, acc=None):
    kw = {}
    if acc is not None:
        kw["preferred_element_type"] = acc
    return jax.lax.conv_general_dilated(
        x.astype(dtype), k.astype(dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw,
    )


def main():
    shapes = [
        ("conv1_2  608x912x64->64", (B, 608, 912, 64), (3, 3, 64, 64)),
        ("conv3_2  152x228x256->256", (B, 152, 228, 256), (3, 3, 256, 256)),
        ("conv4_2  76x114x512->512", (B, 76, 114, 512), (3, 3, 512, 512)),
    ]
    for name, xs, ks in shapes:
        x = devgen(xs, jnp.int8)
        k = devgen(ks, jnp.int8)
        xf = jax.block_until_ready(x.astype(jnp.bfloat16))
        kf = jax.block_until_ready(k.astype(jnp.bfloat16))
        t_bf = timeit(f"{name} bf16", lambda a, b: conv(a, b, jnp.bfloat16), xf, kf)
        t_i8 = timeit(
            f"{name} int8->int32", lambda a, b: conv(a, b, jnp.int8, jnp.int32), x, k
        )
        sc = devgen((ks[-1],), jnp.float32) * 1e-5

        def qconv(a, b, s):
            y = conv(a, b, jnp.int8, jnp.int32).astype(jnp.float32) * s
            y = jax.nn.relu(y)
            return jnp.clip(jnp.round(y * 127.0), -127, 127).astype(jnp.int8)

        t_q = timeit(f"{name} int8 conv+dequant+requant", qconv, x, k, sc)
        print(f"  -> int8/bf16 = {t_i8 / t_bf:.2f}, "
              f"quantized-op/bf16 = {t_q / t_bf:.2f}", flush=True)

    m = 8192
    a = devgen((m, m), jnp.int8)
    b = devgen((m, m), jnp.int8)
    t_bf = timeit(
        "matmul 8192^3 bf16",
        lambda p, q: jnp.matmul(p.astype(jnp.bfloat16), q.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32), a, b)
    t_i8 = timeit(
        "matmul 8192^3 int8->int32",
        lambda p, q: jnp.matmul(p, q, preferred_element_type=jnp.int32), a, b)
    fl = 2 * m ** 3
    print(f"  bf16: {fl / t_bf / 1e9:.1f} TFLOPS   int8: {fl / t_i8 / 1e9:.1f} TOPS")


if __name__ == "__main__":
    main()
