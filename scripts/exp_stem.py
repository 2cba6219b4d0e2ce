"""TPU parity + timing of the fused stem kernel vs the stock XLA path."""
import sys
import os.path as osp
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ctpn_tpu.ops.stem_pallas import fused_stem_block
from ctpn_tpu.utils.compilation import ensure_compilation_cache

ensure_compilation_cache()

B, H, W = 8, 608, 912
rng = np.random.RandomState(0)
x = jnp.asarray((rng.rand(B, H, W, 3) * 255 - 128).astype(np.float32))
w1 = jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.05)
b1 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
w2 = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
b2 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)


@jax.jit
def stock(x):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w1.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + b1, 0).astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(
        y, w2.astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + b2, 0).astype(jnp.bfloat16)
    return jax.lax.reduce_window(
        y, jnp.asarray(-np.inf, jnp.bfloat16), jax.lax.max,
        (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


@jax.jit
def fused(x):
    return fused_stem_block(x, w1, b1, w2, b2)


def timeit(name, fn, *args, iters=20):
    red = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    np.asarray(red(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = red(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:28s} {dt:7.2f} ms")


# parity on a small crop fetch (full fetch too slow through the tunnel)
a = fused(x)[:, :16, :64, :].astype(jnp.float32)
b = stock(x)[:, :16, :64, :].astype(jnp.float32)
d = np.abs(np.asarray(a) - np.asarray(b))
rel = d / (np.abs(np.asarray(b)) + 1)
print("crop max abs:", d.max(), "max rel:", rel.max())

# global agreement via moments
for f in (fused, stock):
    o = f(x).astype(jnp.float32)
    print("sum/max:", float(jnp.sum(o)), float(jnp.max(o)))

timeit("stock stage1", stock, x)
timeit("fused stem", fused, x)
