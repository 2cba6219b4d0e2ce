"""Pool implementations + bigger-strip conv1_2 variants."""
import sys
import os.path as osp
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ctpn_tpu.utils.compilation import ensure_compilation_cache

ensure_compilation_cache()

B, H, W, CH = 8, 608, 912, 64
rng = np.random.RandomState(0)
y = jnp.asarray(rng.rand(B, H, W, CH).astype(np.float32)).astype(jnp.bfloat16)
CP = pltpu.CompilerParams(vmem_limit_bytes=30 * 1024 * 1024)


def timeit(name, fn, *args, iters=10):
    red = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    try:
        np.asarray(red(*args))
    except Exception as e:
        print(f"{name:40s} FAIL {type(e).__name__}: {str(e).splitlines()[0][:80]}")
        return
    t0 = time.perf_counter()
    for _ in range(iters):
        out = red(*args)
    np.asarray(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1e3:7.2f} ms")


def pool_rw(y):
    return jax.lax.reduce_window(
        y, jnp.asarray(-np.inf, y.dtype), jax.lax.max,
        (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def pool_strided(y):
    a = jnp.maximum(y[:, 0::2, 0::2, :], y[:, 0::2, 1::2, :])
    b = jnp.maximum(y[:, 1::2, 0::2, :], y[:, 1::2, 1::2, :])
    return jnp.maximum(a, b)


def pool_reshape(y):
    n, h, w, c = y.shape
    p = jnp.max(y.reshape(n, h // 2, 2, w, c), axis=2)
    return jnp.max(p.reshape(n, h // 2, w // 2, 2, c), axis=3)


TP = 16


def k_pool(y_ref, o_ref):
    yy = y_ref[0]
    p = jnp.max(yy.reshape(TP // 2, 2, W, CH), axis=1)
    o_ref[0] = jnp.max(p.reshape(TP // 2, W // 2, 2, CH), axis=2)


def pool_pallas(y):
    n, h, w, c = y.shape
    return pl.pallas_call(
        k_pool,
        grid=(n, h // TP),
        in_specs=[pl.BlockSpec((1, TP, w, c), lambda nn_, i: (nn_, i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TP // 2, w // 2, c),
                               lambda nn_, i: (nn_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w // 2, c), jnp.bfloat16),
        compiler_params=CP,
    )(y)


timeit("pool: reduce_window", jax.jit(pool_rw), y)
timeit("pool: strided slices", jax.jit(pool_strided), y)
timeit("pool: reshape+max", jax.jit(pool_reshape), y)
timeit("pool: pallas", jax.jit(pool_pallas), y)

# sanity: pallas pool == reduce_window
a = np.asarray(pool_rw(y)[:, :4, :8].astype(jnp.float32))
b = np.asarray(pool_pallas(y)[:, :4, :8].astype(jnp.float32))
print("pool parity:", np.array_equal(a, b))


# ---- conv1_2 K=192 with bigger strips --------------------------------------
w2b = jnp.asarray(rng.randn(3, 3, CH, CH).astype(np.float32) * 0.05).astype(jnp.bfloat16)


def mk_c12(th):
    def body(y_ref, w_ref, o_ref):
        z = jnp.concatenate(
            [y_ref[0:th], y_ref[1:th + 1], y_ref[2:th + 2]], axis=2
        )  # (th, W+2, 192)
        acc = jnp.zeros((th, W, CH), jnp.float32)
        for kx in range(3):
            wk = jnp.concatenate(
                [w_ref[0, kx], w_ref[1, kx], w_ref[2, kx]], axis=0)
            acc += jax.lax.dot_general(
                z[:, kx:kx + W, :], wk,
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[:] = jnp.maximum(acc, 0.0).astype(jnp.bfloat16)

    y1s = jnp.asarray(
        rng.rand(th + 2, W + 2, CH).astype(np.float32)).astype(jnp.bfloat16)

    def run(y1s, w2b):
        return pl.pallas_call(
            body,
            grid=(B * H // th,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((th, W, CH), jnp.bfloat16),
            compiler_params=CP,
        )(y1s, w2b)
    return run, y1s


for th in (16, 32):
    run, y1s = mk_c12(th)
    timeit(f"c12: K=192 strips TH={th}", run, y1s, w2b)
