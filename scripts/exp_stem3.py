"""Variant tests: K=576 single-dot conv1_2; raw-image in-kernel im2col."""
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

B, H, W = 8, 608, 912
TH = 8
CH = 64
rng = np.random.RandomState(0)
CP = pltpu.CompilerParams(vmem_limit_bytes=30 * 1024 * 1024)


def timeit(name, fn, *args, iters=10):
    red = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    try:
        np.asarray(red(*args))
    except Exception as e:
        print(f"{name:36s} FAIL {type(e).__name__}: {str(e).splitlines()[0][:90]}")
        return
    t0 = time.perf_counter()
    for _ in range(iters):
        out = red(*args)
    np.asarray(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/iters*1e3:7.2f} ms")


y1s = jnp.asarray(rng.rand(TH + 2, W + 2, CH).astype(np.float32)).astype(jnp.bfloat16)
w2b = jnp.asarray(rng.randn(3, 3, CH, CH).astype(np.float32) * 0.05).astype(jnp.bfloat16)


def mk_c12(body, out_dtype=jnp.float32):
    def run(y1s, w2b):
        return pl.pallas_call(
            body,
            grid=(608,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TH, W, CH), out_dtype),
            compiler_params=CP,
        )(y1s, w2b)
    return run


def k_c12_k576(y_ref, w_ref, o_ref):
    pieces = [
        y_ref[ky:ky + TH, kx:kx + W, :]
        for ky in range(3) for kx in range(3)
    ]
    z = jnp.concatenate(pieces, axis=2)  # (TH, W, 576)
    wk = jnp.concatenate(
        [w_ref[ky, kx] for ky in range(3) for kx in range(3)], axis=0
    )  # (576, CH)
    o_ref[:] = jnp.maximum(jax.lax.dot_general(
        z, wk, dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32), 0.0).astype(o_ref.dtype)


timeit("c12: K=576 single dot (f32 out)", mk_c12(k_c12_k576), y1s, w2b)
timeit("c12: K=576 single dot (bf16 out)",
       mk_c12(k_c12_k576, jnp.bfloat16), y1s, w2b)


# K=192: ky on lanes (leading-dim slices, no sublane relayout), 3 dots
def k_c12_k192(y_ref, w_ref, o_ref):
    z = jnp.concatenate([y_ref[0:TH], y_ref[1:TH + 1], y_ref[2:TH + 2]],
                        axis=2)  # (TH, W+2, 192)
    acc = jnp.zeros((TH, W, CH), jnp.float32)
    for kx in range(3):
        wk = jnp.concatenate([w_ref[0, kx], w_ref[1, kx], w_ref[2, kx]], axis=0)
        acc += jax.lax.dot_general(
            z[:, kx:kx + W, :], wk,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[:] = jnp.maximum(acc, 0.0).astype(o_ref.dtype)


timeit("c12: K=192 x3 (bf16 out)", mk_c12(k_c12_k192, jnp.bfloat16), y1s, w2b)


# ---- raw-image DMA + in-kernel im2col for conv1_1 ---------------------------
x = jnp.asarray((rng.rand(B, H, W, 3) * 255 - 128).astype(np.float32))
xpad = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (2, 2), (2, 2), (0, 0)))
w1m = (
    jnp.asarray(rng.randn(3, 3, 3, CH).astype(np.float32) * 0.05)
    .astype(jnp.bfloat16).transpose(0, 1, 2, 3).reshape(27, CH)
)  # (ky, kx, ci) order


def k_c11_raw(main_ref, tail_ref, w_ref, o_ref):
    xin = jnp.concatenate([main_ref[0], tail_ref[0]], axis=0)  # (TH+4, W+4, 3)
    pieces = [
        xin[ky:ky + TH + 2, kx:kx + W + 2, :]
        for ky in range(3) for kx in range(3)
    ]
    z = jnp.concatenate(pieces, axis=2)  # (TH+2, W+2, 27)
    y1 = jax.lax.dot_general(
        z, w_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = jnp.max(y1, axis=0).astype(jnp.bfloat16)


def c11_raw(xpad):
    n, hp, wp, c = xpad.shape
    h = hp - 4
    return pl.pallas_call(
        k_c11_raw,
        grid=(n, h // TH),
        in_specs=[
            pl.BlockSpec((1, TH, wp, 3), lambda nn_, i: (nn_, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, wp, 3), lambda nn_, i: (nn_, (i + 1) * TH // 4, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, wp - 2, CH), lambda nn_, i: (nn_, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, wp - 2, CH), jnp.bfloat16),
        compiler_params=CP,
    )(xpad, xpad, w1m)


timeit("c11: raw DMA + in-kernel im2col", c11_raw, xpad)
timeit("xpad producer (pad+cast)",
       jax.jit(lambda x: jnp.pad(x.astype(jnp.bfloat16),
                                 ((0, 0), (2, 2), (2, 2), (0, 0)))), x)
