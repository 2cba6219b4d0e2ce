"""Bisect the fused-stem kernel cost: DMA layout, conv1_1, conv1_2 variants."""
import functools
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
x = jnp.asarray((rng.rand(B, H, W, 3) * 255 - 128).astype(np.float32))
w1 = jnp.asarray(rng.randn(3, 3, 3, CH).astype(np.float32) * 0.05)
b1 = jnp.asarray(rng.randn(CH).astype(np.float32) * 0.1)
w2 = jnp.asarray(rng.randn(3, 3, CH, CH).astype(np.float32) * 0.05)
b2 = jnp.asarray(rng.randn(CH).astype(np.float32) * 0.1)
CP = pltpu.CompilerParams(vmem_limit_bytes=30 * 1024 * 1024)


def timeit(name, fn, *args, iters=20):
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


# ---- patches variants ------------------------------------------------------
def patches_nhwc(x):
    return jax.lax.conv_general_dilated_patches(
        x.astype(jnp.bfloat16), (3, 3), (1, 1), padding=((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def patches_planar(x):
    # (N, 27, H+2, W+2): feature-planar so the HBM minor dim is W (contiguous)
    p = jax.lax.conv_general_dilated_patches(
        x.astype(jnp.bfloat16), (3, 3), (1, 1), padding=((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NCHW"))
    return p


timeit("patches NHWC (minor=27)", patches_nhwc, x)
timeit("patches planar NCHW (minor=W)", patches_planar, x)

ppc = patches_planar(x)  # (8, 27, 610, 914)
print("planar shape:", ppc.shape)


# ---- DMA cost with planar layout -------------------------------------------
def k_dma_planar(main_ref, tail_ref, o_ref):
    xin = jnp.concatenate([main_ref[0, :, :, :], tail_ref[0]], axis=1)  # (27, TH+2, W+2)
    o_ref[0] = jnp.sum(xin.astype(jnp.float32), axis=1).astype(jnp.bfloat16)


def dma_planar(ppc):
    n, f, hp, wp = ppc.shape
    h = hp - 2
    return pl.pallas_call(
        k_dma_planar,
        grid=(n, h // TH),
        in_specs=[
            pl.BlockSpec((1, f, TH, wp), lambda nn_, i: (nn_, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, 2, wp), lambda nn_, i: (nn_, 0, (i + 1) * TH // 2, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, f, wp), lambda nn_, i: (nn_, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, f, wp), jnp.bfloat16),
        compiler_params=CP,
    )(ppc, ppc)


timeit("kernel: planar DMA+concat only", dma_planar, ppc)


# ---- conv1_1 from planar patches (contract leading 27) ----------------------
w1m = w1.astype(jnp.bfloat16).transpose(2, 0, 1, 3).reshape(27, CH)


def k_c11_planar(main_ref, tail_ref, w1_ref, o_ref):
    xin = jnp.concatenate([main_ref[0], tail_ref[0]], axis=1)  # (27, TH+2, W+2)
    y1 = jax.lax.dot_general(
        xin, w1_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TH+2, W+2, CH)
    o_ref[0] = jnp.max(y1, axis=0).astype(jnp.bfloat16)


def c11_planar(ppc):
    n, f, hp, wp = ppc.shape
    h = hp - 2
    return pl.pallas_call(
        k_c11_planar,
        grid=(n, h // TH),
        in_specs=[
            pl.BlockSpec((1, f, TH, wp), lambda nn_, i: (nn_, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, 2, wp), lambda nn_, i: (nn_, 0, (i + 1) * TH // 2, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, wp, CH), lambda nn_, i: (nn_, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, wp, CH), jnp.bfloat16),
        compiler_params=CP,
    )(ppc, ppc, w1m)


timeit("kernel: planar DMA + conv1_1 dot", c11_planar, ppc)


# ---- conv1_2 variants on a resident strip -----------------------------------
y1s = jnp.asarray(rng.rand(TH + 2, W + 2, CH).astype(np.float32)).astype(jnp.bfloat16)
w2b = w2.astype(jnp.bfloat16)


def mk_c12(body):
    def run(y1s, w2b):
        return pl.pallas_call(
            body,
            grid=(608,),  # emulate the real program count
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TH, W, CH), jnp.float32),
            compiler_params=CP,
        )(y1s, w2b)
    return run


def k_c12_9tap(y_ref, w_ref, o_ref):
    acc = jnp.zeros((TH, W, CH), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            acc += jax.lax.dot_general(
                y_ref[ky:ky + TH, kx:kx + W, :], w_ref[ky, kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[:] = acc


def k_c12_kxhoist(y_ref, w_ref, o_ref):
    acc = jnp.zeros((TH, W, CH), jnp.float32)
    for kx in range(3):
        s = y_ref[:, kx:kx + W, :]  # one sublane relayout per kx
        for ky in range(3):
            acc += jax.lax.dot_general(
                s[ky:ky + TH], w_ref[ky, kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[:] = acc


def k_c12_laneconcat(y_ref, w_ref, o_ref):
    # z[t, c, (ky, ci)] = y[t+ky, c, ci]: K=192 over 3 dots
    z = jnp.concatenate(
        [y_ref[0:TH], y_ref[1:TH + 1], y_ref[2:TH + 2]], axis=2
    )  # (TH, W+2, 192)
    acc = jnp.zeros((TH, W, CH), jnp.float32)
    for kx in range(3):
        wk = jnp.concatenate([w_ref[0, kx], w_ref[1, kx], w_ref[2, kx]], axis=0)
        acc += jax.lax.dot_general(
            z[:, kx:kx + W, :], wk,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[:] = acc


timeit("c12: 9 tap dots", mk_c12(k_c12_9tap), y1s, w2b, iters=5)
timeit("c12: kx-hoisted slices", mk_c12(k_c12_kxhoist), y1s, w2b, iters=5)
timeit("c12: lane-concat K=192", mk_c12(k_c12_laneconcat), y1s, w2b, iters=5)
