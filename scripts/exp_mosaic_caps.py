"""Probe Mosaic capabilities needed by a fused stage-1 conv kernel."""
import sys
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np

TH, W, C = 16, 256, 64


def probe(name, fn):
    try:
        out = fn()
        print(f"{name}: OK", np.asarray(out).ravel()[:2])
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e).splitlines()[0][:110]}")


x3 = jnp.ones((TH, W, C), jnp.bfloat16)
w2 = jnp.ones((C, C), jnp.bfloat16)


def k_dot3d(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)


probe("dot_general_3dx2d", lambda: pl.pallas_call(
    k_dot3d,
    out_shape=jax.ShapeDtypeStruct((TH, W, C), jnp.bfloat16),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x3, w2))


def k_merge(x_ref, w_ref, o_ref):
    xm = x_ref[:].reshape(TH * W, C)
    o_ref[:] = jnp.dot(xm, w_ref[:], preferred_element_type=jnp.float32).astype(
        jnp.bfloat16
    ).reshape(TH, W, C)


probe("reshape_merge_leading", lambda: pl.pallas_call(
    k_merge,
    out_shape=jax.ShapeDtypeStruct((TH, W, C), jnp.bfloat16),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x3, w2))


def k_pad2(x_ref, o_ref):
    x = x_ref[:]  # (TH, W, C)
    o_ref[:] = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))[:, 1:-1, :] * 2.0


probe("pad_two_sided_mid", lambda: pl.pallas_call(
    k_pad2,
    out_shape=jax.ShapeDtypeStruct((TH, W, C), jnp.bfloat16),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x3))


def k_strided(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = jnp.maximum(x[:, 0::2, :], x[:, 1::2, :])


probe("strided_slice_sublane", lambda: pl.pallas_call(
    k_strided,
    out_shape=jax.ShapeDtypeStruct((TH, W // 2, C), jnp.bfloat16),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x3))


def k_strided_lead(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = jnp.maximum(x[0::2], x[1::2])


probe("strided_slice_leading", lambda: pl.pallas_call(
    k_strided_lead,
    out_shape=jax.ShapeDtypeStruct((TH // 2, W, C), jnp.bfloat16),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(x3))


# DMA with dynamic row offset from an ANY-space (HBM) input
def k_dma(x_hbm, o_ref):
    i = pl.program_id(0)

    def body(scratch, sem):
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * TH, TH + 4)], scratch, sem
        )
        dma.start()
        dma.wait()
        o_ref[:] = scratch[2 : TH + 2] * 2.0

    pl.run_scoped(
        body,
        pltpu.VMEM((TH + 4, W, C), jnp.bfloat16),
        pltpu.SemaphoreType.DMA(()),
    )


xbig = jnp.ones((4 * TH + 4, W, C), jnp.bfloat16)
probe("dma_dynamic_rows", lambda: pl.pallas_call(
    k_dma,
    grid=(4,),
    out_shape=jax.ShapeDtypeStruct((4 * TH, W, C), jnp.bfloat16),
    in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec(
        (TH, W, C), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    ),
)(xbig))


# uint8 -> bf16 conversion in-kernel
def k_u8(x_ref, o_ref):
    o_ref[:] = x_ref[:].astype(jnp.bfloat16) - 127.5


probe("uint8_load_convert", lambda: pl.pallas_call(
    k_u8,
    out_shape=jax.ShapeDtypeStruct((TH, W, C), jnp.bfloat16),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(jnp.ones((TH, W, C), jnp.uint8)))
