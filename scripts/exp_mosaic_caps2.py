"""Probe round 2: concat on leading dim, pooling reshapes, lax.slice strides."""
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


def run(kernel, out_shape, *inputs):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*inputs)


x = jnp.arange(TH * W * C, dtype=jnp.bfloat16).reshape(TH, W, C) % 7


def k_concat_lead(a_ref, b_ref, o_ref):
    o_ref[:] = jnp.concatenate([a_ref[:], b_ref[TH - 4 :]], axis=0)


probe("concat_leading_dim", lambda: run(
    k_concat_lead, jax.ShapeDtypeStruct((TH + 4, W, C), jnp.bfloat16), x, x
))


def k_pool_lead(x_ref, o_ref):
    y = x_ref[:].reshape(TH // 2, 2, W, C)
    o_ref[:] = jnp.max(y, axis=1)


probe("pool_reshape_leading", lambda: run(
    k_pool_lead, jax.ShapeDtypeStruct((TH // 2, W, C), jnp.bfloat16), x
))


def k_pool_sublane(x_ref, o_ref):
    y = x_ref[:].reshape(TH, W // 2, 2, C)
    o_ref[:] = jnp.max(y, axis=2)


probe("pool_reshape_sublane", lambda: run(
    k_pool_sublane, jax.ShapeDtypeStruct((TH, W // 2, C), jnp.bfloat16), x
))


def k_lax_slice(x_ref, o_ref):
    o_ref[:] = jax.lax.slice(x_ref[:], (0, 0, 0), (TH, W, C), (1, 2, 1))


probe("lax_slice_stride2_sublane", lambda: run(
    k_lax_slice, jax.ShapeDtypeStruct((TH, W // 2, C), jnp.bfloat16), x
))


def k_roll(x_ref, o_ref):
    o_ref[:] = jnp.maximum(x_ref[:], pltpu.roll(x_ref[:], -1, 1))


probe("pltpu_roll_sublane", lambda: run(
    k_roll, jax.ShapeDtypeStruct((TH, W, C), jnp.bfloat16), x
))


def k_transpose(x_ref, o_ref):
    o_ref[:] = jnp.swapaxes(x_ref[:], 1, 2)


probe("transpose_minor2", lambda: run(
    k_transpose, jax.ShapeDtypeStruct((TH, C, W), jnp.bfloat16), x
))


def k_u8_via_i32(x_ref, o_ref):
    xi = x_ref[:].astype(jnp.int32).astype(jnp.float32)
    o_ref[:] = (xi - 127.5).astype(jnp.bfloat16)


probe("uint8_via_int32", lambda: run(
    k_u8_via_i32,
    jax.ShapeDtypeStruct((TH, W, C), jnp.bfloat16),
    jnp.ones((TH, W, C), jnp.uint8),
))


# 4D input block: (1, TH, W, C) with leading squeeze
def k_4d(x_ref, o_ref):
    o_ref[:] = x_ref[0] * 2.0


probe("block4d_squeeze", lambda: pl.pallas_call(
    k_4d,
    grid=(2,),
    out_shape=jax.ShapeDtypeStruct((2 * TH, W, C), jnp.bfloat16),
    in_specs=[pl.BlockSpec((1, TH, W, C), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((TH, W, C), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM),
)(jnp.ones((2, TH, W, C), jnp.bfloat16)))


# f32 accumulate pattern at (TH+2, W+2, 64) scale with 9 taps of dot_general
def k_conv_shape(x_ref, w_ref, o_ref):
    acc = jnp.zeros((TH, W, C), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            tap = x_ref[ky : ky + TH, kx : kx + W, :]
            acc += jax.lax.dot_general(
                tap, w_ref[ky, kx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[:] = jnp.maximum(acc, 0.0).astype(jnp.bfloat16)


probe("conv_9tap_dot", lambda: run(
    k_conv_shape,
    jax.ShapeDtypeStruct((TH, W, C), jnp.bfloat16),
    jnp.ones((TH + 2, W + 2, C), jnp.bfloat16),
    jnp.ones((3, 3, C, C), jnp.bfloat16),
))
