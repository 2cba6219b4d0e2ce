"""Experiment (VERDICT r2 #3): MEASURE space-to-depth stage-1 variants.

Round 2 rejected space-to-depth on FLOP-inflation analysis alone; this
script builds EXACT s2d reformulations of VGG stage 1 (conv1_1 -> relu ->
conv1_2 -> relu -> 2x2 maxpool), verifies them numerically against the
stock stage, and times everything on the real chip.

Two reformulations of a full-res 3x3 SAME conv on the 2x2 space-to-depth
grid (x_s2d[b,i,j,(dy*2+dx)*C+c] = x[b,2i+dy,2j+dx,c]):

* K3: one 3x3 conv, 4C_in -> 4C_out, phase-mixed kernel with zero taps
  where ky=2qy+dy-py+1 falls outside [0,3). 4x the MACs, full 128+ lanes,
  1/4 the rows. Border-exact (the only out-of-range full-res rows the s2d
  padding introduces are never addressed by valid taps).
* P4: four 2x2 convs (one per output phase py,px) on shifted slices of a
  once-padded input. 1.78x the MACs but C_out stays 64 (half-lane again).

The aligned 2x2 maxpool is a free phase-group max in s2d layout, so the
fused s2d stage eliminates pool1 entirely and hands stage 2 an s2d-form
(B,H/4,W/4,256) tensor.
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

B, H, W = 32, 608, 912
HS, WS = H // 2, W // 2


def s2d(x):
    """(B,H,W,C) -> (B,H/2,W/2,4C), channel layout (dy,dx,c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def make_k3_kernel(w):
    """(3,3,Cin,Cout) full-res kernel -> (3,3,4Cin,4Cout) s2d kernel."""
    cin, cout = w.shape[2], w.shape[3]
    w2 = np.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for py in range(2):
        for px in range(2):
            for qy in range(-1, 2):
                for qx in range(-1, 2):
                    for dy in range(2):
                        for dx in range(2):
                            ky = 2 * qy + dy - py + 1
                            kx = 2 * qx + dx - px + 1
                            if 0 <= ky < 3 and 0 <= kx < 3:
                                w2[qy + 1, qx + 1,
                                   (dy * 2 + dx) * cin:(dy * 2 + dx + 1) * cin,
                                   (py * 2 + px) * cout:(py * 2 + px + 1) * cout,
                                   ] = w[ky, kx]
    return w2


def make_p4_kernels(w):
    """Per-phase 2x2 kernels: phase (py,px) -> (2,2,4Cin,Cout).

    The phase conv runs VALID on input padded by 1 s2d pixel on every
    side, sliced so its 2x2 window covers s2d offsets {py-1, py} x
    {px-1, px}  (i.e. qy in {-1,0} for py=0, {0,1} for py=1).
    """
    cin, cout = w.shape[2], w.shape[3]
    out = {}
    for py in range(2):
        for px in range(2):
            k = np.zeros((2, 2, 4 * cin, cout), w.dtype)
            for ay in range(2):          # window tap index
                for ax in range(2):
                    qy, qx = ay - 1 + py, ax - 1 + px
                    for dy in range(2):
                        for dx in range(2):
                            ky = 2 * qy + dy - py + 1
                            kx = 2 * qx + dx - px + 1
                            if 0 <= ky < 3 and 0 <= kx < 3:
                                k[ay, ax,
                                  (dy * 2 + dx) * cin:(dy * 2 + dx + 1) * cin,
                                  ] = w[ky, kx]
            out[(py, px)] = k
    return out


def conv(x, k, stride=1, padding="SAME", dtype=jnp.bfloat16):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), jnp.asarray(k).astype(dtype), (stride, stride),
        padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
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
    rng = np.random.RandomState(0)
    k1 = (rng.rand(3, 3, 3, 64).astype(np.float32) - 0.5) * 0.2
    k2 = (rng.rand(3, 3, 64, 64).astype(np.float32) - 0.5) * 0.2
    k1_s2d, k2_s2d = make_k3_kernel(k1), make_k3_kernel(k2)
    k1_p4, k2_p4 = make_p4_kernels(k1), make_p4_kernels(k2)

    def stage1(x, dtype=jnp.bfloat16):
        y = jax.nn.relu(conv(x, k1, dtype=dtype))
        y = jax.nn.relu(conv(y, k2, dtype=dtype))
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )

    def stage1_s2d_k3(x, dtype=jnp.bfloat16):
        xs = s2d(x)
        y = jax.nn.relu(conv(xs, k1_s2d, dtype=dtype))
        y = jax.nn.relu(conv(y, k2_s2d, dtype=dtype))
        b, hs, ws, _ = y.shape
        return y.reshape(b, hs, ws, 4, 64).max(axis=3)

    def phase_conv(xs_pad, kern, py, px, dtype):
        # VALID 2x2 over the slice whose first window row is qy=py-1
        sl = xs_pad[:, py:py + HS + 1, px:px + WS + 1]
        return conv(sl, kern, padding="VALID", dtype=dtype)

    def stage1_s2d_p4(x, dtype=jnp.bfloat16):
        xs = s2d(x)
        acc = None
        xs_pad = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h = []
        for py in range(2):
            for px in range(2):
                h.append(jax.nn.relu(
                    phase_conv(xs_pad, k1_p4[(py, px)], py, px, dtype)))
        y = jnp.concatenate(h, axis=-1)  # phase layout (py,px,c)
        y_pad = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        for py in range(2):
            for px in range(2):
                z = jax.nn.relu(
                    phase_conv(y_pad, k2_p4[(py, px)], py, px, dtype))
                out = z if out is None else jnp.maximum(out, z)
        return out  # phase-max = pool1

    # --- numerical check on a small f32 shape ---
    xt = jnp.asarray(rng.rand(2, 32, 48, 3).astype(np.float32))
    global HS, WS
    hs_saved, ws_saved = HS, WS
    HS, WS = 16, 24
    ref = np.asarray(stage1(xt, jnp.float32))
    for name, fn in (("k3", stage1_s2d_k3), ("p4", stage1_s2d_p4)):
        got = np.asarray(fn(xt, jnp.float32))
        err = np.abs(got - ref).max()
        print(f"exactness {name}: max|diff| = {err:.2e}")
        assert err < 1e-4, name
    HS, WS = hs_saved, ws_saved

    # --- timing at bench geometry ---
    x = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    t_base = timeit("stage1 stock (conv+conv+pool)", jax.jit(stage1), x)
    t_k3 = timeit("stage1 s2d K3 (4x MACs, full-lane)", jax.jit(stage1_s2d_k3), x)
    t_p4 = timeit("stage1 s2d P4 (1.78x MACs, 4 convs)", jax.jit(stage1_s2d_p4), x)

    # piecewise attribution
    y64 = jnp.asarray(rng.rand(B, H, W, 64).astype(np.float32)).astype(jnp.bfloat16)
    timeit("conv1_1 stock", jax.jit(lambda a: jax.nn.relu(conv(a, k1))), x)
    timeit("conv1_2 stock", jax.jit(lambda a: jax.nn.relu(conv(a, k2))), y64)
    timeit("pool1 stock", jax.jit(lambda a: jax.lax.reduce_window(
        a, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")), y64)
    xs256 = jnp.asarray(rng.rand(B, HS, WS, 256).astype(np.float32)).astype(jnp.bfloat16)
    timeit("conv1_2 s2d-K3 alone (256->256 @ H/2)",
           jax.jit(lambda a: jax.nn.relu(conv(a, k2_s2d))), xs256)

    print(f"\nsummary: stock {t_base:.1f} ms, s2d-K3 {t_k3:.1f}, s2d-P4 {t_p4:.1f}")


if __name__ == "__main__":
    main()
