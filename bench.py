"""Benchmark: end-to-end CTPN inference throughput on the available chip(s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": R}

Measures the full detection pipeline (mean-subtract -> VGG16 bf16 -> BiLSTM
-> heads -> on-device proposal decode with NMS -> text connector) at the
600x900 target geometry (padded bucket 608x912), batched.

Baseline: BASELINE.json targets >= 1000 images/sec on a v5e-8 (8 chips) =
125 images/sec/chip; vs_baseline = measured_per_chip / 125.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ctpn_tpu.inference.pipeline import build_detect_fn
    from ctpn_tpu.models.factory import get_network
    from ctpn_tpu.utils.compilation import ensure_compilation_cache

    ensure_compilation_cache()

    n_dev = jax.device_count()
    backend = jax.default_backend()

    bh, bw = 608, 912
    # batch 48 is the single-chip throughput sweet spot (see docs/PERFORMANCE.md)
    batch = int(os.environ.get("BENCH_BATCH", "48" if backend == "tpu" else "2"))
    iters = int(os.environ.get("BENCH_ITERS", "14" if backend == "tpu" else "2"))

    model = get_network("VGGnet_test")
    rng = np.random.RandomState(0)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, bh, bw, 3), jnp.float32)
    )["params"]

    detect = jax.jit(build_detect_fn(model, mode="H"))
    images = jnp.asarray(
        rng.randint(0, 256, (batch, bh, bw, 3)).astype(np.uint8)
    )
    infos = jnp.asarray(
        np.tile(np.array([600, 900, 1.0], np.float32), (batch, 1))
    )

    # warmup / compile (fetch a value — block_until_ready alone does not
    # force execution on tunnel backends)
    props, lines = detect(params, images, infos)
    np.asarray(lines.count)

    t0 = time.perf_counter()
    for _ in range(iters):
        props, lines = detect(params, images, infos)
    np.asarray(lines.count)
    dt = time.perf_counter() - t0

    imgs_per_sec = batch * iters / dt
    per_chip = imgs_per_sec / max(
        1, len({d for d in jax.devices() if d.platform != "cpu"}) or 1
    )
    target_per_chip = 1000.0 / 8.0
    print(
        json.dumps(
            {
                "metric": "ctpn_e2e_inference_throughput_600x900",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec",
                "vs_baseline": round(per_chip / target_per_chip, 4),
            }
        )
    )
    print(
        f"# backend={backend} devices={n_dev} batch={batch} iters={iters} "
        f"dt={dt:.3f}s per_chip={per_chip:.1f} img/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
