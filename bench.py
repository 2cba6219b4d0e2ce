"""Benchmark: end-to-end CTPN inference throughput on the available chip(s).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": R, ...}

Measures the full detection pipeline (mean-subtract -> VGG16 bf16 -> BiLSTM
-> heads -> on-device proposal decode with NMS -> text connector) at the
600x900 target geometry (padded bucket 608x912), batched.

The headline number runs REAL content through TRAINED weights (the
committed artifact on the reference demo photographs + synthetic scene-text
renders): NMS sweep counts, the fused kernel's early-exit point and the
connector's closure rounds are all data-dependent, and real text produces
the clustered high-scoring proposals that random noise does not. A
random-noise/random-weights row is also measured for comparison
(``noise_imgs_per_sec``); set BENCH_CONTENT=noise to make it the headline
(e.g. when the artifact is absent).

Baseline: BASELINE.json targets >= 1000 images/sec on a v5e-8 (8 chips) =
125 images/sec/chip; vs_baseline = measured_per_chip / 125.
"""

import glob
import json
import os
import os.path as osp
import sys
import time

import numpy as np

ROOT = osp.dirname(osp.abspath(__file__))
ARTIFACT = osp.join(ROOT, "data", "artifacts", "ctpn_synth_f16.npz")
REF_DEMO = "/root/reference/data/demo"


def _real_batch(batch: int, bh: int, bw: int):
    """(batch, bh, bw, 3) uint8 real-content images + per-image im_info.

    Reference demo photographs (when the reference tree exists) cycled
    first, then seeded synthetic scene-text renders fill the remainder —
    deterministic, and every frame contains actual text.
    """
    from ctpn_tpu.data.synth import render_image
    from ctpn_tpu.utils.image import load_image_bgr, prep_image

    sources = []
    for p in sorted(glob.glob(osp.join(REF_DEMO, "*"))):
        try:
            sources.append(load_image_bgr(p))
        except Exception:
            pass
    rng = np.random.RandomState(11)
    images, infos = [], []
    for i in range(batch):
        if i < len(sources):
            im = sources[i]
        else:
            arr, _ = render_image(rng, width=900, height=600)
            im = arr[..., ::-1]  # RGB -> BGR
        data, info = prep_image(im, bucket=(bh, bw))
        images.append(data)
        infos.append(info)
    return np.stack(images), np.stack(infos)


def _noise_batch(batch: int, bh: int, bw: int):
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (batch, bh, bw, 3)).astype(np.uint8)
    infos = np.tile(np.array([600, 900, 1.0], np.float32), (batch, 1))
    return images, infos


def _time_detect(detect, params, images, infos, iters):
    import jax.numpy as jnp

    images = jnp.asarray(images)
    infos = jnp.asarray(infos)
    # warmup / compile (fetch a value — block_until_ready alone does not
    # force execution on tunnel backends)
    _, lines = detect(params, images, infos)
    np.asarray(lines.count)
    t0 = time.perf_counter()
    for _ in range(iters):
        _, lines = detect(params, images, infos)
    np.asarray(lines.count)
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp

    from ctpn_tpu.inference.pipeline import build_detect_fn
    from ctpn_tpu.models.factory import get_network
    from ctpn_tpu.utils.compilation import ensure_compilation_cache
    from ctpn_tpu.utils.weights import load_params

    ensure_compilation_cache()

    n_dev = jax.device_count()
    backend = jax.default_backend()

    bh, bw = 608, 912
    # batch 48 is the single-chip throughput sweet spot (docs/PERFORMANCE.md)
    batch = int(os.environ.get("BENCH_BATCH", "48" if backend == "tpu" else "2"))
    iters = int(os.environ.get("BENCH_ITERS", "14" if backend == "tpu" else "2"))
    content = os.environ.get("BENCH_CONTENT", "real")
    if content not in ("real", "noise"):
        sys.exit(f"BENCH_CONTENT must be 'real' or 'noise', got {content!r}")
    if content == "real" and not osp.exists(ARTIFACT):
        content = "noise"

    model = get_network("VGGnet_test")
    detect = jax.jit(build_detect_fn(model, mode="H"))

    rand_params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, bh, bw, 3), jnp.float32)
    )["params"]

    results = {}
    noise_images, noise_infos = _noise_batch(batch, bh, bw)
    dt = _time_detect(detect, rand_params, noise_images, noise_infos, iters)
    results["noise"] = batch * iters / dt

    if content == "real":
        real_params = load_params(ARTIFACT)
        real_images, real_infos = _real_batch(batch, bh, bw)
        dt = _time_detect(detect, real_params, real_images, real_infos, iters)
        results["real"] = batch * iters / dt

    imgs_per_sec = results[content]
    per_chip = imgs_per_sec / max(
        1, len({d for d in jax.devices() if d.platform != "cpu"}) or 1
    )
    target_per_chip = 1000.0 / 8.0
    line = {
        "metric": "ctpn_e2e_inference_throughput_600x900",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(per_chip / target_per_chip, 4),
        "content": content,
    }
    if content == "real":
        line["noise_imgs_per_sec"] = round(results["noise"], 2)
    print(json.dumps(line))
    print(
        f"# backend={backend} devices={n_dev} batch={batch} iters={iters} "
        f"content={content} per_chip={per_chip:.1f} img/s "
        f"all={ {k: round(v, 1) for k, v in results.items()} }",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
