"""Serving-path benchmark: the full streaming pipeline, not just the jit loop.

    python scripts/bench_streaming.py [--images 128] [--batch 16] \
        [--artifact /path/to/artifact] [--latency]

Measures `ctpn_tpu.inference.streaming.stream_detect` end to end: JPEG decode
on host worker threads, resize + bucket padding, double-buffered device
dispatch, box un-scaling — over a MIXED landscape/portrait synthetic corpus
(two shape buckets, so per-bucket program switching is part of the run).
This is the flow that supersedes the reference's one-image-at-a-time demo
loop (`ctpn/demo.py:55-68`).

With ``--latency`` it also times single-image `detect_image` calls (batch 1,
host->device->host) for the per-image serving latency figure.

Prints one JSON line per measurement (streaming row + optional latency row).
"""

import argparse
import json
import os
import os.path as osp
import sys
import tempfile
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=128)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--artifact", default=None,
                   help="trained params dir (realistic proposal counts); "
                        "random init if omitted")
    p.add_argument("--latency", action="store_true",
                   help="also measure single-image latency")
    p.add_argument("--corpus", default=None,
                   help="existing image dir; synthesized if omitted")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ctpn_tpu.inference.pipeline import CTPNPredictor
    from ctpn_tpu.inference.streaming import stream_detect
    from ctpn_tpu.utils.compilation import ensure_compilation_cache

    ensure_compilation_cache()
    backend = jax.default_backend()

    if args.corpus:
        import glob

        paths = sorted(
            sum((glob.glob(osp.join(args.corpus, e))
                 for e in ("*.jpg", "*.jpeg", "*.png")), [])
        )[: args.images]
    else:
        from ctpn_tpu.data.synth import generate_dataset

        tmp = tempfile.mkdtemp(prefix="bench_stream_")
        img_dir, _ = generate_dataset(tmp, n_images=args.images, seed=11)
        paths = sorted(
            osp.join(img_dir, f) for f in os.listdir(img_dir)
            if f.endswith(".jpg")
        )

    if args.artifact:
        from ctpn_tpu.utils.weights import load_params

        params = load_params(args.artifact)
    else:
        from ctpn_tpu.models.factory import get_network

        model = get_network("VGGnet_test")
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 608, 912, 3), jnp.float32)
        )["params"]

    predictor = CTPNPredictor(params)

    # warm EVERY bucket program (and its lazy first-fetch transfer path)
    # outside the timed region: stratify the warm set by bucket so a
    # corpus that leads with one orientation doesn't leave the other
    # bucket compiling inside the timed loop
    from PIL import Image

    from ctpn_tpu.config import cfg as _cfg
    from ctpn_tpu.utils.image import pick_bucket, resize_factor

    by_bucket = {}
    for p_ in paths:
        with Image.open(p_) as im_:
            w, h = im_.size
        f_ = resize_factor(h, w, _cfg.TEXT.SCALE, _cfg.TEXT.MAX_SCALE)
        by_bucket.setdefault(
            pick_bucket(int(round(h * f_)), int(round(w * f_))), []
        ).append(p_)
    warm = sum((ps[: args.batch] for ps in by_bucket.values()), [])
    for _ in stream_detect(warm, predictor, batch_size=args.batch,
                           workers=args.workers):
        pass

    t0 = time.perf_counter()
    n_out = 0
    n_boxes = 0
    for _path, recs in stream_detect(paths, predictor,
                                     batch_size=args.batch,
                                     workers=args.workers):
        n_out += 1
        n_boxes += len(recs)
    dt = time.perf_counter() - t0
    assert n_out == len(paths), (n_out, len(paths))

    imgs_per_sec = n_out / dt
    target_per_chip = 1000.0 / 8.0
    print(json.dumps({
        "metric": "ctpn_streaming_serving_throughput",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / target_per_chip, 4),
    }))
    print(
        f"# backend={backend} images={n_out} batch={args.batch} "
        f"workers={args.workers} dt={dt:.3f}s "
        f"boxes/img={n_boxes / max(1, n_out):.1f}",
        file=sys.stderr,
    )

    if args.latency:
        from ctpn_tpu.utils.image import load_image_bgr

        ims = [load_image_bgr(p) for p in paths[:16]]
        # warm the batch-1 program of every bucket represented in the set
        seen = set()
        for im in ims:
            key = im.shape[:2]
            if key not in seen:
                seen.add(key)
                predictor.detect_image(im)
        lats = []
        for im in ims:
            t = time.perf_counter()
            predictor.detect_image(im)
            lats.append(time.perf_counter() - t)
        lats = np.array(lats) * 1e3
        print(json.dumps({
            "metric": "ctpn_single_image_latency_p50",
            "value": round(float(np.percentile(lats, 50)), 2),
            "unit": "ms",
            "vs_baseline": None,
        }))
        print(
            f"# latency ms p50={np.percentile(lats, 50):.1f} "
            f"p90={np.percentile(lats, 90):.1f} max={lats.max():.1f}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
