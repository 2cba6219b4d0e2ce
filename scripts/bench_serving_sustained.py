"""Batcher-ceiling bench: sustained load with pre-decoded payloads.

`bench_serving.py` measures the full HTTP path with fresh JPEG bytes per
request — on this box that number is dominated by environment cost (HTTP +
JPEG decode on client/handler threads, and the tunnel's fresh-content H2D
penalty, see docs/PERFORMANCE.md). This bench isolates the serving CODE:
it drives `MicroBatcher` directly with pre-decoded, pre-prepped payloads
from a small reused pool (the tunnel content-dedups repeated buffers, so
H2D is cheap by construction), under closed-loop sustained load.

The question it answers: does the micro-batcher itself (gather window,
padding, dispatch/complete pipelining, handler wakeups) sustain near the
raw jit rate, or does it add a code-bound ceiling?

    python scripts/bench_serving_sustained.py [--seconds 30] [--clients 32]

Prints the raw jit rate on the same batch geometry, then the sustained
batcher throughput with p50/p99 latency and shed/batch counters.
"""

import argparse
import json
import os.path as osp
import sys
import threading
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
ARTIFACT = osp.join(ROOT, "data", "artifacts", "ctpn_synth_f16.npz")


def _payload_pool(n: int, bh: int, bw: int):
    """n distinct pre-prepped (image, info) payloads with real text."""
    from ctpn_tpu.data.synth import render_image
    from ctpn_tpu.utils.image import prep_image

    rng = np.random.RandomState(5)
    pool = []
    for _ in range(n):
        arr, _ = render_image(rng, width=900, height=600)
        data, info, _pad = prep_image(arr[..., ::-1], bucket=(bh, bw))
        pool.append((data, info))
    return pool


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=30.0)
    p.add_argument("--clients", type=int, default=32)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--window-ms", type=float, default=5.0)
    p.add_argument("--pool", type=int, default=16)
    args = p.parse_args()

    from ctpn_tpu.inference.pipeline import CTPNPredictor
    from ctpn_tpu.serving import MicroBatcher, _Pending
    from ctpn_tpu.utils.compilation import ensure_compilation_cache
    from ctpn_tpu.utils.weights import load_params

    ensure_compilation_cache()
    bh, bw = 608, 912
    predictor = CTPNPredictor(load_params(ARTIFACT))
    print(f"warming bucket ({bh}, {bw}) at batch {args.max_batch}...",
          flush=True)
    predictor.warmup((bh, bw), batch=args.max_batch)
    pool = _payload_pool(args.pool, bh, bw)

    # raw jit ceiling on the same geometry/content (run_padded includes the
    # same stack + unscale the batcher path pays per image)
    iters = 12
    _, lines = predictor.run_padded(
        [pool[0][0]] * args.max_batch, [pool[0][1]] * args.max_batch,
        args.max_batch,
    )
    np.asarray(lines.count)
    t0 = time.perf_counter()
    for i in range(iters):
        imgs = [pool[(i + j) % len(pool)][0] for j in range(args.max_batch)]
        infos = [pool[(i + j) % len(pool)][1] for j in range(args.max_batch)]
        _, lines = predictor.run_padded(imgs, infos, args.max_batch)
    np.asarray(lines.count)
    jit_rate = args.max_batch * iters / (time.perf_counter() - t0)
    print(f"raw jit rate (batch {args.max_batch}): {jit_rate:.1f} img/s",
          flush=True)

    batcher = MicroBatcher(predictor, max_batch=args.max_batch,
                           window_ms=args.window_ms)
    batcher.start()

    lat = []
    lock = threading.Lock()
    stop_at = time.monotonic() + args.seconds
    errors = []

    def client(cid: int):
        k = cid
        while time.monotonic() < stop_at:
            data, info = pool[k % len(pool)]
            k += args.clients
            item = _Pending(data, info, 1.0, (600, 900),
                            deadline=time.monotonic() + 60.0)
            t0 = time.monotonic()
            batcher.submit(item)
            if not item.event.wait(timeout=90.0):
                with lock:
                    errors.append("wait timeout")
                continue
            if item.error is not None:
                with lock:
                    errors.append(repr(item.error))
                continue
            with lock:
                lat.append(time.monotonic() - t0)

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    batcher.stop()

    lat_arr = np.asarray(lat)
    sustained = len(lat) / wall
    line = {
        "metric": "serving_batcher_sustained_throughput",
        "value": round(sustained, 2),
        "unit": "images/sec",
        "jit_rate": round(jit_rate, 2),
        "batcher_efficiency": round(sustained / jit_rate, 4),
        "p50_ms": round(float(np.percentile(lat_arr, 50)) * 1e3, 1),
        "p99_ms": round(float(np.percentile(lat_arr, 99)) * 1e3, 1),
        "ok": len(lat),
        "errors": len(errors),
        "shed": batcher.shed,
        "batches": batcher.batches_run,
        "img_per_batch": round(batcher.images_run
                               / max(1, batcher.batches_run), 2),
        "clients": args.clients,
        "seconds": round(wall, 1),
    }
    print(json.dumps(line))
    if errors:
        print("errors:", errors[:5], file=sys.stderr)


if __name__ == "__main__":
    main()
