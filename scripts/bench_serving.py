"""Serving load test: concurrent HTTP clients against the micro-batcher.

Drives a real in-process `DetectionServer` (trained artifact, TPU) with
burst + sustained mixed-bucket load and fresh JPEG bytes per request (the
tunnel content-dedups repeated buffers — see docs/PERFORMANCE.md), then
prints latency percentiles, wall throughput, and batcher counters.

Mixed landscape/portrait images land in different padded buckets, so the
sustained phase exercises the round-3 pipelined dispatch: the completer
thread fetches batch k-1 while the device runs batch k and the dispatcher
gathers k+1 (ctpn_tpu/serving.py).

    python scripts/bench_serving.py [--clients 64] [--sustained 96]
"""

import argparse
import io
import json
import os.path as osp
import sys
import threading
import time
import urllib.request

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
from PIL import Image

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
ARTIFACT = osp.join(ROOT, "data", "artifacts", "ctpn_synth_f16.npz")


def fresh_jpeg(rng, portrait=False):
    h, w = (900, 600) if portrait else (600, 900)
    arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def run_phase(url, n_clients, n_requests, rng, mixed):
    lat = []
    lock = threading.Lock()
    errors = []
    idx = iter(range(n_requests))

    def worker():
        local = np.random.RandomState(rng.randint(1 << 31))
        while True:
            with lock:
                i = next(idx, None)
            if i is None:
                return
            body = fresh_jpeg(local, portrait=mixed and i % 3 == 0)
            t0 = time.perf_counter()
            try:
                req = urllib.request.Request(url, data=body, method="POST")
                with urllib.request.urlopen(req, timeout=300) as r:
                    out = json.loads(r.read())
                    assert r.status == 200 and out["count"] == len(out["boxes"])
            except Exception as e:  # noqa: BLE001
                with lock:
                    errors.append(repr(e))
                continue
            with lock:
                lat.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    return np.array(lat), wall, errors


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--clients", type=int, default=64)
    p.add_argument("--sustained", type=int, default=96)
    p.add_argument("--max-batch", type=int, default=8)
    args = p.parse_args()

    from ctpn_tpu.inference.pipeline import CTPNPredictor
    from ctpn_tpu.serving import DetectionServer
    from ctpn_tpu.utils.compilation import ensure_compilation_cache
    from ctpn_tpu.utils.weights import load_params

    ensure_compilation_cache()
    predictor = CTPNPredictor(load_params(ARTIFACT))
    srv = DetectionServer(predictor, host="127.0.0.1", port=0,
                          max_batch=args.max_batch, window_ms=5.0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    host, port = srv.server_address
    url = f"http://{host}:{port}/detect"

    # warm both buckets at the serving batch size
    for bucket in ((608, 912), (912, 608)):
        print(f"warming bucket {bucket}...", flush=True)
        predictor.warmup(bucket, batch=args.max_batch)

    rng = np.random.RandomState(0)
    print(f"burst: {args.clients} simultaneous clients, one request each")
    lat, wall, errs = run_phase(url, args.clients, args.clients, rng, mixed=False)
    b0 = srv.batcher.batches_run
    print(f"  ok={len(lat)} err={len(errs)} wall={wall:.1f}s "
          f"p50={np.percentile(lat, 50) * 1e3:.0f}ms "
          f"p95={np.percentile(lat, 95) * 1e3:.0f}ms "
          f"batches={b0} ({args.clients / max(b0, 1):.1f} img/batch) "
          f"thru={len(lat) / wall:.1f} img/s")

    print(f"sustained mixed-bucket: 16 clients x {args.sustained} requests "
          f"(1/3 portrait)")
    lat, wall, errs = run_phase(url, 16, args.sustained, rng, mixed=True)
    b1 = srv.batcher.batches_run - b0
    print(f"  ok={len(lat)} err={len(errs)} wall={wall:.1f}s "
          f"p50={np.percentile(lat, 50) * 1e3:.0f}ms "
          f"p95={np.percentile(lat, 95) * 1e3:.0f}ms "
          f"batches={b1} ({args.sustained / max(b1, 1):.1f} img/batch) "
          f"thru={len(lat) / wall:.1f} img/s")
    print(f"shed={srv.batcher.shed} images_run={srv.batcher.images_run}")
    if errs:
        print("errors:", errs[:5])
    srv.shutdown()


if __name__ == "__main__":
    main()
