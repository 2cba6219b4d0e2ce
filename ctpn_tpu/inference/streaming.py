"""High-throughput streaming inference over image collections.

The serving-oriented path the reference lacks entirely (its demo processes
one image at a time, synchronously, with host NMS — `ctpn/demo.py:55-68`):

* host workers decode/resize/pad images into bucket-keyed batches
  (threaded, bounded queues);
* one compiled program per bucket (cached across the stream);
* device double-buffering: batch k+1 is enqueued while batch k runs;
* results stream back as (path, records) pairs with boxes mapped to the
  original image coordinates.

With a data-parallel mesh the batch axis shards across chips — the same
program scales from 1 chip to a v5e-8 pod slice.
"""

from __future__ import annotations

import collections
import threading
import queue as queue_mod
from typing import Dict, Iterable, Iterator, List, Tuple

import numpy as np

from ctpn_tpu.config import cfg
from ctpn_tpu.inference.pipeline import CTPNPredictor, unscale_records
from ctpn_tpu.utils.image import load_image_bgr, resize_im


class _Prepped(collections.namedtuple(
        "_Prepped", "path image info f1 orig_shape pad")):
    pass


def _prep_worker(paths_q, out_q, stop):
    while not stop.is_set():
        try:
            path = paths_q.get_nowait()
        except queue_mod.Empty:
            out_q.put(None)
            return
        try:
            im = load_image_bgr(path)
            resized, f1 = resize_im(im, cfg.TEXT.SCALE, cfg.TEXT.MAX_SCALE)
            h, w = resized.shape[:2]
            # second-stage TEST resize factor is folded by prep on bucket pad
            from ctpn_tpu.utils.image import prep_image

            data, info, pad = prep_image(resized)
            out_q.put(_Prepped(path, data, info, f1, im.shape[:2], pad))
        except Exception as e:  # pragma: no cover
            out_q.put(e)


def stream_detect(
    paths: Iterable[str],
    predictor: CTPNPredictor,
    batch_size: int = 8,
    workers: int = 4,
) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (path, (M, 9) records in original coords) for every image."""
    paths = list(paths)
    paths_q: "queue_mod.Queue" = queue_mod.Queue()
    for p in paths:
        paths_q.put(p)
    out_q: "queue_mod.Queue" = queue_mod.Queue(maxsize=batch_size * 4)
    stop = threading.Event()
    threads = [
        threading.Thread(target=_prep_worker, args=(paths_q, out_q, stop), daemon=True)
        for _ in range(workers)
    ]
    for t in threads:
        t.start()

    # bucket-keyed accumulation; flush when a bucket batch fills
    buckets: Dict[Tuple[int, int], List[_Prepped]] = collections.defaultdict(list)
    done_workers = 0
    inflight: List[Tuple[List[_Prepped], object]] = []

    def flush(items: List[_Prepped]):
        out = predictor.run_padded(  # async dispatch; partial batches padded
            [it.image for it in items], [it.info for it in items], batch_size
        )
        inflight.append((items, out))

    def drain():
        items, (props, lines) = inflight.pop(0)
        counts = np.asarray(lines.count)
        recs_all = np.asarray(lines.recs)
        for b, it in enumerate(items):
            yield it.path, unscale_records(
                recs_all[b], int(counts[b]), it.f1, it.info, y_off=it.pad
            )

    try:
        while done_workers < workers or any(buckets.values()):
            if done_workers < workers:
                item = out_q.get()
                if item is None:
                    done_workers += 1
                    continue
                if isinstance(item, Exception):
                    raise item
                key = item.image.shape[:2]
                buckets[key].append(item)
                if len(buckets[key]) >= batch_size:
                    flush(buckets.pop(key))
            else:
                key = next(k for k, v in buckets.items() if v)
                flush(buckets.pop(key))
            # keep at most 2 batches in flight (double buffering)
            while len(inflight) > 1:
                yield from drain()
        while inflight:
            yield from drain()
    finally:
        stop.set()
