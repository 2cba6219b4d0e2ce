"""HTTP serving wrapper: micro-batched detection service end-to-end.

Spins a real DetectionServer (ephemeral port) with random weights on the
tiny test bucket and drives it with concurrent HTTP clients — the
micro-batcher must coalesce the simultaneous requests into one padded
device batch (one program per bucket, no per-request compiles).
"""

import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from ctpn_tpu.config import cfg


@pytest.fixture
def tiny_cfg(monkeypatch):
    monkeypatch.setattr(cfg.TEXT, "SCALE", 64)
    monkeypatch.setattr(cfg.TEXT, "MAX_SCALE", 96)
    monkeypatch.setattr(cfg.TPU, "BUCKETS", [[64, 96]])
    monkeypatch.setattr(cfg.TEST, "RPN_PRE_NMS_TOP_N", 256)
    monkeypatch.setattr(cfg.TEST, "RPN_POST_NMS_TOP_N", 64)


@pytest.fixture
def server(tiny_cfg):
    from ctpn_tpu.inference.pipeline import CTPNPredictor
    from ctpn_tpu.models.factory import get_network
    from ctpn_tpu.serving import DetectionServer

    model = get_network("VGGnet_test")
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32)
    )["params"]
    srv = DetectionServer(
        CTPNPredictor(params), host="127.0.0.1", port=0,
        max_batch=4, window_ms=250.0,
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _url(srv, path):
    host, port = srv.server_address
    return f"http://{host}:{port}{path}"


def _jpeg_bytes(rng):
    arr = rng.randint(0, 255, (60, 90, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def _post(url, body):
    req = urllib.request.Request(url, data=body, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=180) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=30) as r:
        out = json.loads(r.read())
    assert r.status == 200
    assert out["status"] == "ok"
    assert out["mode"] in ("H", "O")


def test_concurrent_requests_coalesce(server, rng):
    bodies = [_jpeg_bytes(rng) for _ in range(4)]
    results = [None] * 4

    def client(i):
        results[i] = _post(_url(server, "/detect"), bodies[i])

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for status, out in results:
        assert status == 200
        assert out["image_shape"] == [60, 90]
        assert isinstance(out["boxes"], list)
        assert out["count"] == len(out["boxes"])
        for rec in out["boxes"]:
            assert len(rec) == 9
    # the 4 simultaneous requests fit in fewer batches than requests
    # (window 250 ms, max_batch 4 — at least one real coalesce; the wide
    # window absorbs client-thread straggle on loaded CI hosts)
    assert server.batcher.images_run == 4
    assert server.batcher.batches_run < 4


def test_microbatcher_leftovers_seed_next_round():
    """Other-bucket items must lead the NEXT round, not requeue behind new
    arrivals (minority-bucket starvation)."""
    from ctpn_tpu.serving import MicroBatcher, _Pending

    mb = MicroBatcher.__new__(MicroBatcher)  # no thread start
    MicroBatcher.__init__(mb, predictor=None, max_batch=4, window_ms=1.0)

    def item(shape):
        return _Pending(np.zeros(shape + (3,), np.uint8),
                        np.zeros(3, np.float32), 1.0, shape)

    a1, b1, a2 = item((64, 96)), item((96, 64)), item((64, 96))
    for it in (a1, b1, a2):
        mb.submit(it)
    first = mb._gather()
    assert [id(x) for x in first] == [id(a1), id(a2)]
    assert mb._leftover == [b1]
    # a flood of majority-bucket arrivals must not delay b1
    for _ in range(8):
        mb.submit(item((64, 96)))
    second = mb._gather()
    assert second[0] is b1
    mb.stop()


def test_microbatcher_sheds_expired_requests():
    from ctpn_tpu.serving import MicroBatcher, _Pending

    class FakePredictor:
        calls = []

        def run_padded(self, images, infos, batch_size):
            self.calls.append(len(images))
            raise AssertionError("must not run for all-expired batch")

    mb = MicroBatcher.__new__(MicroBatcher)
    MicroBatcher.__init__(mb, predictor=FakePredictor(), max_batch=4,
                          window_ms=1.0)
    dead = _Pending(np.zeros((4, 4, 3), np.uint8), np.zeros(3, np.float32),
                    1.0, (4, 4), deadline=0.0)  # long expired
    mb._dispatch([dead])
    assert dead.event.is_set()
    assert isinstance(dead.error, TimeoutError)
    assert mb.shed == 1 and FakePredictor.calls == []
    mb.stop()


def test_dispatch_overlaps_result_fetch():
    """The dispatcher must launch batch k+1 while batch k's results are
    still being fetched (async dispatch + completer thread) — otherwise
    mixed-bucket load serializes on the device fetch."""
    import time as _time

    from ctpn_tpu.serving import MicroBatcher, _Pending

    release = threading.Event()

    class BlockingCount:
        """np.asarray(...) on this blocks until the test releases it."""

        def __array__(self, dtype=None, copy=None):
            assert release.wait(timeout=60)
            return np.ones(4, np.int32)

    class Lines:
        def __init__(self, blocking):
            self.count = BlockingCount() if blocking else np.ones(4, np.int32)
            self.recs = np.full((4, 8, 9), 2.0, np.float32)

    class FakePredictor:
        calls = []

        def run_padded(self, images, infos, batch_size):
            self.calls.append(len(images))
            # first batch's results "execute" slowly; later ones are ready
            return None, Lines(blocking=len(self.calls) == 1)

    mb = MicroBatcher(predictor=FakePredictor(), max_batch=2, window_ms=5.0)
    mb.start()

    def item():
        return _Pending(np.zeros((8, 8, 3), np.uint8),
                        np.ones(3, np.float32), 1.0, (8, 8))

    first = [item(), item()]
    for it in first:
        mb.submit(it)
    # completer is now blocked fetching batch 1; batch 2 must still dispatch
    second = [item(), item()]
    for it in second:
        mb.submit(it)
    deadline = _time.monotonic() + 30
    while len(FakePredictor.calls) < 2 and _time.monotonic() < deadline:
        _time.sleep(0.01)
    assert len(FakePredictor.calls) == 2, "second batch did not dispatch"
    assert not first[0].event.is_set()  # batch 1 results still in flight

    release.set()
    for it in first + second:
        assert it.event.wait(timeout=30)
        assert it.error is None
        assert it.result.shape == (1, 9)  # count=1 row, unscaled
    assert mb.batches_run == 2 and mb.images_run == 4
    mb.stop()


def test_bad_content_length_header(server):
    import http.client

    host, port = server.server_address
    conn = http.client.HTTPConnection(host, port, timeout=30)
    conn.putrequest("POST", "/detect")
    conn.putheader("Content-Length", "abc")
    conn.endheaders()
    resp = conn.getresponse()
    assert resp.status == 400
    assert b"Content-Length" in resp.read()
    conn.close()


def test_oversized_body_rejected_without_read(server):
    """A huge Content-Length must be refused up front (413), not buffered."""
    import http.client

    from ctpn_tpu.serving import MAX_BODY_BYTES

    host, port = server.server_address
    conn = http.client.HTTPConnection(host, port, timeout=30)
    conn.putrequest("POST", "/detect")
    conn.putheader("Content-Length", str(MAX_BODY_BYTES + 1))
    conn.endheaders()  # send headers only — the body never follows
    resp = conn.getresponse()
    assert resp.status == 413
    assert b"exceeds" in resp.read()
    conn.close()


def test_oversized_body_rejected_even_on_mode_mismatch(server):
    """The size cap must precede the mode-mismatch drain: a lying
    Content-Length on the ?mode= error path must get 413, not a buffered
    multi-GB read."""
    import http.client

    from ctpn_tpu.serving import MAX_BODY_BYTES

    host, port = server.server_address
    wrong = "O" if server.mode == "H" else "H"
    conn = http.client.HTTPConnection(host, port, timeout=30)
    conn.putrequest("POST", f"/detect?mode={wrong}")
    conn.putheader("Content-Length", str(MAX_BODY_BYTES + 1))
    conn.endheaders()  # headers only — the body never follows
    resp = conn.getresponse()
    assert resp.status == 413
    conn.close()


def test_bad_requests(server):
    status, out = _post(_url(server, "/detect"), b"not an image")
    assert status == 400 and "error" in out
    status, out = _post(_url(server, "/detect?mode=X"), b"x")
    assert status == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(_url(server, "/nope"), timeout=30)
    assert ei.value.code == 404
