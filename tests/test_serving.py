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
        max_batch=4, window_ms=50.0,
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
    # (window 50 ms, max_batch 4 — at least one real coalesce)
    assert server.batcher.images_run == 4
    assert server.batcher.batches_run <= 3


def test_bad_requests(server):
    status, out = _post(_url(server, "/detect"), b"not an image")
    assert status == 400 and "error" in out
    status, out = _post(_url(server, "/detect?mode=X"), b"x")
    assert status == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(_url(server, "/nope"), timeout=30)
    assert ei.value.code == 404
