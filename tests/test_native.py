"""Native C++ host library parity vs numpy oracles (skips if not built)."""

import numpy as np
import pytest

from ctpn_tpu import native
from ctpn_tpu.postprocess import oracle as O
from ctpn_tpu.utils import host_ref as H
from tests.conftest import random_boxes
from tests.test_connector import make_strip_scene

needs_lib = pytest.mark.skipif(
    not native.available(), reason="native/libctpn_host.so not built"
)


@needs_lib
def test_native_nms_matches_oracle(rng):
    boxes = random_boxes(rng, 200, max_wh=80)
    scores = rng.uniform(0, 1, 200).astype(np.float32)
    dets = np.hstack([boxes, scores[:, None]]).astype(np.float32)
    for t in (0.3, 0.7):
        assert native.nms(dets, t) == H.py_nms(dets, t)


@needs_lib
def test_native_overlaps_match(rng):
    b = random_boxes(rng, 50)
    q = random_boxes(rng, 31)
    np.testing.assert_allclose(
        native.bbox_overlaps(b, q), H.bbox_overlaps_np(b, q), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        native.bbox_intersections(b, q),
        H.bbox_intersections_np(b, q),
        rtol=1e-5,
        atol=1e-6,
    )


@needs_lib
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_graph_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    boxes, scores = make_strip_scene(rng)
    want = O.build_graph_np(boxes.astype(np.float64), scores, (600, 900))
    succ = native.build_graph_successors(boxes, scores, 900)
    got = np.zeros_like(want)
    for i, j in enumerate(succ):
        if j >= 0:
            got[i, j] = True
    np.testing.assert_array_equal(got, want)


def test_fallback_without_lib(rng, monkeypatch):
    monkeypatch.setattr(native, "_load", lambda: None)
    boxes = random_boxes(rng, 40)
    scores = rng.uniform(0, 1, 40).astype(np.float32)
    dets = np.hstack([boxes, scores[:, None]]).astype(np.float32)
    assert native.nms(dets, 0.5) == H.py_nms(dets, 0.5)
