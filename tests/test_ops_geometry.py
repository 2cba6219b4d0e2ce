"""Unit tests: anchors, box transforms, IoU vs numpy oracles."""

import numpy as np
import pytest

from ctpn_tpu.ops import anchors as A
from ctpn_tpu.ops import boxes as B
from ctpn_tpu.ops import iou as IOU
from ctpn_tpu.utils import host_ref as H
from tests.conftest import random_boxes


class TestAnchors:
    def test_ladder_matches_reference_values(self):
        # expected values derived from the reference's int-truncated
        # generate_anchors() output (heights 11..283, width 16, center 7.5)
        ladder = A.anchor_ladder()
        assert ladder.shape == (10, 4)
        # all anchors span x in [0, 15]: int32 truncation of 7.5±8
        # (toward zero, so -0.5 -> 0), verified against the reference output
        assert (ladder[:, 0] == 0).all()
        assert (ladder[:, 2] == 15).all()
        # height-11 anchor: y in [int(7.5-5.5), int(7.5+5.5)] = [2, 13]
        assert ladder[0, 1] == 2 and ladder[0, 3] == 13
        # height-283 anchor: y in [int(7.5-141.5), int(7.5+141.5)] = [-134, 149]
        assert ladder[-1, 1] == -134 and ladder[-1, 3] == 149
        heights = ladder[:, 3] - ladder[:, 1]
        # truncation makes spans h or h-1 depending on parity
        for h_nominal, h_span in zip(A.ANCHOR_HEIGHTS, heights):
            assert h_span in (h_nominal, h_nominal - 1)

    def test_shifted_anchor_order_hwa(self):
        fh, fw = 3, 5
        grid = A.shifted_anchors(fh, fw)
        assert grid.shape == (fh * fw * 10, 4)
        ladder = A.anchor_ladder().astype(np.float32)
        # row index ((h*W)+w)*A + a
        for h, w, a in [(0, 0, 0), (1, 2, 3), (2, 4, 9)]:
            idx = (h * fw + w) * 10 + a
            expect = ladder[a] + np.array([w * 16, h * 16, w * 16, h * 16])
            np.testing.assert_allclose(grid[idx], expect)


class TestBoxTransforms:
    def test_encode_matches_oracle(self, rng):
        ex = random_boxes(rng, 200)
        gt = random_boxes(rng, 200)
        got = np.asarray(B.bbox_transform(ex, gt))
        want = H.bbox_transform_np(ex.astype(np.float64), gt.astype(np.float64))
        # f32 compute vs f64 oracle at coordinate scale ~1e3
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    def test_decode_matches_oracle_and_keeps_xw(self, rng):
        boxes = random_boxes(rng, 300)
        deltas = rng.uniform(-1, 1, (300, 4)).astype(np.float32)
        got = np.asarray(B.bbox_transform_inv(boxes, deltas))
        want = H.bbox_transform_inv_np(boxes.astype(np.float64), deltas.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-2)
        # x-center and width must be untouched (CTPN contract). Note the
        # reference decode emits x2' = ctr_x + w/2 = x2 + 1 under the +1
        # width convention (`bbox_transform.py:59-63`) — preserved here.
        np.testing.assert_allclose(got[:, 0], boxes[:, 0], atol=1e-3)
        np.testing.assert_allclose(got[:, 2], boxes[:, 2] + 1.0, atol=1e-3)

    def test_encode_decode_roundtrip_y(self, rng):
        ex = random_boxes(rng, 100)
        gt = random_boxes(rng, 100)
        deltas = B.bbox_transform(ex, gt)
        rec = np.asarray(B.bbox_transform_inv(ex, deltas))
        np.testing.assert_allclose(rec[:, 1], gt[:, 1], rtol=1e-3, atol=1e-1)
        # +1 convention: decoded bottom edge lands at y2 + 1 (see above)
        np.testing.assert_allclose(rec[:, 3], gt[:, 3] + 1.0, rtol=1e-3, atol=1e-1)

    def test_clip(self, rng):
        boxes = rng.uniform(-200, 1200, (100, 4)).astype(np.float32)
        got = np.asarray(B.clip_boxes(boxes, 600.0, 900.0))
        want = H.clip_boxes_np(boxes, (600, 900))
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestIoU:
    def test_iou_matches_cython_contract(self, rng):
        b = random_boxes(rng, 64)
        q = random_boxes(rng, 37)
        got = np.asarray(IOU.pairwise_iou(b, q))
        want = H.bbox_overlaps_np(b, q)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_intersection_frac(self, rng):
        b = random_boxes(rng, 16)
        q = random_boxes(rng, 25)
        got = np.asarray(IOU.pairwise_intersection_frac(b, q))
        want = H.bbox_intersections_np(b, q)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_identical_box_iou_one(self):
        b = np.array([[10, 10, 50, 30]], dtype=np.float32)
        assert np.asarray(IOU.pairwise_iou(b, b))[0, 0] == pytest.approx(1.0)

    def test_plus_one_convention_touching(self):
        # boxes sharing an edge intersect by exactly 1 pixel under +1 areas
        a = np.array([[0, 0, 10, 10]], dtype=np.float32)
        b = np.array([[10, 0, 20, 10]], dtype=np.float32)
        got = float(np.asarray(IOU.pairwise_iou(a, b))[0, 0])
        want = float(H.bbox_overlaps_np(a, b)[0, 0])
        assert got == pytest.approx(want, rel=1e-6)
        assert got > 0  # the +1 convention makes touching boxes overlap
