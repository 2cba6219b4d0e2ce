"""TextDetector facade + connector edge cases."""

import jax.numpy as jnp
import numpy as np

from ctpn_tpu.config import cfg
from ctpn_tpu.postprocess.connector import build_successors, connect_text_lines
from ctpn_tpu.postprocess.detector import TextDetector


def _rois_from(boxes, scores, n_pad=64):
    order = np.argsort(scores, kind="stable")[::-1]
    rois = np.zeros((n_pad, 5), np.float32)
    rois[:, 0] = -1
    rois[: len(boxes), 0] = scores[order]
    rois[: len(boxes), 1:] = boxes[order]
    valid = np.arange(n_pad) < len(boxes)
    return rois, valid


def test_facade_H_mode_detects_row_of_strips():
    cfg.TEST.DETECT_MODE = "H"
    boxes, scores = [], []
    for s in range(8):
        x1 = 100 + s * 16
        boxes.append([x1, 200, x1 + 15, 240])
        scores.append(0.95)
    boxes = np.array(boxes, np.float32)
    scores = np.array(scores, np.float32)
    rois, valid = _rois_from(boxes, scores)
    det = TextDetector()
    recs = det.detect(rois, valid, np.array([600, 900, 1.0], np.float32))
    assert len(recs) == 1
    x0, y0 = recs[0][0], recs[0][1]
    assert abs(x0 - 100) < 1 and abs(y0 - 200) < 2
    assert recs[0][8] > 0.9


def test_facade_O_mode_slanted_line():
    cfg.TEST.DETECT_MODE = "O"
    boxes, scores = [], []
    for s in range(10):
        x1 = 80 + s * 16
        y = 150 + s * 4  # slope 0.25
        boxes.append([x1, y, x1 + 15, y + 30])
        scores.append(0.95)
    rois, valid = _rois_from(np.array(boxes, np.float32), np.array(scores, np.float32))
    det = TextDetector()
    recs = det.detect(rois, valid, np.array([600, 900, 1.0], np.float32))
    assert len(recs) == 1
    # oriented record: right corners are lower than left corners
    assert recs[0][3] > recs[0][1]


def test_two_strips_same_column_no_edge():
    # vertical stack in the same column: no successor (needs col_j > col_i)
    boxes = np.array([[100, 100, 115, 140], [100, 150, 115, 190]], np.float32)
    scores = np.array([0.9, 0.9], np.float32)
    b = np.zeros((16, 4), np.float32)
    s = np.zeros((16,), np.float32)
    b[:2] = boxes
    s[:2] = scores
    v = np.arange(16) < 2
    succ = np.asarray(build_successors(jnp.asarray(b), jnp.asarray(s), jnp.asarray(v)))
    assert (succ[:2] == -1).all()


def test_gap_limit_enforced():
    # two compatible strips 60 px apart (> MAX_HORIZONTAL_GAP=50): no edge
    boxes = np.array([[100, 100, 115, 140], [161, 100, 176, 140]], np.float32)
    scores = np.array([0.9, 0.9], np.float32)
    b = np.zeros((16, 4), np.float32)
    s = np.zeros((16,), np.float32)
    b[:2] = boxes
    s[:2] = scores
    v = np.arange(16) < 2
    succ = np.asarray(build_successors(jnp.asarray(b), jnp.asarray(s), jnp.asarray(v), max_gap=50))
    assert succ[0] == -1
    # within the gap: edge exists
    boxes[1][0] = 150.0
    boxes[1][2] = 165.0
    b[:2] = boxes
    succ = np.asarray(build_successors(jnp.asarray(b), jnp.asarray(s), jnp.asarray(v), max_gap=50))
    assert succ[0] == 1


def test_min_lines_filter_drops_single_strip():
    # one isolated strip -> no chains -> no lines
    b = np.zeros((16, 4), np.float32)
    s = np.full((16,), -1.0, np.float32)
    b[0] = [100, 100, 115, 140]
    s[0] = 0.99
    v = np.arange(16) < 1
    out = connect_text_lines(
        jnp.asarray(b), jnp.asarray(s), jnp.asarray(v),
        jnp.asarray(np.array([600, 900, 1.0], np.float32)), max_lines=8,
    )
    assert int(out.count) == 0
