"""Text detector facade: proposals -> text-line records.

On-device equivalent of the reference `TextDetector.detect`
(`lib/text_connector/detectors.py:19-35`): score filter (> 0.7), score sort,
NMS at 0.2, connector (H or O per config), final line filter. Everything is
fixed-shape/masked and composes into the end-to-end jit program — the
reference runs all of this on the host per image.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ctpn_tpu.config import cfg
from ctpn_tpu.ops.nms import nms_keep_sorted
from ctpn_tpu.postprocess.connector import TextLines, connect_text_lines


def detect_lines(
    rois: jnp.ndarray,
    roi_valid: jnp.ndarray,
    im_info: jnp.ndarray,
    mode: str = "H",
    max_lines: int = 128,
    min_score: float = 0.7,
    nms_thresh: float = 0.2,
    max_gap: int = 50,
    min_v_overlaps: float = 0.7,
    min_size_sim: float = 0.7,
    min_ratio: float = 0.5,
    line_min_score: float = 0.9,
    min_width: float = 32.0,
    use_pallas: Optional[bool] = None,
    max_chain_len: Optional[int] = None,
) -> TextLines:
    """One image: (P, 5) [score, x1, y1, x2, y2] score-sorted rois -> lines.

    ``rois`` must be sorted by score descending (the proposal layer's output
    contract); padding slots carry score -1 and ``roi_valid`` False.
    """
    scores = rois[:, 0]
    boxes = rois[:, 1:5]
    valid = roi_valid & (scores > min_score)
    keep = nms_keep_sorted(boxes, valid, nms_thresh, use_pallas)
    return connect_text_lines(
        boxes,
        scores,
        keep,
        im_info,
        mode=mode,
        max_lines=max_lines,
        max_gap=max_gap,
        min_v_overlaps=min_v_overlaps,
        min_size_sim=min_size_sim,
        min_ratio=min_ratio,
        line_min_score=line_min_score,
        min_width=min_width,
        max_chain_len=max_chain_len,
    )


def detect_lines_batched(rois, roi_valid, im_info, **kw):
    fn = functools.partial(detect_lines, **kw)
    return jax.vmap(fn)(rois, roi_valid, im_info)


class TextDetector:
    """Config-driven facade mirroring the reference class.

    Reads mode and thresholds from the global cfg at construction
    (`detectors.py:11-16` + `text_connect_cfg.py`); exposes a host-friendly
    ``detect(rois, valid, im_info)`` returning a trimmed (M, 9) array.
    """

    def __init__(self, mode: Optional[str] = None):
        self.mode = mode or cfg.TEST.DETECT_MODE
        t = cfg.TEXT
        self._kw = dict(
            mode=self.mode,
            max_lines=cfg.TPU.MAX_LINES,
            min_score=t.TEXT_PROPOSALS_MIN_SCORE,
            nms_thresh=t.TEXT_PROPOSALS_NMS_THRESH,
            max_gap=t.MAX_HORIZONTAL_GAP,
            min_v_overlaps=t.MIN_V_OVERLAPS,
            min_size_sim=t.MIN_SIZE_SIM,
            min_ratio=t.MIN_RATIO,
            line_min_score=t.LINE_MIN_SCORE,
            min_width=float(t.TEXT_PROPOSALS_WIDTH * t.MIN_NUM_PROPOSALS),
        )

    def detect(self, rois, roi_valid, im_info) -> np.ndarray:
        out = detect_lines(
            jnp.asarray(rois), jnp.asarray(roi_valid), jnp.asarray(im_info),
            **self._kw,
        )
        count = int(out.count)
        return np.asarray(out.recs)[:count]
