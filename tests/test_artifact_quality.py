"""Detection-quality floor for the COMMITTED artifact vs the reference
goldens.

`tests/test_realimage_parity.py` locks device-vs-host *agreement*;
`tests/test_golden.py` gates >= 99.5% *parity* but only when a converted
reference checkpoint exists. Neither locks the absolute detection QUALITY
of the committed synth-trained artifact (`data/artifacts/
ctpn_synth_f16.npz`) — the number docs/TRAINING.md quotes (recall 0.90 /
F 0.75 @ IoU 0.3 vs `/root/reference/data/results`). This test pins
conservative floors under that claim so a corpus/training/EXIF regression
(e.g. the round-3 orientation bug that silently blanked 008.jpg) fails
the suite instead of only degrading a doc.

Covers both inference program buckets on real photos: 007/010 land in the
landscape bucket (608, 912); 006/008/009 land in the portrait bucket
(912, 608), which no other default test exercises.

Floors are set ~15% under the measured round-3 values so ordinary
weight-to-weight variation between retrained artifacts passes while a
behavioral regression does not.
"""

import glob
import os
import os.path as osp

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
ARTIFACT = osp.join(REPO, "data", "artifacts", "ctpn_synth_f16.npz")
REF_DEMO = "/root/reference/data/demo"
REF_RESULTS = "/root/reference/data/results"

pytestmark = pytest.mark.skipif(
    not (osp.exists(ARTIFACT) and osp.isdir(REF_DEMO)
         and osp.isdir(REF_RESULTS))
    or os.environ.get("CTPN_FAST_TESTS") == "1",
    reason="committed artifact or reference demo/goldens unavailable "
           "(or CTPN_FAST_TESTS=1)",
)


@pytest.fixture(scope="module")
def demo_boxes():
    """stem -> (N, 4) detected line boxes, H mode, demo contract."""
    from ctpn_tpu.inference.pipeline import CTPNPredictor
    from ctpn_tpu.utils.image import load_image_bgr
    from ctpn_tpu.utils.weights import load_params

    predictor = CTPNPredictor(load_params(ARTIFACT), mode="H")
    out = {}
    for path in sorted(
        sum((glob.glob(osp.join(REF_DEMO, e)) for e in ("*.jpg", "*.png")),
            [])
    ):
        recs = np.asarray(predictor.detect_image(load_image_bgr(path)))
        stem = osp.splitext(osp.basename(path))[0]
        if len(recs):
            xs, ys = recs[:, 0:8:2], recs[:, 1:8:2]
            out[stem] = np.stack(
                [xs.min(1), ys.min(1), xs.max(1), ys.max(1)], axis=1
            )
        else:
            out[stem] = np.zeros((0, 4))
    return out


def _golden(stem):
    from ctpn_tpu.eval import read_res_txt

    return read_res_txt(osp.join(REF_RESULTS, f"res_{stem}.txt"))


def test_overall_recall_floor_vs_goldens(demo_boxes):
    """Across all demo images: recall >= 0.80 @ IoU 0.3 (measured 0.90)."""
    from ctpn_tpu.eval import match_boxes

    matched = total = 0
    for stem, cand in demo_boxes.items():
        ref = _golden(stem)
        matched += match_boxes(cand, ref, iou_thresh=0.3)
        total += len(ref)
    assert total > 0
    recall = matched / total
    assert recall >= 0.80, f"recall {recall:.3f} ({matched}/{total})"


def test_dense_cjk_008_line_coverage(demo_boxes):
    """008.jpg (dense ideograph label, EXIF-rotated): the artifact must
    keep emitting near-golden line coverage (measured 22 lines vs the
    golden 23, 18 matched @ IoU 0.5). A near-empty result here is the
    signature of the EXIF-orientation regression or a corpus regression
    (no glyph-textured training data)."""
    from ctpn_tpu.eval import match_boxes

    cand, ref = demo_boxes["008"], _golden("008")
    assert len(ref) == 23  # the golden contract this test is written to
    assert len(cand) >= 18, f"only {len(cand)} lines detected"
    m = match_boxes(cand, ref, iou_thresh=0.5)
    assert m >= 14, f"only {m}/23 golden lines matched @ IoU 0.5"


def test_every_demo_image_detects_text(demo_boxes):
    """No demo photo may come back empty — each contains prominent text."""
    empty = [s for s, b in demo_boxes.items() if len(b) == 0]
    assert not empty, f"no detections on: {empty}"
