"""Detection-quality floors for the COMMITTED artifact vs the reference
goldens — both sides of the tradeoff, both connector modes.

`tests/test_realimage_parity.py` locks device-vs-host *agreement*;
`tests/test_golden.py` gates >= 99.5% *parity* but only when a converted
reference checkpoint exists. This file locks the absolute detection QUALITY
of the committed synth-trained artifact (`data/artifacts/
ctpn_synth_f16.npz`) through the default demo surface (scale-aware
line-union pass ON — postprocess/merge.py), so a corpus/training/EXIF/merge
regression fails the suite instead of only degrading a doc.

Round-5c measurements these floors are set ~5-10% under (docs/TRAINING.md
round 5; vs `/root/reference/data/results`; identical on TPU and CPU
numerics):

  H: P 0.939 / R 0.958 / F 0.948 @ IoU 0.3;  F 0.907 @ 0.5;  49 boxes
     008.jpg: 22 boxes, 22 matched @ 0.3, 21 @ 0.5 (23 golden)
     009.jpg: 5 boxes, 5/5 golden matched @ both IoUs (the low-contrast
     line recovered by the round-5b pale-warm corpus fine-tune)
  O: P 0.938 / R 0.938 / F 0.938 @ IoU 0.3 on hulls; 48 boxes
     008.jpg: 21 boxes, 21 matched @ 0.3

The precision floors are the round-5 addition (VERDICT r4): an artifact
regression that sprays boxes — or a silently disabled line-union stage
(unmerged P @ 0.3 is 0.605) — now fails instead of passing a recall-only
gate.

Covers both inference program buckets on real photos: 007/010 land in the
landscape bucket (608, 912); 006/008/009 land in the portrait bucket
(912, 608), which no other default test exercises.
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


def _detect_all(mode):
    """stem -> (N, 4) detected line hull boxes, demo contract, merged."""
    from ctpn_tpu.inference.pipeline import CTPNPredictor
    from ctpn_tpu.utils.image import load_image_bgr
    from ctpn_tpu.utils.weights import load_params

    predictor = CTPNPredictor(load_params(ARTIFACT), mode=mode)
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


@pytest.fixture(scope="module")
def demo_boxes():
    return _detect_all("H")


@pytest.fixture(scope="module")
def demo_boxes_o():
    return _detect_all("O")


def _golden(stem):
    from ctpn_tpu.eval import read_res_txt

    return read_res_txt(osp.join(REF_RESULTS, f"res_{stem}.txt"))


def _prf(demo_boxes, iou):
    from ctpn_tpu.eval import match_boxes

    matched = total_ref = total_cand = 0
    for stem, cand in demo_boxes.items():
        ref = _golden(stem)
        matched += match_boxes(cand, ref, iou_thresh=iou)
        total_ref += len(ref)
        total_cand += len(cand)
    assert total_ref > 0 and total_cand > 0
    p, r = matched / total_cand, matched / total_ref
    return p, r, 2 * p * r / max(p + r, 1e-9)


def test_h_recall_floor(demo_boxes):
    """H recall >= 0.90 @ IoU 0.3 (measured 0.958; 48 golden boxes, so
    each missed line costs ~0.021 — the floor allows two)."""
    _, recall, _ = _prf(demo_boxes, 0.3)
    assert recall >= 0.90, f"recall {recall:.3f}"


def test_h_precision_floor(demo_boxes):
    """H precision >= 0.87 @ IoU 0.3 (measured 0.939). Catches both a
    box-spraying artifact regression and a disabled line-union stage."""
    precision, _, _ = _prf(demo_boxes, 0.3)
    assert precision >= 0.87, f"precision {precision:.3f}"


def test_h_f_measure_floor(demo_boxes):
    """H F >= 0.91 @ 0.3 and >= 0.85 @ 0.5 (measured 0.948 / 0.907)."""
    _, _, f3 = _prf(demo_boxes, 0.3)
    _, _, f5 = _prf(demo_boxes, 0.5)
    assert f3 >= 0.91, f"F@0.3 {f3:.3f}"
    assert f5 >= 0.85, f"F@0.5 {f5:.3f}"


def test_h_per_image_box_budget(demo_boxes):
    """No image may emit more than 2x its golden count + 3 boxes
    (round-5c measured worst case: 007 with 8 vs 5 golden). A per-image
    budget localizes a fragmentation/spray regression the aggregate
    precision floor would smear across images."""
    for stem, cand in demo_boxes.items():
        budget = 2 * len(_golden(stem)) + 3
        assert len(cand) <= budget, (
            f"{stem}: {len(cand)} boxes > budget {budget}"
        )


def test_dense_cjk_008_line_coverage(demo_boxes):
    """008.jpg (dense ideograph label, EXIF-rotated): near-golden line
    coverage must persist (measured 22 boxes / 21 matched @ IoU 0.5 vs 23
    golden). A near-empty result here is the signature of the EXIF-
    orientation regression or a corpus regression (no glyph-textured
    training data)."""
    from ctpn_tpu.eval import match_boxes

    cand, ref = demo_boxes["008"], _golden("008")
    assert len(ref) == 23  # the golden contract this test is written to
    assert len(cand) >= 19, f"only {len(cand)} lines detected"
    m = match_boxes(cand, ref, iou_thresh=0.5)
    assert m >= 19, f"only {m}/23 golden lines matched @ IoU 0.5"


def test_low_contrast_009_full_recall(demo_boxes):
    """009.jpg: all 5 golden lines matched @ IoU 0.3, including the
    low-contrast yellow-on-road "your life" line at the bottom. The
    round-5 photo-clutter fine-tune lost this line (4/5) because rust
    -stain negatives overlapped the pale-yellow hue band; the round-5b
    pale-warm positive tint (`data/synth.py::_text_fill`) recovered it
    (5/5 @ both IoUs, stable under CPU and TPU numerics). This gate
    locks the recovery: a corpus or fine-tune change that re-trades
    this line away must fail loudly, not silently regress."""
    from ctpn_tpu.eval import match_boxes

    cand, ref = demo_boxes["009"], _golden("009")
    assert len(ref) == 5  # the golden contract this test is written to
    m = match_boxes(cand, ref, iou_thresh=0.3)
    assert m >= 5, f"only {m}/5 golden lines matched @ IoU 0.3"


def test_every_demo_image_detects_text(demo_boxes):
    """No demo photo may come back empty — each contains prominent text."""
    empty = [s for s, b in demo_boxes.items() if len(b) == 0]
    assert not empty, f"no detections on: {empty}"


# ---- O (oriented) mode: same artifact, quad records scored as hulls.
# The reference ships only overlay JPGs for O mode (data/oriented_results/,
# README.md:69-73) — no res txt — so the quantitative gate scores O hulls
# against the H goldens: both connectors group the same proposals, so the
# hulls must track the same lines (VERDICT r4 #4).


def test_o_recall_floor(demo_boxes_o):
    """O hull recall >= 0.88 @ IoU 0.3 (measured 0.938)."""
    _, recall, _ = _prf(demo_boxes_o, 0.3)
    assert recall >= 0.88, f"recall {recall:.3f}"


def test_o_precision_and_budget(demo_boxes_o):
    """O precision >= 0.85 @ 0.3 (measured 0.938) + per-image budget."""
    precision, _, _ = _prf(demo_boxes_o, 0.3)
    assert precision >= 0.85, f"precision {precision:.3f}"
    for stem, cand in demo_boxes_o.items():
        budget = 2 * len(_golden(stem)) + 3
        assert len(cand) <= budget, (
            f"{stem}: {len(cand)} boxes > budget {budget}"
        )


def test_o_dense_cjk_008(demo_boxes_o):
    """008.jpg in O mode (measured 21 boxes, 21 matched @ 0.3)."""
    from ctpn_tpu.eval import match_boxes

    cand = demo_boxes_o["008"]
    assert len(cand) >= 18, f"only {len(cand)} lines detected"
    m = match_boxes(cand, _golden("008"), iou_thresh=0.3)
    assert m >= 19, f"only {m}/23 golden lines matched @ IoU 0.3"


def test_o_no_empty_images(demo_boxes_o):
    empty = [s for s, b in demo_boxes_o.items() if len(b) == 0]
    assert not empty, f"no detections on: {empty}"
