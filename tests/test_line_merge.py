"""Scale-aware line-union pass (postprocess/merge.py).

The stage closes the display-text fragmentation gap the reference's fixed
50-px MAX_HORIZONTAL_GAP leaves open (`text_proposal_graph_builder.py:36-40`
is sized for ~25-px body lines at SCALE=600); these tests pin the join
rule's semantics and the config gate."""

import numpy as np

from ctpn_tpu.postprocess.merge import (maybe_merge_line_records,
                                        merge_line_records)


def _rec(x0, y0, x1, y1, score=0.95):
    """Axis-aligned H-mode record: TL TR BL BR + score."""
    return [x0, y0, x1, y0, x0, y1, x1, y1, score]


def test_display_scale_gap_joins():
    # two 100-px-tall words 100 px apart: gap ratio 1.0 <= 1.25 -> one line.
    # (the reference's fixed 50-px rule would keep them apart)
    recs = np.array([_rec(0, 0, 200, 100), _rec(300, 0, 500, 100)])
    out = merge_line_records(recs, gap_ratio=1.25)
    assert len(out) == 1
    np.testing.assert_allclose(out[0, :8], _rec(0, 0, 500, 100)[:8])


def test_body_scale_gap_does_not_join():
    # same 100-px gap at 20-px line height: ratio 5.0 > 1.25 -> stays split
    recs = np.array([_rec(0, 0, 200, 20), _rec(300, 0, 500, 20)])
    assert len(merge_line_records(recs, gap_ratio=1.25)) == 2


def test_vertical_overlap_required():
    # horizontally adjacent but on different rows -> no join
    recs = np.array([_rec(0, 0, 200, 40), _rec(210, 50, 400, 90)])
    assert len(merge_line_records(recs, gap_ratio=1.25)) == 2


def test_transitive_chain_merges():
    recs = np.array(
        [_rec(0, 0, 100, 80), _rec(150, 0, 250, 80), _rec(300, 0, 400, 80)]
    )
    out = merge_line_records(recs, gap_ratio=1.25)
    assert len(out) == 1
    np.testing.assert_allclose(out[0, :8], _rec(0, 0, 400, 80)[:8])


def test_score_is_width_weighted_mean():
    recs = np.array(
        [_rec(0, 0, 300, 80, score=0.9), _rec(350, 0, 450, 80, score=0.6)]
    )
    out = merge_line_records(recs, gap_ratio=1.25)
    want = (0.9 * 300 + 0.6 * 100) / 400
    np.testing.assert_allclose(out[0, 8], want)


def test_singleton_keeps_oriented_record():
    # a sloped O-mode quad that merges with nothing passes through verbatim
    quad = np.array([[10, 20, 110, 30, 8, 60, 108, 70, 0.97]])
    far = np.array([_rec(500, 500, 600, 520)])
    out = merge_line_records(np.vstack([quad, far]), gap_ratio=1.25)
    assert len(out) == 2
    row = out[np.argmin(out[:, 1])]  # quad sorts first by top edge
    np.testing.assert_allclose(row, quad[0])


def test_disabled_and_degenerate_inputs():
    recs = np.array([_rec(0, 0, 200, 100), _rec(300, 0, 500, 100)])
    np.testing.assert_allclose(merge_line_records(recs, gap_ratio=0.0), recs)
    assert merge_line_records(np.zeros((0, 9)), 1.25).shape == (0, 9)
    one = np.array([_rec(1, 2, 3, 4)])
    np.testing.assert_allclose(merge_line_records(one, 1.25), one)


def test_config_gate(monkeypatch):
    from ctpn_tpu.config import cfg

    recs = np.array([_rec(0, 0, 200, 100), _rec(300, 0, 500, 100)])
    monkeypatch.setattr(cfg.TEXT, "LINE_MERGE_GAP_RATIO", 0.0, raising=False)
    assert len(maybe_merge_line_records(recs)) == 2
    monkeypatch.setattr(cfg.TEXT, "LINE_MERGE_GAP_RATIO", 1.25, raising=False)
    assert len(maybe_merge_line_records(recs)) == 1


def test_output_order_deterministic():
    rng = np.random.RandomState(0)
    recs = []
    for r in range(4):  # four separated rows, two far-apart words each
        y = 200 * r
        recs += [_rec(0, y, 80, y + 20), _rec(600, y, 700, y + 20)]
    recs = np.asarray(recs, dtype=np.float64)
    perm = rng.permutation(len(recs))
    a = merge_line_records(recs, 1.25)
    b = merge_line_records(recs[perm], 1.25)
    np.testing.assert_allclose(a, b)
