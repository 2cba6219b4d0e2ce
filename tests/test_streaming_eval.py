"""Streaming inference runner + evaluation tool tests (CPU, tiny shapes)."""

import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from ctpn_tpu import eval as ev
from ctpn_tpu.config import cfg


def test_read_and_compare_result_dirs(tmp_path):
    ref = tmp_path / "ref"
    cand = tmp_path / "cand"
    ref.mkdir()
    cand.mkdir()
    (ref / "res_a.txt").write_text("10,10,100,40\r\n200,50,400,90\r\n")
    # candidate matches first box well, second loosely off, adds a spurious
    (cand / "res_a.txt").write_text("11,11,99,40\r\n205,52,398,88\r\n500,500,600,520\r\n")
    out = ev.compare_result_dirs(str(cand), str(ref))
    assert out["reference_boxes"] == 2
    assert out["candidate_boxes"] == 3
    assert out["matched"] == 2
    assert out["recall"] == 1.0
    assert out["precision"] == pytest.approx(2 / 3)


def test_compare_missing_candidate_file(tmp_path):
    ref = tmp_path / "ref"
    cand = tmp_path / "cand"
    ref.mkdir()
    cand.mkdir()
    (ref / "res_b.txt").write_text("10,10,100,40\r\n")
    out = ev.compare_result_dirs(str(cand), str(ref))
    assert out["matched"] == 0 and out["recall"] == 0.0


def test_merge_words_to_lines():
    words = np.array(
        [
            # one line of three words, gaps ~10 px
            [10, 20, 60, 40],
            [70, 21, 130, 40],
            [140, 20, 200, 41],
            # same row but a 120 px gap: a separate connector segment
            [320, 20, 380, 40],
            # different row, overlapping x-range
            [10, 80, 200, 100],
        ],
        dtype=np.float64,
    )
    lines = ev.merge_words_to_lines(words, max_gap=50.0, min_v_overlap=0.7)
    lines = lines[np.lexsort((lines[:, 0], lines[:, 1]))]
    np.testing.assert_allclose(
        lines,
        [[10, 20, 200, 41], [320, 20, 380, 40], [10, 80, 200, 100]],
    )
    # empty input passes through
    assert ev.merge_words_to_lines(np.zeros((0, 4))).shape == (0, 4)
    # transitive merge: a chain a-b-c where a and c are far apart still
    # forms ONE line (union-find, not pairwise output)
    chain = np.array([[0, 0, 50, 20], [60, 0, 110, 20], [120, 0, 170, 20]])
    assert len(ev.merge_words_to_lines(chain)) == 1


def test_merge_words_to_lines_geometric():
    """The independent merge joins at space-scale gaps only: thresholds
    scale with text height, not with the connector's 50-px constant."""
    words = np.array(
        [
            # 20-px-tall words, 10-px gaps (= 0.5x height): one line
            [10, 20, 60, 40],
            [70, 21, 130, 40],
            # 40-px gap: far past gap_frac * 20 — separate, although the
            # connector-rule merge (max_gap=50) would join it
            [170, 20, 230, 40],
        ],
        dtype=np.float64,
    )
    geo = ev.merge_words_to_lines_geometric(words)
    assert len(geo) == 2
    assert len(ev.merge_words_to_lines(words)) == 1
    # tall text scales its joinable gap up: 100-px-tall words, 60-px gap
    tall = np.array([[0, 0, 80, 100], [140, 2, 220, 98]], dtype=np.float64)
    assert len(ev.merge_words_to_lines_geometric(tall)) == 1
    assert ev.merge_words_to_lines_geometric(np.zeros((0, 4))).shape == (0, 4)


def test_stream_detect_over_directory(tmp_path, rng, monkeypatch):
    import jax
    import jax.numpy as jnp

    cfg.TPU.BUCKETS = [[64, 96]]
    cfg.TEXT.SCALE = 48
    cfg.TEXT.MAX_SCALE = 96
    cfg.TEST.SCALES = (48,)
    cfg.TEST.MAX_SIZE = 96

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(5):
        arr = rng.randint(0, 255, (96, 128, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"im{i}.jpg")

    from ctpn_tpu.inference.pipeline import CTPNPredictor
    from ctpn_tpu.inference.streaming import stream_detect
    from ctpn_tpu.models.factory import get_network

    model = get_network("VGGnet_test")
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32)
    )["params"]
    predictor = CTPNPredictor(params)
    paths = sorted(str(p) for p in img_dir.iterdir())
    results = dict(stream_detect(paths, predictor, batch_size=2, workers=2))
    assert set(results) == set(paths)
    for recs in results.values():
        assert recs.ndim == 2 and recs.shape[1] == 9


def test_stream_detect_mixed_aspects(tmp_path, rng):
    """Portrait + landscape images group into different buckets."""
    import jax
    import jax.numpy as jnp

    cfg.TPU.BUCKETS = [[64, 96], [96, 64]]
    cfg.TEXT.SCALE = 48
    cfg.TEXT.MAX_SCALE = 96
    cfg.TEST.SCALES = (48,)
    cfg.TEST.MAX_SIZE = 96

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(3):
        arr = rng.randint(0, 255, (96, 128, 3), dtype=np.uint8)  # landscape
        Image.fromarray(arr).save(img_dir / f"land{i}.jpg")
        # tall enough that the portrait bucket (96, 64) is required
        arr = rng.randint(0, 255, (192, 96, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / f"port{i}.jpg")

    from ctpn_tpu.inference.pipeline import CTPNPredictor
    from ctpn_tpu.inference.streaming import stream_detect
    from ctpn_tpu.models.factory import get_network

    model = get_network("VGGnet_test")
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3), jnp.float32)
    )["params"]
    predictor = CTPNPredictor(params)
    paths = sorted(str(p) for p in img_dir.iterdir())
    results = dict(stream_detect(paths, predictor, batch_size=2, workers=2))
    assert set(results) == set(paths)
    # both bucket programs were compiled
    assert len(predictor._fns) == 2
