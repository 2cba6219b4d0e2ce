"""Data layer tests: prepare pipeline, VOC loading, minibatch assembly."""

import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

from ctpn_tpu.config import cfg
from ctpn_tpu.data.minibatch import RoIDataLayer, assemble_batch
from ctpn_tpu.data.prepare import split_labels, split_polygon_to_strips, to_voc
from ctpn_tpu.data.roidb import get_training_roidb, prepare_roidb
from ctpn_tpu.data.voc import PascalVOC, get_imdb, list_imdbs


def _make_raw_dataset(root, rng, n=3, size=(320, 240)):
    """Raw images + ICDAR-style gt polygons."""
    img_dir = osp.join(root, "image")
    gt_dir = osp.join(root, "label")
    os.makedirs(img_dir)
    os.makedirs(gt_dir)
    for i in range(n):
        w, h = size
        arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(osp.join(img_dir, f"img{i}.jpg"))
        with open(osp.join(gt_dir, f"gt_img{i}.txt"), "w") as f:
            # two horizontal-ish text polygons
            f.write("20,30,200,30,200,60,20,60,hello\n")
            f.write("40,100,280,105,280,140,40,135,world\n")
    return img_dir, gt_dir


@pytest.fixture
def voc_tree(tmp_path, rng):
    img_dir, gt_dir = _make_raw_dataset(str(tmp_path), rng)
    re_img = osp.join(str(tmp_path), "re_image")
    labels = osp.join(str(tmp_path), "label_tmp")
    stems = split_labels(img_dir, gt_dir, re_img, labels)
    assert len(stems) == 3
    devkit = osp.join(str(tmp_path), "VOCdevkit2007")
    to_voc(labels, re_img, osp.join(devkit, "VOC2007"))
    return devkit


def test_glyph_line_renderer_geometry():
    from PIL import Image

    from ctpn_tpu.data.synth import _render_glyph_line

    rng = np.random.RandomState(5)
    img = Image.new("RGB", (900, 600), (200, 200, 200))
    for _ in range(20):
        polys = _render_glyph_line(img, rng)
        if polys is None:
            continue
        (x0, y0, x1, y1b, x2, y2, x3, y3) = polys[0]
        assert len(polys) == 1  # one line-level polygon (CJK convention)
        assert x1 > x0 and y2 > y0
        assert 0 <= x0 and x1 < 900 and 0 <= y0 and y2 < 600
        # glyph lines are wide relative to height (>= 4 glyphs)
        assert (x1 - x0) >= 4 * (y2 - y0) * 0.8
    arr = np.asarray(img)
    assert (arr != 200).any()  # strokes actually drawn


def test_strip_splitting_grid_alignment():
    # polygon x in [10, 75] -> strips [10,15],[16,31],[32,47],[48,63],[64,75]
    strips = split_polygon_to_strips([10, 5, 75, 5, 75, 40, 10, 40], 100, 200)
    xs = [(s[0], s[2]) for s in strips]
    assert xs == [(10, 15), (16, 31), (32, 47), (48, 63), (64, 75)]
    assert all(s[1] == 5 and s[3] == 40 for s in strips)

    # grid-aligned xmin keeps the first full strip; the final strip extends
    # to xmax (reference grid semantics)
    strips = split_polygon_to_strips([16, 0, 48, 0, 48, 30, 16, 30], 100, 200)
    assert [(s[0], s[2]) for s in strips] == [(16, 31), (32, 48)]


def test_voc_loading_and_roidb(voc_tree):
    imdb = PascalVOC("trainval", "2007", devkit_path=voc_tree)
    assert imdb.num_images == 3
    roidb = imdb.gt_roidb()
    assert len(roidb) == 3
    for entry in roidb:
        assert entry["boxes"].shape[1] == 4
        assert len(entry["boxes"]) > 5  # several strips per image
        assert (entry["gt_classes"] == 1).all()
        # strips are 16px grid aligned except the first/last in a row
        w = entry["boxes"][:, 2] - entry["boxes"][:, 0]
        assert (w <= 16).all()


def test_flip_and_training_roidb(voc_tree):
    imdb = PascalVOC("trainval", "2007", devkit_path=voc_tree)
    n = imdb.num_images
    roidb = get_training_roidb(imdb)
    assert len(roidb) == 2 * n
    a, b = roidb[0], roidb[n]
    assert not a["flipped"] and b["flipped"]
    w = b["width"]
    np.testing.assert_allclose(
        b["boxes"][:, 0], w - a["boxes"][:, 2] - 1, atol=1e-6
    )


def test_minibatch_assembly(voc_tree):
    imdb = PascalVOC("trainval", "2007", devkit_path=voc_tree)
    roidb = get_training_roidb(imdb)
    layer = RoIDataLayer(roidb, batch_size=2)
    batch = layer.forward()
    n, bh, bw, c = batch.images.shape
    assert n == 2 and c == 3
    assert (bh, bw) in {tuple(b) for b in cfg.TPU.BUCKETS}
    assert batch.gt_boxes.shape == (2, cfg.TPU.MAX_GT, 4)
    assert batch.gt_valid.any()
    # gt scaled into the resized image and inside the true extent
    for i in range(2):
        g = batch.gt_boxes[i][batch.gt_valid[i]]
        assert (g[:, 2] <= batch.im_info[i][1]).all()
        assert (g[:, 3] <= batch.im_info[i][0]).all()


def test_epoch_cursor_cycles(voc_tree):
    imdb = PascalVOC("trainval", "2007", devkit_path=voc_tree)
    prepare_roidb(imdb)
    layer = RoIDataLayer(imdb.roidb, batch_size=2)
    for _ in range(5):  # > one epoch of 3 images
        batch = layer.forward()
        assert batch.images.shape[0] == 2


def test_factory_registry():
    assert "voc_2007_trainval" in list_imdbs()
    with pytest.raises(KeyError):
        get_imdb("nonexistent_dataset")


def test_prefetch_loader(voc_tree):
    from ctpn_tpu.data.pipeline import PrefetchLoader

    imdb = PascalVOC("trainval", "2007", devkit_path=voc_tree)
    prepare_roidb(imdb)
    layer = RoIDataLayer(imdb.roidb, batch_size=1)
    loader = PrefetchLoader(layer.forward, depth=2, workers=1)
    batches = [loader.get() for _ in range(4)]
    assert all(b.images.shape[0] == 1 for b in batches)
    loader.close()


def test_random_downsample_shrinks_and_scales_gt(voc_tree, monkeypatch):
    """TRAIN.RANDOM_DOWNSAMPLE jitters the resize factor into [0.6, 1.0)
    of the deterministic contract (reference `blob.py:32-34`)."""
    from ctpn_tpu.data.minibatch import sample_to_arrays
    from ctpn_tpu.utils.image import resize_factor

    imdb = PascalVOC("trainval", "2007", devkit_path=voc_tree)
    roidb = get_training_roidb(imdb)
    entry = roidb[0]
    bucket = tuple(cfg.TPU.BUCKETS[-1])
    _, info_base, gt_base, gv, _, _, _ = sample_to_arrays(entry, bucket)

    monkeypatch.setitem(cfg.TRAIN, "RANDOM_DOWNSAMPLE", True)
    np.random.seed(7)
    _, info, gt, gv2, _, _, _ = sample_to_arrays(entry, bucket)
    f0 = resize_factor(
        entry["height"], entry["width"], cfg.TRAIN.SCALES[0], cfg.TRAIN.MAX_SIZE
    )
    assert 0.6 * f0 <= info[2] < f0  # jittered factor in range
    assert info[2] < info_base[2]
    # gt boxes scale with the same jittered factor
    ratio = info[2] / info_base[2]
    np.testing.assert_allclose(gt[gv2], gt_base[gv] * ratio, rtol=1e-6)
