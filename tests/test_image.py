"""Image preprocessing tests: resize contract, bucket selection, batching."""

import numpy as np
import pytest

from ctpn_tpu.config import cfg
from ctpn_tpu.utils.image import (
    batch_images,
    pick_bucket,
    prep_image,
    resize_im,
    rgb_to_bgr,
)


def test_resize_short_side_target(rng):
    im = rng.randint(0, 255, (300, 450, 3)).astype(np.uint8)
    out, f = resize_im(im, 600, 1200)
    # short side 300 -> 600, factor 2, long side 900 <= 1200
    assert f == pytest.approx(2.0)
    assert out.shape[:2] == (600, 900)


def test_resize_long_side_cap(rng):
    im = rng.randint(0, 255, (300, 900, 3)).astype(np.uint8)
    out, f = resize_im(im, 600, 1200)
    # naive f=2 would give long side 1800 > 1200 -> f = 1200/900
    assert f == pytest.approx(1200.0 / 900.0)
    assert out.shape[1] == 1200


def test_pick_bucket_smallest_fitting():
    cfg.TPU.BUCKETS = [[608, 608], [608, 912], [608, 1024], [1024, 608]]
    assert pick_bucket(600, 600) == (608, 608)
    assert pick_bucket(600, 900) == (608, 912)
    assert pick_bucket(600, 1000) == (608, 1024)
    assert pick_bucket(1000, 600) == (1024, 608)
    # nothing fits -> largest bucket
    assert pick_bucket(2000, 2000) in ((608, 1024), (1024, 608))


def test_prep_image_pads_and_reports_true_extent(rng):
    im = rng.randint(0, 255, (300, 450, 3)).astype(np.uint8)
    data, info, pad = prep_image(im)
    bh, bw = data.shape[:2]
    assert (bh, bw) in {tuple(b) for b in cfg.TPU.BUCKETS}
    th, tw, f = info
    assert pad == 0  # TOP_PAD defaults off: reference-exact layout
    assert th == 600 and tw == 900
    # padding region is zero
    assert (data[int(th):, :, :] == 0).all()
    assert (data[:, int(tw):, :] == 0).all()
    assert data[: int(th), : int(tw)].max() > 0


def test_prep_image_top_pad_opt_in(rng):
    """With TEST.TOP_PAD set, the content shifts down inside the SAME
    bucket (program shapes unchanged), the band above is one flat
    mean-of-top-rows color (a mirror would copy glyphs in and spawn
    phantom lines), im_info covers the shifted content, and the returned
    pad is bounded by the bucket headroom."""
    im = rng.randint(0, 255, (300, 450, 3)).astype(np.uint8)
    from ctpn_tpu.config import cfg as _cfg

    old = _cfg.TEST.TOP_PAD
    try:
        _cfg.TEST.TOP_PAD = 16
        data, info, pad = prep_image(im)
    finally:
        _cfg.TEST.TOP_PAD = old
    resized_h = 600
    bh = data.shape[0]
    assert pad == min(16, bh - resized_h) and pad > 0
    assert info[0] == resized_h + pad
    band = data[:pad, :900].reshape(-1, 3)
    assert (band == band[0]).all()  # flat color, no glyph structure
    data0, info0, pad0 = prep_image(im)  # default: reference-exact
    assert pad0 == 0 and info0[0] == resized_h
    np.testing.assert_array_equal(data0[:resized_h], data[pad:pad + resized_h])


def test_rgb_bgr_flip(rng):
    im = rng.randint(0, 255, (4, 4, 3)).astype(np.uint8)
    np.testing.assert_array_equal(rgb_to_bgr(im)[..., 0], im[..., 2])


def test_batch_images_common_bucket(rng):
    ims = [
        rng.randint(0, 255, (300, 450, 3)).astype(np.uint8),
        rng.randint(0, 255, (330, 440, 3)).astype(np.uint8),
    ]
    data, infos, pads = batch_images(ims)
    assert data.shape[0] == 2
    assert infos.shape == (2, 3)
    assert pads.shape == (2,)
    assert data.shape[1:3] in {tuple(b) for b in cfg.TPU.BUCKETS}


def test_load_image_applies_exif_orientation(tmp_path, rng):
    """cv2.imread (the reference loader) honors EXIF orientation; ours must
    too — demo 008.jpg is stored rotated (orientation tag 6) and its golden
    boxes only exist on the upright image."""
    from PIL import Image

    from ctpn_tpu.utils.image import load_image_bgr

    arr = rng.randint(0, 255, (40, 60, 3), dtype=np.uint8)
    path = str(tmp_path / "rot.jpg")
    exif = Image.Exif()
    exif[274] = 6  # "rotate 90 CW to display upright"
    Image.fromarray(arr).save(path, exif=exif)
    loaded = load_image_bgr(path)
    assert loaded.shape[:2] == (60, 40)  # transposed on load
