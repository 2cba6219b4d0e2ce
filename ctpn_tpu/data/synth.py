"""Synthetic scene-text dataset generator.

Renders random text lines (PIL default font, scalable) onto noisy
backgrounds and emits ICDAR/MLT-style ``gt_<stem>.txt`` 8-coordinate polygon
files — the exact input format of the data-prep pipeline
(`ctpn_tpu/data/prepare.py`, reference `split_label.py`). Used for:

* end-to-end training validation without external datasets (the reference
  requires a multi-GB VOC tree that is not shipped);
* training smoke/convergence tests and demo artifacts.
"""

from __future__ import annotations

import os
import os.path as osp
import string
from typing import List, Tuple

import numpy as np
from PIL import Image, ImageDraw, ImageFont


def _font(size: int):
    try:
        return ImageFont.load_default(size=size)
    except TypeError:  # older PIL: fixed-size bitmap font
        return ImageFont.load_default()


def render_image(
    rng: np.random.RandomState,
    width: int = 900,
    height: int = 600,
    max_lines: int = 6,
) -> Tuple[np.ndarray, List[Tuple[float, ...]]]:
    """One RGB uint8 image + list of 8-coord text-line polygons."""
    base = rng.randint(0, 120)
    img = Image.fromarray(
        (base + rng.randn(height, width, 3) * 18).clip(0, 255).astype(np.uint8)
    )
    # background clutter: rectangles/ellipses
    draw = ImageDraw.Draw(img)
    for _ in range(rng.randint(2, 7)):
        x0, y0 = rng.randint(0, width - 40), rng.randint(0, height - 40)
        x1, y1 = x0 + rng.randint(20, 200), y0 + rng.randint(20, 200)
        color = tuple(int(c) for c in rng.randint(0, 255, 3))
        if rng.rand() < 0.5:
            draw.rectangle([x0, y0, x1, y1], outline=color, width=rng.randint(1, 4))
        else:
            draw.ellipse([x0, y0, x1, y1], outline=color, width=rng.randint(1, 4))

    polys = []
    chars = string.ascii_letters + string.digits
    n_lines = rng.randint(1, max_lines + 1)
    for _ in range(n_lines):
        size = int(rng.randint(18, 56))
        font = _font(size)
        text = "".join(rng.choice(list(chars)) for _ in range(rng.randint(4, 14)))
        # light text on dark bg or vice versa
        bright = rng.rand() < 0.5
        fill = tuple(int(c) for c in (rng.randint(180, 255, 3) if bright
                                      else rng.randint(0, 70, 3)))
        for _attempt in range(10):
            x = rng.randint(5, max(6, width - 60))
            y = rng.randint(5, max(6, height - 60))
            bbox = draw.textbbox((x, y), text, font=font)
            if bbox[2] < width - 2 and bbox[3] < height - 2:
                break
        else:
            continue
        draw.text((x, y), text, font=font, fill=fill)
        x0, y0, x1, y1 = bbox
        polys.append((x0, y0, x1, y0, x1, y1, x0, y1))
    return np.asarray(img), polys


def generate_dataset(
    out_dir: str,
    n_images: int = 100,
    seed: int = 3,
    width: int = 900,
    height: int = 600,
) -> Tuple[str, str]:
    """Write images + gt files; returns (image_dir, label_dir)."""
    img_dir = osp.join(out_dir, "image")
    gt_dir = osp.join(out_dir, "label")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n_images):
        arr, polys = render_image(rng, width=width, height=height)
        stem = f"synth_{i:05d}"
        Image.fromarray(arr).save(osp.join(img_dir, stem + ".jpg"), quality=92)
        with open(osp.join(gt_dir, f"gt_{stem}.txt"), "w") as f:
            for p in polys:
                f.write(",".join(str(int(v)) for v in p) + ",text\n")
    return img_dir, gt_dir
