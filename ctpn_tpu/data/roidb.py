"""Roidb enrichment (reference `lib/roi_data_layer/roidb.py` +
`lib/fast_rcnn/train.py:184-198`).

``prepare_roidb`` attaches image path/size and dense max-class/max-overlap
fields with the reference's sanity checks (`roidb.py:7-35`).
``get_training_roidb`` applies the flip augmentation then prepares
(`train.py:184-198`).

The reference also precomputes normalized per-roi regression targets on the
host (`add_bbox_regression_targets`, `roidb.py:37-105`); in the RPN-only
CTPN recipe those values are never consumed by the loss (targets come from
the anchor-target layer), and this framework computes anchor targets on
device — so that precompute is intentionally not carried over. The
normalization constants remain available at cfg.TRAIN.BBOX_NORMALIZE_*.
"""

from __future__ import annotations

from typing import List

import numpy as np
from PIL import Image

from ctpn_tpu.config import cfg
from ctpn_tpu.data.voc import PascalVOC


def prepare_roidb(imdb: PascalVOC) -> None:
    roidb = imdb.roidb
    sizes = [Image.open(imdb.image_path_at(i)).size for i in range(imdb.num_images)]
    for i in range(len(imdb.image_index)):
        entry = roidb[i]
        entry["image"] = imdb.image_path_at(i)
        entry["width"] = sizes[i % imdb.num_images][0] if len(sizes) else 0
        entry["height"] = sizes[i % imdb.num_images][1] if len(sizes) else 0
        gt_overlaps = entry["gt_overlaps"]
        max_overlaps = gt_overlaps.max(axis=1)
        max_classes = gt_overlaps.argmax(axis=1)
        entry["max_classes"] = max_classes
        entry["max_overlaps"] = max_overlaps
        # sanity checks from `roidb.py:29-35`
        zero_inds = np.where(max_overlaps == 0)[0]
        assert all(max_classes[zero_inds] == 0)
        nonzero_inds = np.where(max_overlaps > 0)[0]
        assert all(max_classes[nonzero_inds] != 0)


def get_training_roidb(imdb: PascalVOC) -> List[dict]:
    """Flip-augment (if enabled) and prepare (`train.py:184-198`)."""
    if cfg.TRAIN.USE_FLIPPED:
        imdb.append_flipped_images()
    prepare_roidb(imdb)
    return imdb.roidb
