"""Datasets and input pipeline: VOC loader, roidb, minibatch, prefetch."""

from ctpn_tpu.data.voc import PascalVOC, get_imdb, list_imdbs  # noqa: F401
from ctpn_tpu.data.roidb import prepare_roidb, get_training_roidb  # noqa: F401
from ctpn_tpu.data.minibatch import RoIDataLayer  # noqa: F401
from ctpn_tpu.data.pipeline import PrefetchLoader  # noqa: F401
