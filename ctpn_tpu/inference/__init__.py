"""Inference: jit end-to-end detector and streaming batched runner."""

from ctpn_tpu.inference.pipeline import CTPNPredictor  # noqa: F401
