"""Text-line post-processing: proposal graph + connectors (H and O modes)."""

from ctpn_tpu.postprocess.detector import TextDetector, detect_lines  # noqa: F401
