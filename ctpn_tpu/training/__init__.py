"""Training: losses, train step, solver loop, checkpointing."""

from ctpn_tpu.training.loss import ctpn_loss, smooth_l1  # noqa: F401
