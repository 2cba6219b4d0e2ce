"""Device-mesh parallelism: data-parallel training/inference over ICI."""

from ctpn_tpu.parallel.mesh import make_mesh  # noqa: F401
from ctpn_tpu.parallel.dp import shard_train_step, shard_batch  # noqa: F401
