"""ctpn_tpu — a TPU-native (JAX/XLA/Pallas) scene-text-detection framework.

A from-scratch rebuild of the capabilities of eragonruan/text-detection-ctpn
(CTPN: Connectionist Text Proposal Network, arXiv:1609.03605) designed for TPU
hardware: fixed-shape masked compute, on-device NMS/proposal decoding, batched
pipelines, and `jax.sharding` data parallelism over device meshes.

Layering (mirrors SURVEY.md §1 of the reference, re-designed TPU-first):

    ops/          on-device geometry kernels: anchors, box transforms, IoU,
                  fixed-shape NMS (jnp + Pallas bitmask kernel), proposal
                  decode, anchor-target assignment
    models/       VGG16 backbone + BiLSTM + CTPN heads (flax.linen)
    postprocess/  text-line connector (H and O modes) as vectorized XLA ops
    data/         VOC dataset, roidb, minibatch assembly, async prefetch,
                  offline data prep (strip splitting / VOC conversion)
    training/     loss, train loop, checkpointing (orbax)
    inference/    jit end-to-end detector, streaming batched inference, export
    parallel/     mesh construction, data-parallel step functions
    utils/        config-compatible image preprocessing, timers, weights IO
"""

__version__ = "0.1.0"

from ctpn_tpu.config import cfg, get_cfg, cfg_from_file, cfg_from_list  # noqa: F401
