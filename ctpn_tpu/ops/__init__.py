"""On-device geometry ops: anchors, box transforms, IoU, NMS, proposals."""

from ctpn_tpu.ops.anchors import anchor_ladder, shifted_anchors  # noqa: F401
from ctpn_tpu.ops.boxes import (  # noqa: F401
    bbox_transform,
    bbox_transform_inv,
    clip_boxes,
    box_sizes,
)
from ctpn_tpu.ops.iou import pairwise_iou, pairwise_intersection_frac  # noqa: F401
from ctpn_tpu.ops.nms import nms_mask, nms_keep_indices  # noqa: F401
