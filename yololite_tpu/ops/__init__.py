from yololite_tpu.ops.boxes import (
    xywh_to_xyxy,
    xyxy_to_xywh,
    box_iou_matrix,
    box_iou_pairwise,
    bbox_ciou,
    box_area,
)
from yololite_tpu.ops.anchors import make_anchors, level_shapes_for
from yololite_tpu.ops.decode import decode_anchorfree, decode_flat
from yololite_tpu.ops.nms import batched_nms, nms_single
from yololite_tpu.ops.letterbox import (
    letterbox_params,
    letterbox_image,
    unletterbox_boxes,
)

__all__ = [
    "xywh_to_xyxy", "xyxy_to_xywh", "box_iou_matrix", "box_iou_pairwise",
    "bbox_ciou", "box_area", "make_anchors", "level_shapes_for",
    "decode_anchorfree", "decode_flat", "batched_nms", "nms_single",
    "letterbox_params", "letterbox_image", "unletterbox_boxes",
]
