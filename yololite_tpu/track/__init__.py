from yololite_tpu.track.kalman import (
    KalmanSortTracker, xyxy_to_cxsysr, cxsysr_to_xyxy, iou_xyxy,
)

__all__ = ["KalmanSortTracker", "xyxy_to_cxsysr", "cxsysr_to_xyxy", "iou_xyxy"]
