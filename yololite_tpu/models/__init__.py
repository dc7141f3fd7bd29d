from yololite_tpu.models.detector import (
    YOLOLiteMS,
    build_model_from_config,
    init_model,
    count_params,
    pick_out_indices,
)
from yololite_tpu.models.backbones import BACKBONES, build_backbone, backbone_feature_info

__all__ = [
    "YOLOLiteMS", "build_model_from_config", "init_model", "count_params",
    "pick_out_indices", "BACKBONES", "build_backbone", "backbone_feature_info",
]
