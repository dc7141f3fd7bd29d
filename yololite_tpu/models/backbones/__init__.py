from yololite_tpu.models.backbones.zoo import (
    BACKBONES,
    build_backbone,
    backbone_feature_info,
)

__all__ = ["BACKBONES", "build_backbone", "backbone_feature_info"]
