from yololite_tpu.losses.simota import SimOTALoss, LossConfig

__all__ = ["SimOTALoss", "LossConfig"]
