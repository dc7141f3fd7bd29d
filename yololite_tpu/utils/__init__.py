from yololite_tpu.utils.viz import draw_detections, visualize_batch, save_val_debug
from yololite_tpu.utils.profiling import trace, StageTimer

__all__ = ["draw_detections", "visualize_batch", "save_val_debug", "trace",
           "StageTimer"]
