from yololite_tpu.train.steps import Trainer, TrainState, normalize_images
from yololite_tpu.train.loop import train_from_config
from yololite_tpu.train.checkpoint import (save_checkpoint, load_checkpoint,
                                           build_meta, model_from_meta)
from yololite_tpu.train.schedulers import build_scheduler, Scheduler
from yololite_tpu.train.ema import ema_update, ema_warmup_limit

__all__ = ["Trainer", "TrainState", "normalize_images", "train_from_config",
           "save_checkpoint", "load_checkpoint", "build_meta", "model_from_meta",
           "build_scheduler", "Scheduler", "ema_update", "ema_warmup_limit"]
