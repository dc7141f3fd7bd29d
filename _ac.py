import json
from yololite_tpu.config import load_configs
from yololite_tpu.train.loop import train_from_config
cfg = load_configs(None, None, "/tmp/toyds_tpu/data.yaml", make_run_dir=False)
cfg["model"] = {"arch": "YOLOLiteMS_CPU", "backbone": "mobilenetv4_conv_small_050",
                "depth_multiple": 0.65, "width_multiple": 0.60,
                "fpn_channels": 160, "head_depth": 1, "num_classes": 2,
                "num_anchors_per_level": 1}
cfg["training"] = {"img_size": 320, "epochs": 40, "batch_size": 8, "lr": 2e-3,
                   "optimizer": "adamw", "weight_decay": 1e-4, "scheduler": "cosine",
                   "grad_clip": 1.0, "ema": True, "ema_decay": 0.995, "amp": True,
                   "augment": True, "seed": 0, "save_every": 100,
                   "save_by": "AP50", "max_boxes": 100, "num_workers": 0}
cfg["loss"] = {"lambda_box": 6.5, "lambda_obj": 1.0, "lambda_cls": 1.5,
               "topk_limit": 20, "area_cells_min": 0.0, "area_cells_max": 256,
               "area_tol": 1.75, "assign_cls_weight": 1.0, "approx_topk": True}
cfg["logging"] = {"log_dir": "runs/approx_conv"}
r = train_from_config(cfg)
print("BEST", r.get("best_metric"))
