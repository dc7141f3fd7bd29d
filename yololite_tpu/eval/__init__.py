from yololite_tpu.eval.coco import COCOEvaluator, coco_eval_from_lists
from yololite_tpu.eval.prf1 import build_curves_from_coco
from yololite_tpu.eval.confusion import create_confusion_matrix
from yololite_tpu.eval.evaluate import evaluate_model
from yololite_tpu.eval.plots import plot_metrics

__all__ = ["COCOEvaluator", "coco_eval_from_lists", "build_curves_from_coco",
           "create_confusion_matrix", "evaluate_model", "plot_metrics"]
