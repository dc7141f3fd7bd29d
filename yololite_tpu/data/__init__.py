from yololite_tpu.data.dataset import YoloDataset, parse_yolo_label_file, list_images
from yololite_tpu.data.loader import DataLoader, collate
from yololite_tpu.data.augment import TrainTransform, ValTransform

__all__ = ["YoloDataset", "DataLoader", "collate", "TrainTransform",
           "ValTransform", "parse_yolo_label_file", "list_images"]
