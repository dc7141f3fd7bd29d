from yololite_tpu.deploy.predictor import Predictor
from yololite_tpu.deploy.export import export_model, load_exported

__all__ = ["Predictor", "export_model", "load_exported"]
