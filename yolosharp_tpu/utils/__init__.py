from .metrics import ap_per_class, match_predictions, summarize
from .training import EarlyStopping, TrainLogger

__all__ = ["ap_per_class", "match_predictions", "summarize", "EarlyStopping",
           "TrainLogger"]
