from .losses import (classification_loss, detection_loss, e2e_gain_schedule,
                     e2e_wrap, flatten_levels, obb_loss, pose_loss,
                     segmentation_loss)
from .tal import AssignResult, assign

__all__ = [
    "classification_loss", "detection_loss", "e2e_gain_schedule", "e2e_wrap",
    "flatten_levels", "obb_loss", "pose_loss", "segmentation_loss",
    "AssignResult", "assign",
]
