from .dataset import ClassificationDataset, YoloDataset
from .labels import LabelRecord, get_img_files, img2label_paths, load_labels
from .loader import DataLoader

__all__ = ["ClassificationDataset", "YoloDataset", "LabelRecord",
           "get_img_files", "img2label_paths", "load_labels", "DataLoader"]
