from .losses import compute_loss
from .metrics import medial_errors, segmentation_iou, skeleton_distance
from .schedule import ReduceLROnPlateau
from .tracker import MetricsSink, Tracker
