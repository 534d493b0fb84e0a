from . import kitti_utils
from .kitti_det import KittiDetDataset, KittiPCDataset
from .kitti_metric import KittiMetric
from .kitti_mono_det import KittiMonoDataset
