from . import kitti_utils
from .kitti_depth_det import KittiDepthDataset, KittiDepthMetric
from .kitti_det import KittiDetDataset, KittiPCDataset
from .kitti_metric import KittiMetric
from .kitti_mono_det import KittiMonoDataset
