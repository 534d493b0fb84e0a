from .base import BaseDataset, MetricABC, collate_lidar
from .dataset_wrapper import CBGSDataset
from .synthetic import (SyntheticDataset, SyntheticMetric,
                        SyntheticMonoDataset, SyntheticMonoMetric,
                        SyntheticMVDataset, SyntheticMVMetric)
from .kitti import KittiDetDataset, KittiMetric, KittiPCDataset
from .nuscenes import (NuscenesMMDataset, NuscenesMVDataset,
                       NuscenesPCDataset, NuScenesMetric)
from .modelnet40 import ModelNet40
from .semantic_kitti import SemanticKITTIDataset, SemanticKittiMetric
from .waymo import WaymoMetric, WaymoPCDataset
from .apollo import ApolloLaneDataset, ApolloLaneMetric
