"""TPU-native op library.

Each module here replaces one CUDA op family from the reference's
`paddle3d/ops/` zoo (see SURVEY.md §2.1) with fixed-shape XLA programs and,
for profiled hot spots, Pallas kernels under `ops/pallas/`. `host_ops`
binds the native C++ host library (csrc/) via ctypes — the analogue of the
reference's lazily-built custom ops without the import-hook machinery.
"""
from . import (box_ops, host_ops, iou3d_nms, ms_deform_attn, pointnet2,
               scatter, sparse, voxelize)
from .box_ops import (boxes_to_corners_3d, boxes_to_corners_bev, limit_period,
                      second_box_decode, second_box_encode)
from .iou3d_nms import (boxes_iou3d, boxes_iou_bev, boxes_overlap_bev, nms_bev,
                        rotate_nms_pcdet)
from .ms_deform_attn import ms_deform_attn
from .pointnet2 import (ball_query, farthest_point_sample, gather_operation,
                        grouping_operation, knn_query, three_interpolate,
                        three_nn)
from .scatter import bev_pool, pillar_scatter
from .voxelize import hard_voxelize, hard_voxelize_batch
