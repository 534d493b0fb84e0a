"""TPU-native op library.

Each module here replaces one CUDA op family from the reference's
`paddle3d/ops/` zoo (see SURVEY.md §2.1) with fixed-shape XLA programs and,
for profiled hot spots, Pallas kernels under `ops/pallas/`. Unlike the
reference there is no JIT-compile-on-import machinery — everything is
traced/compiled by XLA on first call.
"""
from . import box_ops, iou3d_nms, scatter, voxelize
from .box_ops import (boxes_to_corners_3d, boxes_to_corners_bev, limit_period,
                      second_box_decode, second_box_encode)
from .iou3d_nms import (boxes_iou3d, boxes_iou_bev, boxes_overlap_bev, nms_bev,
                        rotate_nms_pcdet)
from .scatter import bev_pool, pillar_scatter
from .voxelize import hard_voxelize, hard_voxelize_batch
