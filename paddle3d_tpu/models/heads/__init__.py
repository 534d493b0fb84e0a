from .cape_head import CAPEHead
from .class_heads import DeepLabV3Head, OCRNetHead
from .bevformer_head import BEVFormerHead
from .petr_head import PETRHead
from .rtebev_head import RTEBevHead
from .petr_seg_head import PETRSegHead
from .target_assigners import (BBox3DL1Cost, FocalLossCost,
                               HungarianAssigner3D, hungarian_match)
from .anchor3d_head import Anchor3DHead
from .proposal_target_layer import (ProposalTargetConfig, proposal_targets,
                                    sample_rois_for_rcnn)
from .point_head import PointHeadSimple
from .roi_head import RoIGridHead
from .bbox_coders import (CenterPointBBoxCoder, DeltaXYZWLHRBBoxCoder,
                          NMSFreeCoder)
from .target_assigners import (BBoxL1Cost, ClassificationCost, IoUCost,
                               MaxIoUAssigner, PseudoSampler, RandomSampler)
