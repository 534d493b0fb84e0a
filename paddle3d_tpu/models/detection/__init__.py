from .bev_lanedet import BEVLaneDet
from .bevdet import BEVDet
from .caddn import CADDN
from .dd3d import DD3D
from .bevfusion import BEVFusion
from .bevformer import BEVFormer
from .iassd import IASSD
from .pv_rcnn import PVRCNN, VoxelRCNN
from .centerpoint import CenterHead, CenterPoint
from .petr import PETR
from .pointpillars import PointPillars
from .rtebev import RTEBev
from .smoke import SMOKE, SMOKEPredictor
