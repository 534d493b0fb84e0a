from .bevdet import BEVDet
from .iassd import IASSD
from .centerpoint import CenterHead, CenterPoint
from .petr import PETR
from .pointpillars import PointPillars
from .smoke import SMOKE, SMOKEPredictor
