from .bevdet import BEVDet
from .centerpoint import CenterHead, CenterPoint
from .petr import PETR
from .pointpillars import PointPillars
from .smoke import SMOKE, SMOKEPredictor
