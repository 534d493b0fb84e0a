from .centerpoint import CenterHead, CenterPoint
from .pointpillars import PointPillars
from .smoke import SMOKE, SMOKEPredictor
