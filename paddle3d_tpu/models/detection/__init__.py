from .pointpillars import PointPillars
