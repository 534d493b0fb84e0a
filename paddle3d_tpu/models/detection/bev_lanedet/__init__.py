from .bev_lanedet import BEVLaneDet
