from .bevfusion import BEVFusion
