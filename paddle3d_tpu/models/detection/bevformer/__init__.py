from .bevformer import BEVFormer
