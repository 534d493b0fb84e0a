from .pointnet2_modules import PointMLP, SAModuleMSG, VoteLayer
