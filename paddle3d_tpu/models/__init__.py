from .backbones import *
from .base import *
from .detection import *
from .losses import *
from .middle_encoders import *
from .necks import *
from .voxel_encoders import *
from .voxelizers import *
