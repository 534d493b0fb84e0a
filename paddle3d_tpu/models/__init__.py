from .backbones import *
from .base import *
from .detection import *
from .losses import *
from .middle_encoders import *
from .necks import *
from .voxel_encoders import *
from .voxelizers import *
from .optimizers import *
from .heads import *
from .transformers import *
from .segmentation import *
from .classification import *
from .point_encoders import *
from . import aliases  # reference type-name aliases (must import last)
