from .base import Compose, TransformABC
from .normalize import Normalize, NormalizeRangeImage
from .reader import (LoadImage, LoadPointCloud,
                     RemoveCameraInvisiblePointsKITTI)
from .sampling import SamplingDatabase
from .transform import (FilterBBoxOutsideRange, FilterPointOutsideRange,
                        GlobalRotate, GlobalScale, GlobalTranslate,
                        RandomHorizontalFlip, RandomObjectPerturb,
                        RandomVerticalFlip, SamplePoint, ShufflePoint)
from .target_generator import Gt2SmokeTarget
from .range_image import LoadSemanticKITTIRange
from .multiview import (GlobalRotScaleTransImage, GridMask,
                        NormalizeMultiviewImage, PadMultiViewImage,
                        ResizeCropFlipImage)
