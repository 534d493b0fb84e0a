from .base import Compose, TransformABC
from .normalize import Normalize, NormalizeRangeImage
from .reader import (LoadImage, LoadMapsFromFiles, LoadPointCloud,
                     RemoveCameraInvisiblePointsKITTI,
                     RemoveCameraInvisiblePointsKITTIV2)
from .sampling import SamplingDatabase
from .transform import (FilterBBoxOutsideRange, FilterPointOutsideRange,
                        GlobalRotate, GlobalScale, GlobalTranslate,
                        HardVoxelize, RandomBrightness, RandomContrast,
                        RandomHorizontalFlip, RandomObjectPerturb,
                        RandomSaturation, RandomVerticalFlip,
                        ResizeShortestEdge, SamplePoint, SamplePointByVoxels,
                        ShufflePoint)
from .target_generator import Gt2SmokeTarget
from .range_image import LoadSemanticKITTIRange
from .multiview import (GlobalRotScaleTransImage, GridMask,
                        MSResizeCropFlipImage, NormalizeMultiviewImage,
                        PadMultiViewImage,
                        PhotoMetricDistortionMultiViewImage,
                        ResizeCropFlipImage, RandomScaleImageMultiViewImage)
from .reference_parity import (ConvertBoxFormat, GenerateAnchors,
                               Gt2CenterPointTarget, Gt2PVRCNNTarget,
                               LoadAnnotations3D,
                               LoadMultiViewImageFromFiles,
                               LoadMultiViewImageFromMultiSweepsFiles,
                               NormalizeVision, Resize, SampleFilerByKey,
                               SampleNameFilter, SampleRangeFilter,
                               LoadPointsFromFile, LoadPointsFromMultiSweeps,
                               ResizeImage, PadImage, SampleFilterByKey,
                               Gt2PointPillarsTarget,
                               ToVisionBasedBox, Transpose)
