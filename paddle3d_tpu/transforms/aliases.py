"""Reference transform type-name aliases (constructor-compatible only)."""
from ..apis import manager
from .normalize import Normalize
from .transform import FilterPointOutsideRange, ShufflePoint

manager.TRANSFORMS.add_alias("PointShuffle", ShufflePoint)
manager.TRANSFORMS.add_alias("PointsRangeFilter", FilterPointOutsideRange)
manager.TRANSFORMS.add_alias("NormalizeImage", Normalize)
