from .checkpoint import load_pretrained_model
from .logger import logger
from .profiler import ProfilerOptions, add_profiler_step
from .timer import Timer
from .ema import ModelEMA, SimpleModelEMA
