from .logger import logger
from .timer import Timer
