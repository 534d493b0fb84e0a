from . import manager
from .checkpoint import Checkpoint
from .config import Config
from .dataloader import DataLoader
from .scheduler import Scheduler, SchedulerStatus
from .trainer import Trainer
