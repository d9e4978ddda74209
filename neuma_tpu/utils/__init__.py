from .config import Config, load_config
from .logging import Logger, Timer, AverageMeter

__all__ = [
    "Config",
    "load_config",
    "Logger",
    "Timer",
    "AverageMeter",
]
