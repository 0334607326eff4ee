from .logger import Logger
from .non_logger import NonLogger
from .file_logger import FileLogger
from .wandb_logger import WandbLogger

__all__ = ["Logger", "NonLogger", "FileLogger", "WandbLogger"]
