"""No-op logger (ref loggers/non_logger.py:23)."""
from __future__ import annotations

from .logger import Logger


class NonLogger(Logger):
    def setup(self, context):
        pass

    def save_context(self, context, folder: str, iteration: int):
        pass

    def log(self, log_dict: dict):
        pass
