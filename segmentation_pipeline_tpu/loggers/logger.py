"""Logger ABC (ref loggers/logger.py:4): setup / save_context / log."""
from __future__ import annotations

from abc import ABC, abstractmethod


class Logger(ABC):
    @abstractmethod
    def setup(self, context):
        ...

    @abstractmethod
    def save_context(self, context, folder: str, iteration: int):
        ...

    @abstractmethod
    def log(self, log_dict: dict):
        ...
