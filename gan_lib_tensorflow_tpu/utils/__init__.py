"""Utilities: scalar logging, image grids, profiling, config."""

from .logging import ScalarLogger
from .images import save_image_grid, to_uint8
from .profiler import StepTimer, hard_sync, maybe_trace

__all__ = ["ScalarLogger", "save_image_grid", "to_uint8", "StepTimer", "hard_sync", "maybe_trace"]
