"""Per-phase wall-clock timing with device synchronization.

TPU analog of ref utils/torch_timer.py:44-68 (TorchTimer with CUDA stream
sync): ``stamp`` optionally blocks on a jax array so async dispatch doesn't
hide device time; optional jax.profiler trace hooks for deep dives.
"""
from __future__ import annotations

import time


class Timer:
    def __init__(self, sync: bool = True):
        self.sync = sync
        self.timestamps = {}
        self._last = None

    def start(self):
        self.timestamps = {}
        self._last = time.time()

    def stamp(self, name: str, sync_on=None):
        if self.sync and sync_on is not None:
            import jax

            jax.block_until_ready(sync_on)
        now = time.time()
        self.timestamps[name] = self.timestamps.get(name, 0.0) + (now - self._last)
        self._last = now


class ProfilerTrace:
    """Context manager around jax.profiler.trace for capturing device
    timelines (view with TensorBoard or xprof)."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def __enter__(self):
        import jax

        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        import jax

        jax.profiler.stop_trace()
        return False
