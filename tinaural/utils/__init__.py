"""Utilities: trajectory paths, profiling, logging."""

from .paths import circular_sweep, waypoints_to_block_dirs
from .profiling import fence, steady_state, timeit, trace

__all__ = [
    "circular_sweep",
    "waypoints_to_block_dirs",
    "fence",
    "steady_state",
    "timeit",
    "trace",
]
