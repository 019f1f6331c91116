"""Renderer models (L4 of SURVEY.md §1)."""

from .renderer import BinauralRenderer, render, render_scene, render_trajectory
from .streaming import BatchedStream, Stream, StreamState, init_state

__all__ = [
    "BinauralRenderer",
    "render",
    "render_scene",
    "render_trajectory",
    "Stream",
    "BatchedStream",
    "StreamState",
    "init_state",
]
