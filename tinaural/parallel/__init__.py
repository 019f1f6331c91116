"""Sharding layer: device meshes, source-parallel scenes, block-parallel
long signals, stream-sharded serving (SURVEY.md §2 rebuild-only rows; §5)."""

from .fit import fit_step_sharded, scene_loss_sharded
from .mesh import make_mesh
from .scene import render_scene_sharded
from .sequence import render_long_sharded
from .streams import ShardedBatchedStream

__all__ = [
    "make_mesh",
    "render_scene_sharded",
    "render_long_sharded",
    "fit_step_sharded",
    "scene_loss_sharded",
    "ShardedBatchedStream",
]
