"""flux_tpu.parallel — multi-chip rendering over a device mesh."""

from .distributed import init_multihost
from .mesh import make_mesh, pick_mesh_shape
from .shard import MeshRenderer, sharded_unit_fn

__all__ = [
    "init_multihost",
    "make_mesh",
    "pick_mesh_shape",
    "MeshRenderer",
    "sharded_unit_fn",
]
