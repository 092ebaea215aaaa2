"""flux_tpu.ops — wavefront compute kernels (intersection, BRDF, shading)."""

from .brdf import sample_directions
from .intersect import Hit, Intersector, intersect, intersect_scan
from .shade import PathState, bounce

__all__ = [
    "Hit",
    "Intersector",
    "intersect",
    "intersect_scan",
    "sample_directions",
    "PathState",
    "bounce",
]
