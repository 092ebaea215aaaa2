"""flux_tpu.ops — wavefront compute kernels (intersection, BRDF, shading)."""

from .brdf import sample_directions
from .intersect import Hit, intersect
from .shade import PathState, bounce

__all__ = ["Hit", "intersect", "sample_directions", "PathState", "bounce"]
