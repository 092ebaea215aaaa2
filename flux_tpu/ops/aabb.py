"""Vectorized axis-aligned bounding-box slab test.

Parity component for the reference's ``BoundingBox::hit`` (fluxcore/src/
shapes.rs:98-133).  The brute-force wavefront intersector deliberately does
NOT use per-shape AABB pretests (a scalar-CPU optimization — see
ops/intersect.py), but the slab test itself remains part of the framework
surface: it is the building block for block-skip acceleration over large scenes,
where a flattened node array walked with ``lax.while_loop`` replaces the
reference's (absent) acceleration structure.

Semantics match shapes.rs:107-132: slab intervals per axis from the signed
inverse direction, hit iff ``t0 < t1 and t1 > T_MIN`` (an unbounded far
test — the reference accepts boxes behind other geometry).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..constants import T_MIN
from ..vec import Vec3

__all__ = ["aabb_hit", "sphere_bounds"]

_T_MIN = np.float32(T_MIN)


def aabb_hit(corner0: Vec3, corner1: Vec3, o: Vec3, d: Vec3):
    """Slab test of rays (o, d) against one box (corner0 <= corner1).

    Box corners are scalars or broadcastable arrays; returns a boolean mask
    over the ray lanes. Division by a zero direction component yields ±inf
    slabs, which the min/max logic handles exactly as IEEE intends.
    """

    def axis(c0, c1, ox, dx):
        a = 1.0 / dx
        lo = (c0 - ox) * a
        hi = (c1 - ox) * a
        return jnp.minimum(lo, hi), jnp.maximum(lo, hi)

    tx0, tx1 = axis(corner0.x, corner1.x, o.x, d.x)
    ty0, ty1 = axis(corner0.y, corner1.y, o.y, d.y)
    tz0, tz1 = axis(corner0.z, corner1.z, o.z, d.z)
    t0 = jnp.maximum(tx0, jnp.maximum(ty0, tz0))
    t1 = jnp.minimum(tx1, jnp.minimum(ty1, tz1))
    return (t0 < t1) & (t1 > _T_MIN)


def sphere_bounds(center, radius):
    """(corner0, corner1) of a sphere's AABB (shapes.rs:154-168)."""
    cx, cy, cz = center
    return (
        Vec3(cx - radius, cy - radius, cz - radius),
        Vec3(cx + radius, cy + radius, cz + radius),
    )
