"""Struct-of-arrays 3-vectors — the TPU-native vector representation.

A ``(..., 3)`` xyz axis is poison on TPU: the trailing axis lands in the
128-wide lane dimension and pads 3 → 128 (a ~42× VPU/HBM waste on every
vector op).  ``Vec3`` instead keeps three full-shape component arrays, so all
vector arithmetic runs on cleanly tiled lanes.  This replaces the reference's
``nalgebra::Vector3<f64>`` per-ray scalars (used throughout fluxcore) as the
bulk vector type of the wavefront.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["Vec3", "dot", "cross", "normalize", "where", "reflect", "frame_about"]


class Vec3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    def __add__(self, o):
        return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o):
        return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __mul__(self, s):
        """Scalar (array) multiply."""
        return Vec3(self.x * s, self.y * s, self.z * s)

    __rmul__ = __mul__

    def __neg__(self):
        return Vec3(-self.x, -self.y, -self.z)

    def hadamard(self, o: "Vec3") -> "Vec3":
        return Vec3(self.x * o.x, self.y * o.y, self.z * o.z)

    @staticmethod
    def full(shape, x, y, z, dtype=jnp.float32):
        return Vec3(
            jnp.full(shape, x, dtype), jnp.full(shape, y, dtype), jnp.full(shape, z, dtype)
        )

    @staticmethod
    def splat(v):
        """From a length-3 array/sequence of scalars."""
        return Vec3(v[0], v[1], v[2])

    def stack(self) -> jnp.ndarray:
        """To a (..., 3) array (host/output boundary only)."""
        return jnp.stack([self.x, self.y, self.z], axis=-1)


def dot(a: Vec3, b: Vec3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: Vec3, b: Vec3) -> Vec3:
    return Vec3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )


def normalize(a: Vec3) -> Vec3:
    inv = jax.lax.rsqrt(dot(a, a))
    return Vec3(a.x * inv, a.y * inv, a.z * inv)


def where(mask, a: Vec3, b: Vec3) -> Vec3:
    return Vec3(
        jnp.where(mask, a.x, b.x),
        jnp.where(mask, a.y, b.y),
        jnp.where(mask, a.z, b.z),
    )


def reflect(d: Vec3, n: Vec3) -> Vec3:
    """Mirror d about n (brdf.rs:40-41): d - 2 (n·d) n."""
    k = 2.0 * dot(n, d)
    return Vec3(d.x - k * n.x, d.y - k * n.y, d.z - k * n.z)


def frame_about(w: Vec3, eps: Vec3):
    """Orthonormal tangent pair about axis ``w`` via the reference's
    epsilon-vector construction (brdf.rs:23,57): c = normalize(eps × w),
    c2 = c × w. Shared by the BRDF lobes (ops/brdf.py) and NEE cone
    sampling (ops/nee.py)."""
    c = normalize(cross(eps, w))
    return c, cross(c, w)
