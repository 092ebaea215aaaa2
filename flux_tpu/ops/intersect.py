"""Vectorized ray–scene intersection (the reference's hot inner loop).

Replaces the reference's per-ray trait-object sweep — ``Scene::hit`` linear
min over boxed shapes (fluxcore/src/scene.rs:156-160) with per-sphere AABB
slab pretests (shapes.rs:98-133,172-175) — with the transposed, TPU-native
iteration: the *shape* loop is unrolled at trace time (shape counts are
static) and each shape is tested against the whole wavefront as one fused
VPU pass over struct-of-arrays lanes.  The running nearest-hit minimum also
folds in the winning shape's material record, so the bounce step needs no
gathers at all — the reference's ``&dyn Material`` virtual dispatch
(common.rs:10) becomes a handful of selects carried through the loop.

The AABB pretest is dropped deliberately: it only lets a scalar CPU tracer
skip work per ray; on the VPU every lane computes anyway, so the test would
be pure overhead.

Intersection math matches shapes.rs exactly: quadratic with the near root
preferred, the far root accepted when the near one is behind ``T_MIN``
(shapes.rs:187-211), normals scaled by the ``invert`` sign for hollow
emissive environment spheres (shapes.rs:183,192), and the unbounded plane
test ``t > T_MIN`` (shapes.rs:136-151).  Ties go to the lowest shape index,
matching the reference's ``<=``-biased ``min_by`` (common.rs:16-24).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..constants import T_MIN
from ..scene import SceneArrays
from ..vec import Vec3
from ..vec import where as vwhere

__all__ = ["Hit", "intersect"]

_T_MIN = np.float32(T_MIN)
_INF = np.float32(np.inf)


class Hit(NamedTuple):
    """Wavefront hit record (SoA analog of common.rs:7-14), pre-fused with
    the winning shape's material row so shading needs no table lookups."""

    mask: jnp.ndarray  # (B,) bool: anything hit
    t: jnp.ndarray  # (B,) f32 distance (inf on miss)
    shape: jnp.ndarray  # (B,) i32 winning shape index (spheres, then planes)
    point: Vec3  # hit point
    normal: Vec3  # unit for spheres; planes as authored
    kind: jnp.ndarray  # (B,) i32 material kind of the winning shape
    albedo: Vec3  # material color × scalar weight
    exponent: jnp.ndarray  # (B,) f32 Phong exponent (glossy lanes)


def intersect(scene: SceneArrays, o: Vec3, d: Vec3) -> Hit:
    """Nearest hit of the wavefront (o, d) against every shape."""
    ns = scene.num_spheres
    npl = scene.num_planes
    batch = o.x.shape
    zeros = jnp.zeros(batch, jnp.float32)

    # Material table with the scalar weight folded into the color.
    alb = scene.mat_color * scene.mat_param[:, None]  # (N, 3)

    # a = d·d (shapes.rs:178). Directions are unit by construction, but the
    # reference divides by a, so we keep it — hoisted to one reciprocal per
    # bounce instead of two divides per sphere.
    a = d.x * d.x + d.y * d.y + d.z * d.z
    inv_a = 1.0 / a

    best_t = jnp.full(batch, _INF, jnp.float32)
    best_idx = jnp.zeros(batch, jnp.int32)
    best_kind = jnp.zeros(batch, jnp.int32)
    best_exp = zeros
    best_alb = Vec3(zeros, zeros, zeros)
    # Sphere-normal ingredients: center and invert/radius (0 for planes).
    best_ctr = Vec3(zeros, zeros, zeros)
    best_inv_r = zeros
    # Plane normal (authored, not derived from the hit point).
    best_pn = Vec3(zeros, zeros, zeros)

    def take(cond, i, kind_i, exp_i, alb_i, ctr_i, inv_r_i, pn_i):
        nonlocal best_idx, best_kind, best_exp, best_alb, best_ctr, best_inv_r, best_pn
        best_idx = jnp.where(cond, np.int32(i), best_idx)
        best_kind = jnp.where(cond, kind_i, best_kind)
        best_exp = jnp.where(cond, exp_i, best_exp)
        best_alb = vwhere(cond, alb_i, best_alb)
        best_ctr = vwhere(cond, ctr_i, best_ctr)
        best_inv_r = jnp.where(cond, inv_r_i, best_inv_r)
        best_pn = vwhere(cond, pn_i, best_pn)

    for i in range(ns):
        cx, cy, cz = (scene.sphere_center[i, k] for k in range(3))
        radius = scene.sphere_radius[i]
        inv_r = scene.sphere_invert[i] / radius
        # |o + t d - c|^2 = r^2  (shapes.rs:176-211)
        ocx, ocy, ocz = o.x - cx, o.y - cy, o.z - cz
        b_half = ocx * d.x + ocy * d.y + ocz * d.z
        c = ocx * ocx + ocy * ocy + ocz * ocz - radius * radius
        disc = b_half * b_half - a * c
        e = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_near = (-b_half - e) * inv_a
        t = jnp.where(t_near > _T_MIN, t_near, (-b_half + e) * inv_a)
        valid = (disc >= 0.0) & (t > _T_MIN)
        cond = valid & (t < best_t)
        best_t = jnp.where(cond, t, best_t)
        take(
            cond,
            i,
            scene.mat_kind[i],
            scene.mat_exp[i],
            Vec3(alb[i, 0], alb[i, 1], alb[i, 2]),
            Vec3(cx, cy, cz),
            inv_r,
            best_pn,
        )

    for j in range(npl):
        i = ns + j
        px, py, pz = (scene.plane_point[j, k] for k in range(3))
        nx, ny, nz = (scene.plane_normal[j, k] for k in range(3))
        # t = (p - o)·n / (d·n)  (shapes.rs:136-151)
        num = (px - o.x) * nx + (py - o.y) * ny + (pz - o.z) * nz
        den = d.x * nx + d.y * ny + d.z * nz
        t = num / den  # den==0 -> ±inf/nan; both rejected below
        valid = t > _T_MIN
        cond = valid & (t < best_t)
        best_t = jnp.where(cond, t, best_t)
        take(
            cond,
            i,
            scene.mat_kind[i],
            scene.mat_exp[i],
            Vec3(alb[i, 0], alb[i, 1], alb[i, 2]),
            best_ctr,
            jnp.zeros((), jnp.float32),
            Vec3(nx, ny, nz),
        )

    mask = jnp.isfinite(best_t)
    t_safe = jnp.where(mask, best_t, 0.0)
    point = Vec3(o.x + t_safe * d.x, o.y + t_safe * d.y, o.z + t_safe * d.z)

    # Sphere normal (point - c) * invert / r; plane lanes have inv_r == 0 and
    # take the authored plane normal instead.
    n_sph = (point - best_ctr) * best_inv_r
    is_plane = best_inv_r == 0.0
    normal = vwhere(is_plane, best_pn, n_sph)

    return Hit(
        mask=mask,
        t=best_t,
        shape=best_idx,
        point=point,
        normal=normal,
        kind=best_kind,
        albedo=best_alb,
        exponent=best_exp,
    )
