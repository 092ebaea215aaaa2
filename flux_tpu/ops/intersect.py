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

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax

import jax.numpy as jnp
import numpy as np

from ..constants import T_MIN
from ..scene import SceneArrays
from ..vec import Vec3
from ..vec import where as vwhere

__all__ = ["Hit", "Intersector", "ScanLayout", "scan_layout", "TriLayout", "tri_layout", "intersect", "intersect_scan", "intersect_scan_carry", "occluded_sweep", "occluded_scan", "triangle_t", "triangle_nearest", "triangle_occluded", "tri_carry_init", "fold_tri_block", "fold_tri_occluded_block", "merge_tri_hit"]

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



def sphere_t(o: Vec3, d: Vec3, a, inv_a, cx, cy, cz, radius, on_self=None):
    """The reference's ray-sphere quadratic (shapes.rs:176-211): near root
    preferred, far root accepted when the near one is behind T_MIN. Returns
    (t, valid). The single definition of the hit rule — the unrolled sweep
    and both scan forms all fold this.

    ``a is None`` selects the unit-direction form (a == d·d == 1 exactly;
    see :func:`quad_a`): the reference normalizes every ray direction
    (trace.rs:50, brdf.rs:26), so its f64 ``a`` IS 1 and dividing by our
    f32 ``a = 1 ± ulp`` only adds rounding noise — dropping it saves three
    multiplies per sphere per lane in the hottest loop of the program and
    preserves T_MIN semantics (t stays in world units).

    ``on_self`` (optional bool mask) marks lanes whose ray ORIGIN lies on
    this very sphere (the previous bounce's hit point). There the true
    ``c = |o−C|² − R²`` is 0, but its f32 evaluation carries ~ulp(R²)
    noise — which at grazing exit angles (cosθ ≲ 1e-3) manufactures a
    false root ≈ |c|/(2·b_half) above T_MIN: a self-re-hit the reference's
    f64 (noise ~1e-8·R², shapes.rs:176-211) would never take. Forcing
    ``c = 0`` on those lanes is EXACT: the roots become 0 and −2·b_half/a,
    and the unchanged near/far selection then rejects outward exits
    (both roots ≤ T_MIN) while keeping genuine re-entry through the
    interior (far root 2·|b_half| for inward directions)."""
    ocx, ocy, ocz = o.x - cx, o.y - cy, o.z - cz
    b_half = ocx * d.x + ocy * d.y + ocz * d.z
    c = ocx * ocx + ocy * ocy + ocz * ocz - radius * radius
    if on_self is not None:
        c = jnp.where(on_self, 0.0, c)
    if a is None:
        disc = b_half * b_half - c
        e = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_near = -b_half - e
        t = jnp.where(t_near > _T_MIN, t_near, -b_half + e)
    else:
        disc = b_half * b_half - a * c
        e = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_near = (-b_half - e) * inv_a
        t = jnp.where(t_near > _T_MIN, t_near, (-b_half + e) * inv_a)
    return t, (disc >= 0.0) & (t > _T_MIN)


def quad_a(scene, d: Vec3):
    """(a, inv_a) for :func:`sphere_t` — (None, None) when the scene
    guarantees unit ray directions (SceneArrays.unit_d), else the
    reference's hoisted a = d·d and its reciprocal (shapes.rs:177-187)."""
    if scene.unit_d:
        return None, None
    a = d.x * d.x + d.y * d.y + d.z * d.z
    return a, 1.0 / a


def triangle_t(o: Vec3, d: Vec3, v0, e1, e2):
    """Möller–Trumbore ray–triangle test for one triangle against the whole
    wavefront. ``v0``/``e1``/``e2`` are length-3 sequences (per-triangle
    scalars broadcast over lanes). Returns (t, valid).

    No epsilon guard on the determinant: a (near-)degenerate det makes
    ``inv`` huge or ±inf, and every acceptance path then fails arithmetically
    (inf fails ``u+v <= 1``; 0·inf = NaN fails every comparison) — the same
    NaN-rejection discipline the plane test uses for ``den == 0``.
    Triangles are double-sided, like the reference's planes
    (shapes.rs:136-151): front/back hits both count, and shading sees the
    authored (winding) normal either way."""
    # p = d × e2
    px = d.y * e2[2] - d.z * e2[1]
    py = d.z * e2[0] - d.x * e2[2]
    pz = d.x * e2[1] - d.y * e2[0]
    det = e1[0] * px + e1[1] * py + e1[2] * pz
    inv = 1.0 / det
    sx, sy, sz = o.x - v0[0], o.y - v0[1], o.z - v0[2]
    u = (sx * px + sy * py + sz * pz) * inv
    # q = s × e1
    qx = sy * e1[2] - sz * e1[1]
    qy = sz * e1[0] - sx * e1[2]
    qz = sx * e1[1] - sy * e1[0]
    v = (d.x * qx + d.y * qy + d.z * qz) * inv
    t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv
    valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > _T_MIN)
    return t, valid


# Triangle count above which the nearest/any-hit folds stream blocks under
# lax.scan instead of unrolling (the same compile-time wall as the sphere
# sweep; same cure).
TRI_UNROLL_MAX = 64
TRI_BLOCK = 32


def _tri_cols(scene: SceneArrays, k):
    """(v0, e1, e2) column tuples for triangle ``k`` (static index)."""
    return (
        tuple(scene.tri_v0[k, c] for c in range(3)),
        tuple(scene.tri_e1[k, c] for c in range(3)),
        tuple(scene.tri_e2[k, c] for c in range(3)),
    )


def _tri_blocks(scene: SceneArrays):
    """NaN-padded (n_blocks, TRI_BLOCK, 3) views of v0/e1/e2 + original
    index (−1 on padding). NaN v0 makes every comparison false, so padding
    can never win — the same trick as the sphere ScanLayout.

    The 3-block floor keeps the ``lax.scan`` a real loop: XLA's while-loop
    simplifier unrolls shorter trip counts and the resulting inlined
    fold sends XLA:CPU compile time pathological (see scan_layout). Only
    reachable today when callers engage blocks past TRI_UNROLL_MAX = 2
    blocks' worth of triangles, but cheap insurance against constant
    drift."""
    nt = scene.num_triangles
    nb = max(3, -(-nt // TRI_BLOCK))
    padn = nb * TRI_BLOCK - nt

    def pad(a, fill):
        return jnp.concatenate(
            [a, jnp.full((padn, 3), fill, a.dtype)]
        ).reshape(nb, TRI_BLOCK, 3)

    idx = jnp.concatenate(
        [jnp.arange(nt, dtype=jnp.int32), jnp.full((padn,), -1, jnp.int32)]
    ).reshape(nb, TRI_BLOCK)
    return pad(scene.tri_v0, np.nan), pad(scene.tri_e1, 0.0), pad(scene.tri_e2, 0.0), idx


def triangle_nearest(scene: SceneArrays, o: Vec3, d: Vec3, prev_tri=None):
    """Nearest triangle for every lane: (t, k) with t=inf / k=0 on miss.
    Unrolls small scenes; streams TRI_BLOCK chunks under ``lax.scan`` past
    TRI_UNROLL_MAX (constant compile time, same VPU math).

    ``prev_tri`` (optional i32 lanes): triangle index the lane's ray origin
    lies ON (previous bounce's hit), excluded outright — a flat triangle
    can never be re-hit from its own surface, so any such hit is f32 noise
    (the in-plane ``t ≈ 0 ± ulp`` root; see :func:`sphere_t` ``on_self``)."""
    nt = scene.num_triangles
    # Derived from o.x so the carry inherits its varying axes under
    # shard_map (same rule as scan_carry_init).
    best_t = o.x * 0.0 + _INF
    best_k = (o.x * 0.0).astype(jnp.int32)
    if nt == 0:
        return best_t, best_k
    if nt <= TRI_UNROLL_MAX:
        for k in range(nt):
            v0, e1, e2 = _tri_cols(scene, k)
            t, valid = triangle_t(o, d, v0, e1, e2)
            cond = valid & (t < best_t)
            if prev_tri is not None:
                cond &= prev_tri != np.int32(k)
            best_t = jnp.where(cond, t, best_t)
            best_k = jnp.where(cond, np.int32(k), best_k)
        return best_t, best_k

    bv0, be1, be2, bidx = _tri_blocks(scene)

    def step(carry, blk):
        bt, bk = carry
        v0b, e1b, e2b, idx = blk
        for k in range(TRI_BLOCK):
            t, valid = triangle_t(
                o, d,
                (v0b[k, 0], v0b[k, 1], v0b[k, 2]),
                (e1b[k, 0], e1b[k, 1], e1b[k, 2]),
                (e2b[k, 0], e2b[k, 1], e2b[k, 2]),
            )
            # Ties keep the lowest original triangle index, matching the
            # sweep's visit order (common.rs:16-24 tie discipline).
            cond = valid & ((t < bt) | ((t == bt) & (idx[k] < bk)))
            if prev_tri is not None:
                cond &= prev_tri != idx[k]
            bt = jnp.where(cond, t, bt)
            bk = jnp.where(cond, idx[k], bk)
        return (bt, bk), None

    (best_t, best_k), _ = jax.lax.scan(step, (best_t, best_k), (bv0, be1, be2, bidx))
    return best_t, best_k


def triangle_occluded(scene: SceneArrays, o: Vec3, d: Vec3, t_max, exclude_idx, occ, origin_idx=None):
    """Fold triangles into an any-hit occlusion mask (the shadow-ray
    sibling of :func:`triangle_nearest`). ``exclude_idx`` is a full shape
    index; triangles occupy [Ns+Np, Ns+Np+Nt). ``origin_idx`` (optional)
    is the full shape index the shadow ray ORIGINATES on — its own
    triangle is excluded outright (flat shapes cannot self-occlude; any
    such hit is the f32 in-plane noise root)."""
    nt = scene.num_triangles
    if nt == 0:
        return occ
    base = np.int32(scene.num_spheres + scene.num_planes)
    if nt <= TRI_UNROLL_MAX:
        for k in range(nt):
            v0, e1, e2 = _tri_cols(scene, k)
            t, valid = triangle_t(o, d, v0, e1, e2)
            blocks = valid & (t < t_max) & (exclude_idx != base + np.int32(k))
            if origin_idx is not None:
                blocks &= origin_idx != base + np.int32(k)
            occ = occ | blocks
        return occ

    bv0, be1, be2, bidx = _tri_blocks(scene)

    def step(carry, blk):
        v0b, e1b, e2b, idx = blk
        oc = carry
        for k in range(TRI_BLOCK):
            t, valid = triangle_t(
                o, d,
                (v0b[k, 0], v0b[k, 1], v0b[k, 2]),
                (e1b[k, 0], e1b[k, 1], e1b[k, 2]),
                (e2b[k, 0], e2b[k, 1], e2b[k, 2]),
            )
            blocks = valid & (t < t_max) & (exclude_idx != base + idx[k])
            if origin_idx is not None:
                blocks &= origin_idx != base + idx[k]
            oc = oc | blocks
        return oc, None

    occ, _ = jax.lax.scan(step, occ, (bv0, be1, be2, bidx))
    return occ


def _fold_triangles(scene: SceneArrays, o: Vec3, d: Vec3, t, shape_idx, kind, alb, exp, prev=None):
    """Combine the triangle winner into the assembled (t, shape, kind,
    albedo, exponent) record — shared by every XLA intersection path. Also
    returns ``(use_tri, tri_normal)`` so the caller can fold the normal
    AFTER computing the hit point (sphere normals derive from it). Ties
    keep the incumbent: spheres/planes come first in shape order, matching
    the reference's ``<=``-biased min (common.rs:16-24). ``prev`` is the
    full-shape-index self-exclusion lane (see :func:`intersect`)."""
    nt = scene.num_triangles
    if nt == 0:
        return t, shape_idx, kind, alb, exp, None, None
    ns_np = np.int32(scene.num_spheres + scene.num_planes)
    # prev − base: negative (never matches) for non-triangle prev shapes.
    tr_t, tr_k = triangle_nearest(
        scene, o, d, prev_tri=None if prev is None else prev - ns_np
    )
    use_tri = tr_t < t
    t = jnp.minimum(t, tr_t)
    mrow = ns_np + tr_k
    shape_idx = jnp.where(use_tri, mrow, shape_idx)
    tn = jnp.take(scene.tri_n, tr_k, axis=0)
    tri_n = Vec3(tn[..., 0], tn[..., 1], tn[..., 2])
    kind = jnp.where(use_tri, jnp.take(scene.mat_kind, mrow, axis=0), kind)
    exp = jnp.where(use_tri, jnp.take(scene.mat_exp, mrow, axis=0), exp)
    alb_tab = scene.mat_color * scene.mat_param[:, None]
    ta = jnp.take(alb_tab, mrow, axis=0)
    alb = vwhere(use_tri, Vec3(ta[..., 0], ta[..., 1], ta[..., 2]), alb)
    return t, shape_idx, kind, alb, exp, use_tri, tri_n


def intersect(scene: SceneArrays, o: Vec3, d: Vec3, prev=None) -> Hit:
    """Nearest hit of the wavefront (o, d) against every shape.

    ``prev`` (optional i32 lanes) is the full shape index each lane's ray
    ORIGINATES on — the previous bounce's hit (−1 for camera rays). The
    previous sphere's quadratic is evaluated with its exact ``c = 0``
    (:func:`sphere_t` ``on_self``) and the previous plane/triangle is
    excluded outright, eliminating the grazing-angle f32 self-re-hits the
    reference's f64 arithmetic never takes (shapes.rs:176-211)."""
    ns = scene.num_spheres
    npl = scene.num_planes
    batch = o.x.shape
    zeros = jnp.zeros(batch, jnp.float32)

    # Material table with the scalar weight folded into the color.
    alb = scene.mat_color * scene.mat_param[:, None]  # (N, 3)
    # (kind, exponent) packed into ONE f32: the 2-bit material kind rides
    # the exponent's low mantissa bits (≤ 2-ulp exponent perturbation —
    # invisible against Monte Carlo noise). One winner-select per shape
    # instead of two in the hottest loop of the program; decoded once
    # after the sweep.
    pe = jax.lax.bitcast_convert_type(
        (
            jax.lax.bitcast_convert_type(scene.mat_exp, jnp.uint32)
            & np.uint32(0xFFFFFFFC)
        )
        | scene.mat_kind.astype(jnp.uint32),
        jnp.float32,
    )

    # Unit directions take the a == 1 fast path (see quad_a/sphere_t);
    # non-unit scenes keep the reference's hoisted a = d·d (shapes.rs:178).
    a, inv_a = quad_a(scene, d)

    best_t = jnp.full(batch, _INF, jnp.float32)
    best_idx = jnp.zeros(batch, jnp.int32)
    best_pe = zeros  # packed (kind, exponent) — see ``pe`` above
    best_alb = Vec3(zeros, zeros, zeros)
    # Sphere-normal ingredients: center and invert/radius (0 for planes).
    best_ctr = Vec3(zeros, zeros, zeros)
    best_inv_r = zeros
    # Plane normal (authored, not derived from the hit point).
    best_pn = Vec3(zeros, zeros, zeros)

    def take(cond, i, pe_i, alb_i, ctr_i, inv_r_i, pn_i):
        nonlocal best_idx, best_pe, best_alb, best_ctr, best_inv_r, best_pn
        best_idx = jnp.where(cond, np.int32(i), best_idx)
        best_pe = jnp.where(cond, pe_i, best_pe)
        best_alb = vwhere(cond, alb_i, best_alb)
        best_ctr = vwhere(cond, ctr_i, best_ctr)
        best_inv_r = jnp.where(cond, inv_r_i, best_inv_r)
        best_pn = vwhere(cond, pn_i, best_pn)

    for i in range(ns):
        cx, cy, cz = (scene.sphere_center[i, k] for k in range(3))
        radius = scene.sphere_radius[i]
        inv_r = scene.sphere_invert[i] / radius
        t, valid = sphere_t(
            o, d, a, inv_a, cx, cy, cz, radius,
            on_self=None if prev is None else prev == np.int32(i),
        )
        cond = valid & (t < best_t)
        best_t = jnp.where(cond, t, best_t)
        take(
            cond,
            i,
            pe[i],
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
        if prev is not None:
            # A ray originating ON this plane can never re-hit it; any such
            # hit is the f32 noise root num ≈ 0 ± ulp (see sphere_t on_self).
            valid &= prev != np.int32(i)
        cond = valid & (t < best_t)
        best_t = jnp.where(cond, t, best_t)
        take(
            cond,
            i,
            pe[i],
            Vec3(alb[i, 0], alb[i, 1], alb[i, 2]),
            best_ctr,
            jnp.zeros((), jnp.float32),
            Vec3(nx, ny, nz),
        )

    # Unpack the winner's (kind, exponent).
    pe_u = jax.lax.bitcast_convert_type(best_pe, jnp.uint32)
    best_kind = (pe_u & np.uint32(3)).astype(jnp.int32)
    best_exp = jax.lax.bitcast_convert_type(
        pe_u & np.uint32(0xFFFFFFFC), jnp.float32
    )

    # Triangles (scene extension; compiled out of triangle-free scenes).
    best_t, best_idx, best_kind, best_alb, best_exp, use_tri, tri_n = (
        _fold_triangles(
            scene, o, d, best_t, best_idx, best_kind, best_alb, best_exp,
            prev=prev,
        )
    )

    mask = jnp.isfinite(best_t)
    t_safe = jnp.where(mask, best_t, 0.0)
    point = Vec3(o.x + t_safe * d.x, o.y + t_safe * d.y, o.z + t_safe * d.z)

    # Sphere normal (point - c) * invert / r; plane lanes have inv_r == 0 and
    # take the authored plane normal instead.
    n_sph = (point - best_ctr) * best_inv_r
    is_plane = best_inv_r == 0.0
    normal = vwhere(is_plane, best_pn, n_sph)
    if use_tri is not None:
        normal = vwhere(use_tri, tri_n, normal)

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


def _gather_hit(scene: SceneArrays, o: Vec3, d: Vec3, best_t, sph_idx, use_plane, pl_j, pl_n, prev=None) -> Hit:
    """Assemble the Hit record from a winning (sphere index | plane) pair by
    gathering the material table once — shared by the scan paths."""
    ns = scene.num_spheres
    shape_idx = jnp.where(use_plane, np.int32(ns) + pl_j, sph_idx)

    alb_tab = scene.mat_color * scene.mat_param[:, None]
    kind = jnp.take(scene.mat_kind, shape_idx, axis=0)
    exp = jnp.take(scene.mat_exp, shape_idx, axis=0)
    alb3 = jnp.take(alb_tab, shape_idx, axis=0)
    alb = Vec3(alb3[..., 0], alb3[..., 1], alb3[..., 2])

    # Triangles (scene extension; compiled out of triangle-free scenes).
    best_t, shape_idx, kind, alb, exp, use_tri, tri_n = _fold_triangles(
        scene, o, d, best_t, shape_idx, kind, alb, exp, prev=prev
    )

    mask = jnp.isfinite(best_t)
    if ns == 0:
        # Sphere-free scene: nothing to gather (every winner is a plane).
        ctr = jnp.zeros(sph_idx.shape + (3,), jnp.float32)
        inv_r = jnp.zeros(sph_idx.shape, jnp.float32)
    else:
        ctr = jnp.take(scene.sphere_center, sph_idx, axis=0)
        inv_r = jnp.take(scene.sphere_invert / scene.sphere_radius, sph_idx, axis=0)

    t_safe = jnp.where(mask, best_t, 0.0)
    point = Vec3(o.x + t_safe * d.x, o.y + t_safe * d.y, o.z + t_safe * d.z)
    n_sph = Vec3(
        (point.x - ctr[..., 0]) * inv_r,
        (point.y - ctr[..., 1]) * inv_r,
        (point.z - ctr[..., 2]) * inv_r,
    )
    normal = vwhere(use_plane, pl_n, n_sph)
    if use_tri is not None:
        normal = vwhere(use_tri, tri_n, normal)
    return Hit(
        mask=mask,
        t=best_t,
        shape=shape_idx,
        point=point,
        normal=normal,
        kind=kind,
        albedo=alb,
        exponent=exp,
    )


def _plane_sweep(scene: SceneArrays, o: Vec3, d: Vec3, prev=None, ns_base=None):
    """Linear plane sweep shared by the accelerated paths. ``prev`` excludes
    the plane the ray originates on (see :func:`intersect`). ``ns_base``
    overrides the plane shape-index base (= sphere count) when the caller's
    scene object carries dummy sphere arrays (the megakernel's scan mode
    keeps sphere data in a packed block table instead)."""
    batch = o.x.shape
    zeros = jnp.zeros(batch, jnp.float32)
    ns = scene.num_spheres if ns_base is None else ns_base
    pl_t = jnp.full(batch, _INF, jnp.float32)
    pl_j = jnp.zeros(batch, jnp.int32)
    pl_n = Vec3(zeros, zeros, zeros)
    for j in range(scene.num_planes):
        px, py, pz = (scene.plane_point[j, k] for k in range(3))
        nx, ny, nz = (scene.plane_normal[j, k] for k in range(3))
        num = (px - o.x) * nx + (py - o.y) * ny + (pz - o.z) * nz
        den = d.x * nx + d.y * ny + d.z * nz
        t = num / den
        cond = (t > _T_MIN) & (t < pl_t)
        if prev is not None:
            cond &= prev != np.int32(ns + j)
        pl_t = jnp.where(cond, t, pl_t)
        pl_j = jnp.where(cond, np.int32(j), pl_j)
        pl_n = vwhere(cond, Vec3(nx, ny, nz), pl_n)
    return pl_t, pl_j, pl_n


# Spheres per scan step: unrolled inside the step, so compile time is
# O(SCAN_BLOCK) regardless of scene size, while the scan carry round-trip
# (just best_t/best_i) is amortized over the whole block.
SCAN_BLOCK = 32


class ScanLayout(NamedTuple):
    """Spatially-sorted, SCAN_BLOCK-padded sphere layout shared by the XLA
    scans and the megakernel. Sorting spheres along a Morton curve groups
    spatial neighbors into the same block, making per-block AABBs tight —
    which is what lets the megakernel skip whole blocks per tile (the
    gather-free, Mosaic-friendly stand-in for a BVH). Pad entries have NaN
    centers (can never test valid) and original-index -1."""

    ctr: jnp.ndarray  # (n_blocks, SCAN_BLOCK, 3) f32
    rad: jnp.ndarray  # (n_blocks, SCAN_BLOCK) f32
    inv_r: jnp.ndarray  # (n_blocks, SCAN_BLOCK) f32  invert / radius
    kind: jnp.ndarray  # (n_blocks, SCAN_BLOCK) i32
    exp: jnp.ndarray  # (n_blocks, SCAN_BLOCK) f32
    alb: jnp.ndarray  # (n_blocks, SCAN_BLOCK, 3) f32
    idx: jnp.ndarray  # (n_blocks, SCAN_BLOCK) i32 original sphere index
    bmin: jnp.ndarray  # (n_blocks, 3) f32 per-block AABB
    bmax: jnp.ndarray  # (n_blocks, 3) f32

    @property
    def n_blocks(self) -> int:
        return self.ctr.shape[0]


def morton_order(centers: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) -> (N,) i32 permutation sorting points along a Morton curve
    (10 bits/axis). Traced: runs on-device inside jit, so the layout is a
    pure function of the scene arrays."""
    if centers.shape[0] == 0:
        return jnp.zeros((0,), jnp.int32)
    lo = jnp.min(centers, axis=0)
    hi = jnp.max(centers, axis=0)
    q = jnp.clip(
        (centers - lo) / jnp.maximum(hi - lo, 1e-12) * 1023.0, 0.0, 1023.0
    ).astype(jnp.uint32)

    def spread(x):  # space bits 3 apart (standard 3-D Morton spreading)
        x = (x | (x << 16)) & np.uint32(0x030000FF)
        x = (x | (x << 8)) & np.uint32(0x0300F00F)
        x = (x | (x << 4)) & np.uint32(0x030C30C3)
        x = (x | (x << 2)) & np.uint32(0x09249249)
        return x

    code = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    return jnp.argsort(code).astype(jnp.int32)


def scan_layout(scene: SceneArrays) -> ScanLayout:
    """Build the sorted/padded block layout (see :class:`ScanLayout`)."""
    ns = scene.num_spheres
    order = morton_order(scene.sphere_center)
    ctr = jnp.take(scene.sphere_center, order, axis=0)
    rad = jnp.take(scene.sphere_radius, order, axis=0)
    inv_r = jnp.take(scene.sphere_invert / scene.sphere_radius, order, axis=0)
    kind = jnp.take(scene.mat_kind[:ns], order, axis=0)
    exp = jnp.take(scene.mat_exp[:ns], order, axis=0)
    alb_tab = (scene.mat_color * scene.mat_param[:, None])[:ns]
    alb = jnp.take(alb_tab, order, axis=0)

    # At least THREE blocks. One (all-pad) block minimum keeps sphere-free
    # scenes valid (the megakernel needs non-empty refs; pad entries never
    # test valid). The floor is 3, not 1, because this environment's
    # XLA:CPU compiles the ≤2-block scan program pathologically slowly
    # (hour-plus, XLA's own "Very slow compile?" warning): a trip-count-1
    # lax.scan gets unrolled by the while-loop simplifier, the block fold
    # inlines into the surrounding render program, and the end gather's
    # now-huge operand graph sends a later pass superlinear. Keeping ≥3
    # blocks keeps the loop — an optimization barrier XLA's passes don't
    # look through — and NaN pad blocks are bit-exact no-ops by the same
    # discipline as ragged-tail padding (never valid, NaN AABBs skipped).
    n_blocks = max(3, -(-ns // SCAN_BLOCK))
    padn = n_blocks * SCAN_BLOCK - ns
    f32 = jnp.float32

    def pad(a, fill, tail=()):
        return jnp.concatenate([a, jnp.full((padn,) + tail, fill, a.dtype)])

    ctr = pad(ctr, np.nan, (3,)).reshape(n_blocks, SCAN_BLOCK, 3)
    radp = pad(rad, 1.0).reshape(n_blocks, SCAN_BLOCK)
    inv_rp = pad(inv_r, 1.0).reshape(n_blocks, SCAN_BLOCK)
    kindp = pad(kind, 0).reshape(n_blocks, SCAN_BLOCK)
    expp = pad(exp, 0.0).reshape(n_blocks, SCAN_BLOCK)
    albp = pad(alb, 0.0, (3,)).reshape(n_blocks, SCAN_BLOCK, 3)
    idxp = pad(order, -1).reshape(n_blocks, SCAN_BLOCK)

    real = (idxp >= 0)[..., None]  # (n_blocks, SCAN_BLOCK, 1)
    r3 = radp[..., None]
    bmin = jnp.min(jnp.where(real, ctr - r3, jnp.inf), axis=1).astype(f32)
    bmax = jnp.max(jnp.where(real, ctr + r3, -jnp.inf), axis=1).astype(f32)
    # An all-pad block must carry a NaN box, not +inf/-inf: inf slabs give
    # t0 = -inf <= t1 = +inf, which PASSES the slab test, while NaN
    # comparisons are false — so the skip actually fires for that block.
    empty = ~jnp.any(real, axis=1)  # (n_blocks, 1)
    bmin = jnp.where(empty, jnp.nan, bmin)
    bmax = jnp.where(empty, jnp.nan, bmax)
    return ScanLayout(
        ctr=ctr, rad=radp, inv_r=inv_rp, kind=kindp, exp=expp, alb=albp,
        idx=idxp, bmin=bmin, bmax=bmax,
    )


# Triangles per megakernel fold step. Must stay a multiple of 8 (Mosaic
# sublane-dim dynamic slices need 8-alignment); 16 keeps the per-block AABB
# skip fine-grained — a triangle test costs ~3x a sphere test, so blocks
# half the sphere SCAN_BLOCK pay for themselves sooner.
TRI_SCAN_BLOCK = 16


class TriLayout(NamedTuple):
    """Spatially-sorted, TRI_SCAN_BLOCK-padded triangle layout for the
    megakernel's in-kernel fold — the triangle sibling of :class:`ScanLayout`.
    Sorting triangles along a Morton curve over their centroids groups
    spatial neighbors into blocks with tight AABBs, so whole blocks are
    skipped per tile. Pad entries have NaN ``v0`` (Möller–Trumbore then
    rejects them arithmetically — see :func:`triangle_t`) and index -1."""

    v0: jnp.ndarray  # (n_blocks, TRI_SCAN_BLOCK, 3) f32
    e1: jnp.ndarray  # (n_blocks, TRI_SCAN_BLOCK, 3) f32
    e2: jnp.ndarray  # (n_blocks, TRI_SCAN_BLOCK, 3) f32
    n: jnp.ndarray  # (n_blocks, TRI_SCAN_BLOCK, 3) f32 unit geometric normal
    kind: jnp.ndarray  # (n_blocks, TRI_SCAN_BLOCK) i32
    exp: jnp.ndarray  # (n_blocks, TRI_SCAN_BLOCK) f32
    alb: jnp.ndarray  # (n_blocks, TRI_SCAN_BLOCK, 3) f32 color x param
    idx: jnp.ndarray  # (n_blocks, TRI_SCAN_BLOCK) i32 original triangle index
    bmin: jnp.ndarray  # (n_blocks, 3) f32 per-block AABB
    bmax: jnp.ndarray  # (n_blocks, 3) f32

    @property
    def n_blocks(self) -> int:
        return self.v0.shape[0]


def tri_layout(scene: SceneArrays) -> TriLayout:
    """Build the sorted/padded triangle block layout (see :class:`TriLayout`).

    Material rows are pre-gathered from the flat table exactly as the XLA
    fold gathers them (``_fold_triangles``: ``mat_color * mat_param`` rows at
    ``Ns+Np+k``), so the kernel's carried winner fields are bit-identical to
    the XLA path's gathered ones."""
    nt = scene.num_triangles
    base = scene.num_spheres + scene.num_planes
    centroid = scene.tri_v0 + (scene.tri_e1 + scene.tri_e2) * np.float32(1.0 / 3.0)
    order = morton_order(centroid)
    v0 = jnp.take(scene.tri_v0, order, axis=0)
    e1 = jnp.take(scene.tri_e1, order, axis=0)
    e2 = jnp.take(scene.tri_e2, order, axis=0)
    n = jnp.take(scene.tri_n, order, axis=0)
    kind = jnp.take(scene.mat_kind[base:], order, axis=0)
    exp = jnp.take(scene.mat_exp[base:], order, axis=0)
    alb_tab = (scene.mat_color * scene.mat_param[:, None])[base:]
    alb = jnp.take(alb_tab, order, axis=0)

    n_blocks = max(1, -(-nt // TRI_SCAN_BLOCK))
    padn = n_blocks * TRI_SCAN_BLOCK - nt

    def pad(a, fill, tail=()):
        return jnp.concatenate(
            [a, jnp.full((padn,) + tail, fill, a.dtype)]
        ).reshape((n_blocks, TRI_SCAN_BLOCK) + tail)

    v0p = pad(v0, np.nan, (3,))
    e1p = pad(e1, 0.0, (3,))
    e2p = pad(e2, 0.0, (3,))
    np_ = pad(n, 0.0, (3,))
    kindp = pad(kind, 0)
    expp = pad(exp, 0.0)
    albp = pad(alb, 0.0, (3,))
    idxp = pad(order, -1)

    real = (idxp >= 0)[..., None]  # (n_blocks, TRI_SCAN_BLOCK, 1)
    verts = jnp.stack([v0p, v0p + e1p, v0p + e2p], axis=2)  # (nb, TB, 3, 3)
    realv = real[..., None, :]
    lo = jnp.min(jnp.where(realv, verts, jnp.inf), axis=(1, 2)).astype(jnp.float32)
    hi = jnp.max(jnp.where(realv, verts, -jnp.inf), axis=(1, 2)).astype(jnp.float32)
    # All-pad blocks carry NaN boxes so the slab test FAILS for them (an
    # inf/-inf box passes; see scan_layout for the same rule).
    empty = ~jnp.any(real, axis=1)
    lo = jnp.where(empty, jnp.nan, lo)
    hi = jnp.where(empty, jnp.nan, hi)
    return TriLayout(
        v0=v0p, e1=e1p, e2=e2p, n=np_, kind=kindp, exp=expp, alb=albp,
        idx=idxp, bmin=lo, bmax=hi,
    )


def tri_carry_init(like):
    """Initial (t, index, kind, exp, albedo, normal) triangle-winner carry,
    derived from ``like`` (a lane-shaped f32, typically ``o.x``) so every
    field inherits its varying axes under shard_map."""
    zf = like * 0.0
    zi = zf.astype(jnp.int32)
    return (zf + _INF, zi, zi, zf, Vec3(zf, zf, zf), Vec3(zf, zf, zf))


def fold_tri_block(o, d, carry, v0, e1, e2, n3, kind, exp, alb, idx, prev_tri=None):
    """Fold one TRI_SCAN_BLOCK of triangles into the winner carry.
    ``v0``/``e1``/``e2``/``n3``/``alb`` are (TRI_SCAN_BLOCK, 3); the rest
    (TRI_SCAN_BLOCK,). ``idx`` is each entry's ORIGINAL triangle index (the
    layout is Morton-sorted), and equal-t ties keep the lowest original
    index — the same discipline as :func:`triangle_nearest`'s blocked form,
    so winners are identical in any visit order. ``prev_tri`` (triangle-
    relative index) excludes the triangle the ray originates on."""
    bt, bi, b_kind, b_exp, b_alb, b_n = carry
    for k in range(TRI_SCAN_BLOCK):
        t, valid = triangle_t(
            o, d,
            (v0[k, 0], v0[k, 1], v0[k, 2]),
            (e1[k, 0], e1[k, 1], e1[k, 2]),
            (e2[k, 0], e2[k, 1], e2[k, 2]),
        )
        cond = valid & ((t < bt) | ((t == bt) & (idx[k] < bi)))
        if prev_tri is not None:
            cond &= prev_tri != idx[k]
        bt = jnp.where(cond, t, bt)
        bi = jnp.where(cond, idx[k], bi)
        b_kind = jnp.where(cond, kind[k], b_kind)
        b_exp = jnp.where(cond, exp[k], b_exp)
        b_alb = vwhere(cond, Vec3(alb[k, 0], alb[k, 1], alb[k, 2]), b_alb)
        b_n = vwhere(cond, Vec3(n3[k, 0], n3[k, 1], n3[k, 2]), b_n)
    return (bt, bi, b_kind, b_exp, b_alb, b_n)


def fold_tri_occluded_block(o, d, occ, v0, e1, e2, t_max, exclude_idx, idx, base, origin_idx=None):
    """Fold one TRI_SCAN_BLOCK of triangles into an any-hit occlusion mask.
    ``base`` is the scene's triangle shape-index base (Ns+Np), so
    self-exclusion matches :func:`triangle_occluded` semantics;
    ``origin_idx`` additionally excludes the shadow ray's own origin
    triangle (flat shapes cannot self-occlude)."""
    for k in range(TRI_SCAN_BLOCK):
        t, valid = triangle_t(
            o, d,
            (v0[k, 0], v0[k, 1], v0[k, 2]),
            (e1[k, 0], e1[k, 1], e1[k, 2]),
            (e2[k, 0], e2[k, 1], e2[k, 2]),
        )
        blocks = valid & (t < t_max) & (exclude_idx != base + idx[k])
        if origin_idx is not None:
            blocks &= origin_idx != base + idx[k]
        occ = occ | blocks
    return occ


def merge_tri_hit(hit: Hit, o: Vec3, d: Vec3, tri_winner, base) -> Hit:
    """Merge a triangle-winner carry into a sphere/plane :class:`Hit` —
    the carried-fold twin of :func:`_fold_triangles` (ties keep the
    incumbent: spheres/planes come first in shape order). The hit point is
    recomputed from the combined t with the identical arithmetic, so
    non-triangle lanes keep their exact bits."""
    tr_t, tr_i, tr_kind, tr_exp, tr_alb, tr_n = tri_winner
    use_tri = tr_t < hit.t
    t = jnp.minimum(hit.t, tr_t)
    shape = jnp.where(use_tri, np.int32(base) + tr_i, hit.shape)
    kind = jnp.where(use_tri, tr_kind, hit.kind)
    exp = jnp.where(use_tri, tr_exp, hit.exponent)
    alb = vwhere(use_tri, tr_alb, hit.albedo)
    mask = jnp.isfinite(t)
    t_safe = jnp.where(mask, t, 0.0)
    point = Vec3(o.x + t_safe * d.x, o.y + t_safe * d.y, o.z + t_safe * d.z)
    normal = vwhere(use_tri, tr_n, hit.normal)
    return Hit(
        mask=mask, t=t, shape=shape, point=point, normal=normal,
        kind=kind, albedo=alb, exponent=exp,
    )


def intersect_scan(scene: SceneArrays, o: Vec3, d: Vec3, layout: "ScanLayout" = None, prev=None) -> Hit:
    """Nearest hit via a ``lax.scan`` over sphere blocks — the scaling form
    of the unrolled sweep.

    The unrolled sweep's XLA graph (and so its compile time) grows
    superlinearly with sphere count — unusable past ~150 spheres. This
    variant streams the sphere table through the same vectorized test in
    blocks of ``SCAN_BLOCK`` under ``lax.scan``: compile time is constant
    in scene size, the inner math is identical scalar-broadcast VPU work
    (no per-lane gathers — the trap the BVH traversal falls into on TPU),
    and the scan carry is only (best_t, best_index). Runtime stays O(N)
    per bounce, but at full VPU rate; on v5e this beats the gather-bound
    O(log N) BVH traversal for any N that fits a scene table in VMEM.
    """
    import jax

    a, inv_a = quad_a(scene, d)

    # Spatially-sorted, NaN-padded blocks (padding spheres can never test
    # valid — a huge finite center is NOT safe, the discriminant is a
    # catastrophic cancellation that can come out garbage-positive).
    # Callers that intersect repeatedly (every bounce + shadow ray) pass a
    # prebuilt layout so the sort+gathers happen once per render.
    L = layout if layout is not None else scan_layout(scene)

    def step(carry, blk):
        best_t, best_i = carry
        ctr, rad, idx = blk
        for k in range(SCAN_BLOCK):
            t, valid = sphere_t(
                o, d, a, inv_a, ctr[k, 0], ctr[k, 1], ctr[k, 2], rad[k],
                on_self=None if prev is None else prev == idx[k],
            )
            # Equal-t ties keep the lowest ORIGINAL index (common.rs:16-24)
            # regardless of the Morton visit order.
            cond = valid & ((t < best_t) | ((t == best_t) & (idx[k] < best_i)))
            best_t = jnp.where(cond, t, best_t)
            best_i = jnp.where(cond, idx[k], best_i)
        return (best_t, best_i), None

    # Initialize the carry from arithmetic on o.x so it inherits o's
    # varying axes under shard_map (a fresh constant would be replicated
    # and trip the scan carry type check).
    zf = o.x * 0.0
    t0 = zf + _INF
    i0 = zf.astype(jnp.int32)
    (best_t, best_i), _ = jax.lax.scan(step, (t0, i0), (L.ctr, L.rad, L.idx))

    pl_t, pl_j, pl_n = _plane_sweep(scene, o, d, prev=prev)
    use_plane = pl_t < best_t
    t = jnp.minimum(best_t, pl_t)
    return _gather_hit(scene, o, d, t, best_i, use_plane, pl_j, pl_n, prev=prev)


def intersect_scan_carry(scene: SceneArrays, o: Vec3, d: Vec3, layout: "ScanLayout" = None, prev=None) -> Hit:
    """Blocked-scan sweep that carries the winner's material record through
    the loop instead of gathering at the end — the in-kernel (Pallas) form.

    Inside the megakernel every carry lives in VMEM/registers, so carrying
    eleven winner fields costs nothing and avoids the dynamic gather that
    Mosaic lowers poorly; in the XLA path the opposite holds (scan carries
    round-trip HBM each step), which is why :func:`intersect_scan` carries
    only (t, index) there. Same math, same results, different memory system.
    """
    import jax

    a, inv_a = quad_a(scene, d)
    L = layout if layout is not None else scan_layout(scene)

    def step(carry, blk):
        ctr, rad, inv_r_b, kind, exp, alb, idx = blk
        return (
            fold_sphere_block(
                o, d, a, inv_a, carry, ctr, rad, inv_r_b, kind, exp, alb, idx,
                prev=prev,
            ),
            None,
        )

    xs = (L.ctr, L.rad, L.inv_r, L.kind, L.exp, L.alb, L.idx)
    carry, _ = jax.lax.scan(step, scan_carry_init(o.x), xs)
    return finish_scan_carry(scene, o, d, carry, prev=prev)


def scan_carry_init(like):
    """Initial (best_t, index, kind, exp, albedo, center, inv_r) carry.

    Built by arithmetic on ``like`` (a lane-shaped f32 array, typically
    ``o.x``) so every field inherits its varying axes under shard_map."""
    zf = like * 0.0
    zi = zf.astype(jnp.int32)
    return (
        zf + _INF,
        zi,
        zi,
        zf,
        Vec3(zf, zf, zf),
        Vec3(zf, zf, zf),
        zf,
    )


def fold_sphere_block(o, d, a, inv_a, carry, ctr, rad, inv_r_b, kind, exp, alb, idx, prev=None):
    """Fold one SCAN_BLOCK of spheres into the winner carry. ``ctr``/``alb``
    are (SCAN_BLOCK, 3); the rest (SCAN_BLOCK,). ``idx`` carries each
    entry's ORIGINAL sphere index (the block layout may be spatially
    sorted; see :func:`scan_layout`). Shared by the XLA scan and the
    in-kernel (Pallas) fori_loop, which feed it from array xs and ref
    slices respectively. ``prev`` is the self-exclusion lane (the sphere
    the ray originates on gets its exact ``c = 0``; see :func:`sphere_t`)."""
    best_t, best_i, b_kind, b_exp, b_alb, b_ctr, b_inv_r = carry
    for k in range(SCAN_BLOCK):
        cx, cy, cz = ctr[k, 0], ctr[k, 1], ctr[k, 2]
        t, valid = sphere_t(
            o, d, a, inv_a, cx, cy, cz, rad[k],
            on_self=None if prev is None else prev == idx[k],
        )
        # Strict improvement, with the documented equal-t tie rule (lowest
        # ORIGINAL shape index wins, common.rs:16-24) restored under the
        # Morton-sorted visit order.
        cond = valid & ((t < best_t) | ((t == best_t) & (idx[k] < best_i)))
        best_t = jnp.where(cond, t, best_t)
        best_i = jnp.where(cond, idx[k], best_i)
        b_kind = jnp.where(cond, kind[k], b_kind)
        b_exp = jnp.where(cond, exp[k], b_exp)
        b_alb = vwhere(cond, Vec3(alb[k, 0], alb[k, 1], alb[k, 2]), b_alb)
        b_ctr = vwhere(cond, Vec3(cx, cy, cz), b_ctr)
        b_inv_r = jnp.where(cond, inv_r_b[k], b_inv_r)
    return (best_t, best_i, b_kind, b_exp, b_alb, b_ctr, b_inv_r)


def finish_scan_carry(scene: SceneArrays, o: Vec3, d: Vec3, carry, prev=None, ns_base=None, mat_row0=None) -> Hit:
    """Fold the (unrolled) planes into a sphere winner carry and build the
    Hit. Plane material fields come from the table by *static* plane index,
    masked in the same way the unrolled sweep does.

    ``ns_base``/``mat_row0`` decouple the plane SHAPE-index base and the
    plane MATERIAL-row base from the scene's sphere arrays — the
    megakernel's scan mode passes dummy one-row sphere/material-sphere
    arrays (sphere data lives in its packed block table) while keeping
    the original shape numbering."""
    ns = scene.num_spheres if ns_base is None else ns_base
    row0 = ns if mat_row0 is None else mat_row0
    best_t, best_i, b_kind, b_exp, b_alb, b_ctr, b_inv_r = carry
    alb_tab = scene.mat_color * scene.mat_param[:, None]

    pl_t, pl_j, pl_n = _plane_sweep(scene, o, d, prev=prev, ns_base=ns)
    use_plane = pl_t < best_t
    t = jnp.minimum(best_t, pl_t)
    shape_idx = jnp.where(use_plane, np.int32(ns) + pl_j, best_i)
    for j in range(scene.num_planes):
        sel = use_plane & (pl_j == np.int32(j))
        i = row0 + j
        b_kind = jnp.where(sel, scene.mat_kind[i], b_kind)
        b_exp = jnp.where(sel, scene.mat_exp[i], b_exp)
        b_alb = vwhere(sel, Vec3(alb_tab[i, 0], alb_tab[i, 1], alb_tab[i, 2]), b_alb)
        b_inv_r = jnp.where(sel, 0.0, b_inv_r)

    # Triangles (scene extension; compiled out of triangle-free scenes —
    # including every in-kernel reconstruction, whose scenes carry none).
    t, shape_idx, b_kind, b_alb, b_exp, use_tri, tri_n = _fold_triangles(
        scene, o, d, t, shape_idx, b_kind, b_alb, b_exp, prev=prev
    )

    mask = jnp.isfinite(t)
    t_safe = jnp.where(mask, t, 0.0)
    point = Vec3(o.x + t_safe * d.x, o.y + t_safe * d.y, o.z + t_safe * d.z)
    n_sph = (point - b_ctr) * b_inv_r
    normal = vwhere(use_plane, pl_n, n_sph)
    if use_tri is not None:
        normal = vwhere(use_tri, tri_n, normal)
    return Hit(
        mask=mask,
        t=t,
        shape=shape_idx,
        point=point,
        normal=normal,
        kind=b_kind,
        albedo=b_alb,
        exponent=b_exp,
    )


def _plane_occluded(scene: SceneArrays, o: Vec3, d: Vec3, t_max, exclude_idx, occ, origin_idx=None, ns_base=None):
    """Fold the (unrolled) planes into an any-hit occlusion mask.
    ``origin_idx`` excludes the shadow ray's own origin plane (flat shapes
    cannot self-occlude; see :func:`triangle_occluded`); ``ns_base``
    overrides the plane shape-index base (see :func:`finish_scan_carry`)."""
    ns = scene.num_spheres if ns_base is None else ns_base
    for j in range(scene.num_planes):
        px, py, pz = (scene.plane_point[j, k] for k in range(3))
        nx, ny, nz = (scene.plane_normal[j, k] for k in range(3))
        num = (px - o.x) * nx + (py - o.y) * ny + (pz - o.z) * nz
        den = d.x * nx + d.y * ny + d.z * nz
        t = num / den
        blocks = (t > _T_MIN) & (t < t_max) & (exclude_idx != np.int32(ns + j))
        if origin_idx is not None:
            blocks &= origin_idx != np.int32(ns + j)
        occ = occ | blocks
    return occ


def fold_occluded_block(o, d, a, inv_a, occ, ctr, rad, t_max, exclude_idx, idx, origin_idx=None):
    """Fold one SCAN_BLOCK of spheres into an any-hit occlusion mask —
    the shadow-ray sibling of :func:`fold_sphere_block`, with no winner
    fold at all (an OR replaces ~11 selects per sphere). ``idx`` carries
    each entry's ORIGINAL sphere index (the block layout may be spatially
    sorted; see :func:`scan_layout`). ``origin_idx`` marks the sphere the
    shadow ray originates on, whose quadratic gets its exact ``c = 0``
    (see :func:`sphere_t` ``on_self``) — genuine self-occlusion through
    the interior still registers."""
    for k in range(SCAN_BLOCK):
        t, valid = sphere_t(
            o, d, a, inv_a, ctr[k, 0], ctr[k, 1], ctr[k, 2], rad[k],
            on_self=None if origin_idx is None else origin_idx == idx[k],
        )
        occ = occ | (valid & (t < t_max) & (exclude_idx != idx[k]))
    return occ


def occluded_sweep(scene: SceneArrays, o: Vec3, d: Vec3, t_max, exclude_idx, origin_idx=None):
    """Any-hit shadow test: does any shape OTHER than ``exclude_idx``
    intersect (o, d) at T_MIN < t < t_max?

    The shadow-ray primitive for next-event estimation: visibility only
    needs "any occluder before the light", so the nearest-hit winner fold
    (t/index/material selects per shape) collapses to one OR per shape —
    about a third less work per sphere than :func:`intersect`. Semantics
    match the nearest-hit formulation ``hit.shape == exclude_idx`` exactly
    up to floating-point ties (measure-zero for Monte Carlo estimates).

    ``origin_idx`` (optional i32 lanes) is the shape the shadow ray
    ORIGINATES on: its sphere quadratic is evaluated with the exact
    ``c = 0`` and its plane/triangle is excluded outright — the shadow-ray
    twin of the nearest-hit ``prev`` self-exclusion (grazing light angles
    otherwise read f32 self-hits as shadow acne).
    """
    a, inv_a = quad_a(scene, d)
    # Derived from o so the mask inherits o's varying axes under shard_map.
    occ = (o.x * 0.0) > 0.0
    for i in range(scene.num_spheres):
        cx, cy, cz = (scene.sphere_center[i, k] for k in range(3))
        t, valid = sphere_t(
            o, d, a, inv_a, cx, cy, cz, scene.sphere_radius[i],
            on_self=None if origin_idx is None else origin_idx == np.int32(i),
        )
        occ = occ | (valid & (t < t_max) & (exclude_idx != np.int32(i)))
    occ = _plane_occluded(scene, o, d, t_max, exclude_idx, occ, origin_idx=origin_idx)
    return triangle_occluded(scene, o, d, t_max, exclude_idx, occ, origin_idx=origin_idx)


def occluded_scan(scene: SceneArrays, o: Vec3, d: Vec3, t_max, exclude_idx, layout: "ScanLayout" = None, origin_idx=None):
    """Any-hit shadow test via a ``lax.scan`` over sphere blocks — the
    scaling form of :func:`occluded_sweep` (compile time constant in scene
    size; carry is a single bool mask)."""
    import jax

    a, inv_a = quad_a(scene, d)
    L = layout if layout is not None else scan_layout(scene)

    def step(occ, blk):
        ctr, rad, idx = blk
        return (
            fold_occluded_block(
                o, d, a, inv_a, occ, ctr, rad, t_max, exclude_idx, idx,
                origin_idx=origin_idx,
            ),
            None,
        )

    occ0 = (o.x * 0.0) > 0.0
    occ, _ = jax.lax.scan(step, occ0, (L.ctr, L.rad, L.idx))
    occ = _plane_occluded(scene, o, d, t_max, exclude_idx, occ, origin_idx=origin_idx)
    return triangle_occluded(scene, o, d, t_max, exclude_idx, occ, origin_idx=origin_idx)


@dataclass(frozen=True)
class Intersector:
    """The chosen intersection strategy, carried as ONE pytree.

    Built once at Renderer construction; everything downstream — the
    render block, the bounce step, the sharded renderer — just calls it as
    ``isect(scene, o, d)``. ``mode`` is static pytree metadata (a retrace
    key for jit). The Pallas megakernel substitutes its own ref-slicing
    closure of the same shape instead (ops/pallas_kernel.py).
    """

    layout: Optional[ScanLayout] = None  # prebuilt scan blocks (scan modes)
    mode: str = "sweep"  # 'sweep' | 'scan' | 'scan_carry'

    def __call__(self, scene: SceneArrays, o: Vec3, d: Vec3, prev=None) -> Hit:
        if self.mode == "scan":
            return intersect_scan(scene, o, d, layout=self.layout, prev=prev)
        if self.mode == "scan_carry":
            return intersect_scan_carry(scene, o, d, layout=self.layout, prev=prev)
        if self.mode != "sweep":
            raise ValueError(f"unknown intersection mode {self.mode!r}")
        return intersect(scene, o, d, prev=prev)

    def occluded(self, scene: SceneArrays, o: Vec3, d: Vec3, t_max, exclude_idx, origin_idx=None):
        """Any-hit shadow test (see :func:`occluded_sweep`): True where some
        shape other than ``exclude_idx`` blocks (o, d) before ``t_max``.
        Callers (ops/shade.py) always pass the light's own ray-t."""
        if self.mode in ("scan", "scan_carry"):
            return occluded_scan(
                scene, o, d, t_max, exclude_idx, layout=self.layout,
                origin_idx=origin_idx,
            )
        return occluded_sweep(scene, o, d, t_max, exclude_idx, origin_idx=origin_idx)





jax.tree_util.register_dataclass(
    Intersector, data_fields=["layout"], meta_fields=["mode"]
)
