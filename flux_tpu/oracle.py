"""Float64 oracle renderer — the precision escape hatch (pure NumPy).

The production path is f32 end-to-end, the right TPU trade (PERFORMANCE.md):
statistical parity with the reference's own f64 output is pinned by
tests/test_reference_parity.py. What round 1 lacked was an escape hatch for
the residual risk — "deep scenes / extreme exponents have no f64 check if a
precision cliff ever appears". This module is that hatch: an independent
float64 implementation of the exact same semantics, runnable on any scene,
so a suspected f32 cliff can be audited directly instead of argued about.

Design constraints, in order:

1. **Bitwise-identical sample streams.** All sampler hashing is uint32
   counter arithmetic (flux_tpu/samplers/hash.py); NumPy reproduces it bit
   for bit, so every (pixel, sample, depth, purpose) draws the SAME uniform
   here as on the TPU — any output difference is *arithmetic precision*,
   never a different Monte Carlo estimate. (Pinned by
   tests/test_oracle.py::test_sampler_streams_bit_identical.)
2. **f64 everywhere downstream**, the reference's precision
   (fluxcore/src/common.rs:26-30): camera basis and rays, the sphere
   quadratic in the reference's full a/inv_a form (shapes.rs:176-211),
   plane intersection (shapes.rs:136-151), BRDF frames/warps/flip
   (brdf.rs:22-71), transport semantics (scene.rs:162-172,
   materials.rs:24-70), tone map (color.rs:35-44, trace.rs:85-87).
3. **Obviously equivalent, not fast.** The implementation mirrors the f32
   modules function by function so equivalence is reviewable line by line;
   it is vectorized NumPy (a small frame renders in seconds) but makes no
   other performance concession.

Scope: the full estimator surface — sweep intersection over spheres +
planes + triangles, all four materials, reference and ``physical``
transport, AND (``nee=True``) the next-event-estimation arms: power-
proportional light picking, cone sampling with partial-cone horizon
clipping, triangle uniform-area sampling, the shadow-ray any-hit sweep,
and the MIS balance-heuristic weights of physical mode — mirroring
ops/nee.py + the NEE/MIS arms of ops/shade.py function for function.
Two deliberate estimator-definition carry-overs (NOT precision
concessions): the clipped-arc half-angle uses the same Abramowitz–Stegun
polynomial arccos + 1e-4 pad as production (the sampled arc and its
density must match SAMPLE FOR SAMPLE; the polynomial is part of the
estimator's definition, and any ≥-true-arc choice is unbiased), and
triangle-light shadow rays stop at t·(1−1e-4) (the multi-triangle
shared-edge exclusion rule, ops/shade.py).

Usage::

    from flux_tpu.oracle import oracle_render, precision_audit
    img64 = oracle_render(scene_data, sample_root=8, max_depth=5, seed=0)
    report = precision_audit(scene_data, sample_root=8, max_depth=5, seed=0)

``tools/f64_audit.py`` wraps this as a CLI.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from .constants import (
    SALT_AA,
    SALT_BOUNCE,
    SALT_LENS,
    SALT_NEE,
    SALT_NEEPICK,
    T_MIN,
)
from .scene import MaterialKind, PlaneData, SceneData, SphereData, TriangleData

__all__ = ["oracle_render", "precision_audit"]

# ---------------------------------------------------------------------------
# uint32 counter hashing — bit-identical to flux_tpu/samplers/hash.py.
# ---------------------------------------------------------------------------


def _u32(x):
    return np.asarray(x, np.uint32)


def _mix(x):
    """murmur3-style avalanche finalizer (hash.py:35-43)."""
    with np.errstate(over="ignore"):
        x = _u32(x)
        x = x ^ (x >> np.uint32(16))
        x = x * np.uint32(0x7FEB352D)
        x = x ^ (x >> np.uint32(15))
        x = x * np.uint32(0x846CA68B)
        x = x ^ (x >> np.uint32(16))
    return x


def _hash_combine(*vals):
    """hash.py:46-55."""
    acc = _u32(0x9E3779B9)
    with np.errstate(over="ignore"):
        for v in vals:
            acc = _mix(
                acc
                ^ (
                    _u32(v)
                    + np.uint32(0x9E3779B9)
                    + (acc << np.uint32(6))
                    + (acc >> np.uint32(2))
                )
            )
    return acc


def _randfloat(i, p):
    """hash.py:58-79 — top 24 bits of one avalanche round, scaled to [0,1).

    The f32 path computes ``float32(int32(i >> 8)) * float32(2^-24)``; both
    factors and the product are exactly representable in f64, so this f64
    value IS the f32 value — the streams agree bitwise."""
    v = _mix(_u32(i) ^ _u32(p))
    return (v >> np.uint32(8)).astype(np.float64) * (1.0 / (1 << 24))


def _permute_pow2(i, l: int, p):
    """Kensler permutation network (hash.py:89-119), bit for bit."""
    assert l & (l - 1) == 0 and l > 0
    w = np.uint32(l - 1)
    with np.errstate(over="ignore"):
        i = _u32(i)
        p = _u32(p)
        i = i ^ p
        i = i * np.uint32(0xE170893D)
        i = i ^ (p >> np.uint32(16))
        i = i ^ ((i & w) >> np.uint32(4))
        i = i ^ (p >> np.uint32(8))
        i = i * np.uint32(0x0929EB3F)
        i = i ^ (p >> np.uint32(23))
        i = i ^ ((i & w) >> np.uint32(1))
        i = i * (np.uint32(1) | (p >> np.uint32(27)))
        i = i * np.uint32(0x6935FA69)
        i = i ^ ((i & w) >> np.uint32(11))
        i = i * np.uint32(0x74DCCA23)
        i = i ^ (p >> np.uint32(2))
        i = i * np.uint32(0x9E501CC3)
        i = i ^ ((i & w) >> np.uint32(2))
        i = i * np.uint32(0xC860A3DF)
        i = i & w
        i = i ^ (i >> np.uint32(5))
        return (i + p) & w


# Pattern salts (patterns.py:38-41).
_SALT_JX = 0x16A3D5C7
_SALT_JY = 0x2C9F1B4F
_SALT_PX = 0x51633E2D
_SALT_PY = 0x68BC21EB


def _jittered_point(s, root: int, pattern):
    """patterns.py:63-71, divisions in f64."""
    s = _u32(s)
    i = (s % np.uint32(root)).astype(np.float64)
    j = (s // np.uint32(root)).astype(np.float64)
    jx = _randfloat(s, _hash_combine(pattern, _SALT_JX))
    jy = _randfloat(s, _hash_combine(pattern, _SALT_JY))
    return (i + jx) / root, (j + jy) / root


def _multi_jitter(s, root: int, pattern, correlated: bool):
    """patterns.py:74-99, divisions in f64."""
    s = _u32(s)
    i = s % np.uint32(root)
    j = s // np.uint32(root)
    if root > 0 and (root & (root - 1)) == 0:
        if correlated:
            px = _hash_combine(pattern, _SALT_PX)
            py = _hash_combine(pattern, _SALT_PY)
        else:
            px = _hash_combine(pattern, _SALT_PX, i)
            py = _hash_combine(pattern, _SALT_PY, j)
        fine_x = _permute_pow2(j, root, px).astype(np.float64)
        fine_y = _permute_pow2(i, root, py).astype(np.float64)
    else:
        fine_x = j.astype(np.float64)
        fine_y = (np.uint32(root - 1) - i).astype(np.float64)
    jx = _randfloat(s, _hash_combine(pattern, _SALT_JX))
    jy = _randfloat(s, _hash_combine(pattern, _SALT_JY))
    x = (i.astype(np.float64) + (fine_x + jx) / root) / root
    y = (j.astype(np.float64) + (fine_y + jy) / root) / root
    return x, y


def _cmj_point(s, root, pattern):
    return _multi_jitter(s, root, pattern, correlated=True)


def _bounce_point(s, root, pattern, depth):
    """patterns.py bounce_point: MJ at depth 1, jittered beyond."""
    if depth <= 1:
        return _multi_jitter(s, root, pattern, correlated=False)
    return _jittered_point(s, root, pattern)


# ---------------------------------------------------------------------------
# f64 geometry/warp helpers, mirroring vec.py / samplers/warps.py.
# ---------------------------------------------------------------------------


class _V(NamedTuple):
    x: np.ndarray
    y: np.ndarray
    z: np.ndarray

    def __add__(self, o):
        return _V(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o):
        return _V(self.x - o.x, self.y - o.y, self.z - o.z)

    def __mul__(self, s):
        return _V(self.x * s, self.y * s, self.z * s)

    __rmul__ = __mul__

    def had(self, o):
        return _V(self.x * o.x, self.y * o.y, self.z * o.z)


def _dot(a, b):
    return a.x * b.x + a.y * b.y + a.z * b.z


def _cross(a, b):
    return _V(
        a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x
    )


def _normalize(a):
    # IEEE semantics like the f32 path (dead lanes normalize zero vectors;
    # their inf/nan results are masked out downstream, never observed).
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / np.sqrt(_dot(a, a))
        return _V(a.x * inv, a.y * inv, a.z * inv)


def _vwhere(m, a, b):
    return _V(np.where(m, a.x, b.x), np.where(m, a.y, b.y), np.where(m, a.z, b.z))


def _reflect(d, n):
    k = 2.0 * _dot(n, d)
    return _V(d.x - k * n.x, d.y - k * n.y, d.z - k * n.z)


def _frame_about(w, eps):
    """vec.py frame_about: c = normalize(eps × w), c2 = c × w."""
    c = _normalize(_cross(eps, w))
    return c, _cross(c, w)


def _to_unit_hemi(x, y, e):
    """warps.py to_unit_hemi in f64 (the transcendental form — the f32
    path's sin-from-cos rewrite is an identity in exact arithmetic)."""
    phi = 2.0 * np.pi * x
    cos_phi, sin_phi = np.cos(phi), np.sin(phi)
    cos_theta = np.maximum(1.0 - y, 0.0) ** (1.0 / (e + 1.0))
    sin_theta = np.sqrt(np.maximum(1.0 - cos_theta * cos_theta, 0.0))
    return sin_theta * cos_phi, sin_theta * sin_phi, cos_theta


def _to_poisson_disc(x, y):
    """warps.py to_poisson_disc (Shirley–Chiu concentric map) in f64."""
    spx = 2.0 * x - 1.0
    spy = 2.0 * y - 1.0

    def safe_div(a, b):
        return a / np.where(b == 0.0, 1.0, b)

    c1 = spx > -spy
    c2 = spx > spy
    c3 = spx < spy
    r = np.where(c1, np.where(c2, spx, spy), np.where(c3, -spx, -spy))
    phi = np.where(
        c1,
        np.where(c2, safe_div(spy, spx), 2.0 - safe_div(spx, spy)),
        np.where(
            c3,
            4.0 + safe_div(spy, spx),
            np.where(spy != 0.0, 6.0 - safe_div(spx, spy), 0.0),
        ),
    )
    phi = phi * (np.pi / 4.0)
    return r * np.cos(phi), r * np.sin(phi)


# Frame-epsilon vectors (brdf.rs:23,57 via ops/brdf.py:48-49). The f64
# oracle keeps the exact decimal literals; the f32 path rounds them — that
# gap is ordinary arithmetic drift, but the LITERALS themselves must never
# desynchronize (the cone frame is part of the estimator's definition), so
# they are pinned against ops/brdf at import.
_EM = (0.0034, 1.0, 0.0071)
_EG = (0.00424, 1.0, 0.00764)


def _pin_frame_eps():
    from .ops import brdf as _brdf

    assert tuple(np.float32(x) for x in _EM) == tuple(_brdf._EM)
    assert tuple(np.float32(x) for x in _EG) == tuple(_brdf._EG)


_pin_frame_eps()


# ---------------------------------------------------------------------------
# The renderer.
# ---------------------------------------------------------------------------


class _Scene(NamedTuple):
    """f64 SoA scene (compile_scene analog, flux_tpu/scene.py:361-390)."""

    ctr: np.ndarray  # (Ns, 3)
    rad: np.ndarray  # (Ns,)
    inv: np.ndarray  # (Ns,)  ±1
    ppt: np.ndarray  # (Np, 3)
    pnm: np.ndarray  # (Np, 3)
    tv0: np.ndarray  # (Nt, 3)
    te1: np.ndarray  # (Nt, 3)  v1 - v0
    te2: np.ndarray  # (Nt, 3)  v2 - v0
    tnm: np.ndarray  # (Nt, 3)  unit winding normal
    kind: np.ndarray  # (Ns+Np+Nt,) int32
    alb: np.ndarray  # (Ns+Np+Nt, 3)  color × param
    exp: np.ndarray  # (Ns+Np+Nt,)
    bg: np.ndarray  # (3,)


def _compile(sd: SceneData) -> _Scene:
    sph = [s for s in sd.shapes if isinstance(s, SphereData)]
    pln = [p for p in sd.shapes if isinstance(p, PlaneData)]
    tri = [t for t in sd.shapes if isinstance(t, TriangleData)]
    mats = (
        [s.material for s in sph]
        + [p.material for p in pln]
        + [t.material for t in tri]
    )
    f64 = lambda v, shape: np.asarray(v, np.float64).reshape(shape)
    n, m, q = len(sph), len(pln), len(tri)
    v0 = f64([t.v0 for t in tri], (q, 3))
    e1 = f64([t.v1 for t in tri], (q, 3)) - v0
    e2 = f64([t.v2 for t in tri], (q, 3)) - v0
    tn = np.cross(e1, e2)
    tn = tn / np.maximum(np.linalg.norm(tn, axis=1, keepdims=True), 1e-300)
    return _Scene(
        ctr=f64([s.center for s in sph], (n, 3)),
        rad=f64([s.radius for s in sph], (n,)),
        inv=f64([-1.0 if s.invert else 1.0 for s in sph], (n,)),
        ppt=f64([p.point for p in pln], (m, 3)),
        pnm=f64([p.normal for p in pln], (m, 3)),
        tv0=v0,
        te1=e1,
        te2=e2,
        tnm=tn,
        kind=np.asarray([mt.kind for mt in mats], np.int32),
        alb=f64([mt.color for mt in mats], (n + m + q, 3))
        * f64([mt.param for mt in mats], (n + m + q,))[:, None],
        exp=f64([mt.exponent for mt in mats], (n + m + q,)),
        bg=f64(sd.background, (3,)),
    )


def _intersect(sc: _Scene, o: _V, d: _V, margin=None, alive=None):
    """Nearest-hit sweep in f64 — the reference's full quadratic with the
    hoisted a = d·d (shapes.rs:176-211; ops/intersect.py:61-101 keeps this
    form for non-unit scenes, drops a ≡ 1 for unit ones — an identity this
    oracle's full form audits).

    ``margin`` (optional, mutated in place, per-lane f64): running minimum
    RELATIVE margin of every path-determining branch this sweep evaluates
    — the borderline-flip certification signal (see oracle_render
    ``branch_margins``). Tracked branches: nearest-competition |t − best|
    between viable hits, the tangency boundary |disc|, and the T_MIN
    acceptance boundary — each normalized by its operand scale, and only
    where the losing branch would actually change the path (``alive``
    lanes, viable-t windows)."""
    B = o.x.shape
    a = _dot(d, d)
    inv_a = 1.0 / a
    best_t = np.full(B, np.inf)
    best_i = np.zeros(B, np.int32)

    def note(m):
        if margin is not None:
            np.minimum(margin, np.where(alive, m, np.inf), out=margin)

    for i in range(sc.ctr.shape[0]):
        oc = _V(o.x - sc.ctr[i, 0], o.y - sc.ctr[i, 1], o.z - sc.ctr[i, 2])
        b_half = _dot(oc, d)
        c = _dot(oc, oc) - sc.rad[i] * sc.rad[i]
        disc = b_half * b_half - a * c
        e = np.sqrt(np.maximum(disc, 0.0))
        t_near = (-b_half - e) * inv_a
        t = np.where(t_near > T_MIN, t_near, (-b_half + e) * inv_a)
        valid = (disc >= 0.0) & (t > T_MIN)
        cond = valid & (t < best_t)
        if margin is not None:
            with np.errstate(invalid="ignore", divide="ignore"):
                # Tangency: |disc| vs its operand scale, counted only where
                # a grazing hit would actually take the lead (t at the
                # tangency point inside the viable window).
                t_tan = -b_half * inv_a
                disc_rel = np.abs(disc) / np.maximum(
                    np.maximum(b_half * b_half, np.abs(a * c)), 1e-300
                )
                note(np.where((t_tan > T_MIN) & (t_tan < best_t),
                              disc_rel, np.inf))
                # Nearest competition: |t − best| where this sphere is a
                # genuine competitor (valid), vs the winning distance scale.
                note(np.where(valid & np.isfinite(best_t),
                              np.abs(t - best_t) / np.maximum(best_t, T_MIN),
                              np.inf))
                # T_MIN acceptance of either root (near-root fallback and
                # final validity both hinge on it).
                for tr in (t_near, t):
                    note(np.where(disc >= 0.0,
                                  np.abs(tr - T_MIN) / max(T_MIN, 1e-300),
                                  np.inf))
        best_t = np.where(cond, t, best_t)
        best_i = np.where(cond, np.int32(i), best_i)
    ns = sc.ctr.shape[0]
    for j in range(sc.ppt.shape[0]):
        nx, ny, nz = sc.pnm[j]
        num = (
            (sc.ppt[j, 0] - o.x) * nx
            + (sc.ppt[j, 1] - o.y) * ny
            + (sc.ppt[j, 2] - o.z) * nz
        )
        with np.errstate(divide="ignore", invalid="ignore"):
            t = num / (d.x * nx + d.y * ny + d.z * nz)
            if margin is not None:
                note(np.where(np.isfinite(t) & (t > T_MIN) & np.isfinite(best_t),
                              np.abs(t - best_t) / np.maximum(best_t, T_MIN),
                              np.inf))
                note(np.where(np.isfinite(t),
                              np.abs(t - T_MIN) / T_MIN, np.inf))
        cond = (t > T_MIN) & (t < best_t)
        best_t = np.where(cond, t, best_t)
        best_i = np.where(cond, np.int32(ns + j), best_i)

    # Triangles: Möller–Trumbore in f64, double-sided, NaN-rejection on the
    # degenerate determinant — semantics of ops/intersect.triangle_t, merge
    # rule of _fold_triangles (ties keep spheres/planes; among triangles the
    # lowest index, i.e. first strict improvement in visit order).
    npl = sc.ppt.shape[0]
    for k in range(sc.tv0.shape[0]):
        e1, e2, v0 = sc.te1[k], sc.te2[k], sc.tv0[k]
        px = d.y * e2[2] - d.z * e2[1]
        py = d.z * e2[0] - d.x * e2[2]
        pz = d.x * e2[1] - d.y * e2[0]
        det = e1[0] * px + e1[1] * py + e1[2] * pz
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / det
            sx, sy, sz = o.x - v0[0], o.y - v0[1], o.z - v0[2]
            u = (sx * px + sy * py + sz * pz) * inv
            qx = sy * e1[2] - sz * e1[1]
            qy = sz * e1[0] - sx * e1[2]
            qz = sx * e1[1] - sy * e1[0]
            v = (d.x * qx + d.y * qy + d.z * qz) * inv
            t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv
        valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > T_MIN)
        if margin is not None:
            with np.errstate(invalid="ignore"):
                viable = np.isfinite(t) & (t > T_MIN) & (t < best_t)
                # Barycentric edge margins (u, v, 1−u−v vs 0) decide the
                # hit; count them where the triangle would take the lead.
                for edge in (u, v, 1.0 - u - v):
                    note(np.where(viable, np.abs(edge), np.inf))
                note(np.where(valid & np.isfinite(best_t),
                              np.abs(t - best_t) / np.maximum(best_t, T_MIN),
                              np.inf))
        cond = valid & (t < best_t)
        best_t = np.where(cond, t, best_t)
        best_i = np.where(cond, np.int32(ns + npl + k), best_i)

    mask = np.isfinite(best_t)
    t_safe = np.where(mask, best_t, 0.0)
    point = _V(o.x + t_safe * d.x, o.y + t_safe * d.y, o.z + t_safe * d.z)
    is_plane = (best_i >= ns) & (best_i < ns + npl)
    is_tri = best_i >= ns + npl
    si = np.where(is_plane | is_tri, 0, best_i)
    # Sphere normal (point − c)·invert/r; plane/triangle lanes take the
    # authored one.
    if ns:
        ctr = _V(*(sc.ctr[si, k] for k in range(3)))
        inv_r = sc.inv[si] / sc.rad[si]
        n_sph = (point - ctr) * inv_r
    else:
        n_sph = _V(t_safe * 0.0, t_safe * 0.0, t_safe * 0.0)
    pj = np.where(is_plane, best_i - ns, 0)
    n_pl = _V(*(sc.pnm[pj, k] for k in range(3))) if npl else n_sph
    normal = _vwhere(is_plane, n_pl, n_sph)
    if sc.tv0.shape[0]:
        tk = np.where(is_tri, best_i - ns - npl, 0)
        n_tr = _V(*(sc.tnm[tk, k] for k in range(3)))
        normal = _vwhere(is_tri, n_tr, normal)
    return mask, best_i, point, normal, best_t


def _sample_directions(kind, exponent, normal, d, sx, sy, physical,
                       margin=None, margin_mask=None):
    """ops/brdf.py sample_directions in f64. ``margin``/``margin_mask``
    record the glossy below-horizon flip's branch margin |n·(tang+axial)|
    (a path-determining discontinuity in wi) for the certification."""
    r = _reflect(d, normal)
    is_glossy = kind == MaterialKind.GLOSSY
    is_perfect = kind == MaterialKind.REFLECTIVE
    e = np.where(is_glossy, exponent, 1.0 if physical else 0.0)
    hx, hy, hz = _to_unit_hemi(sx, sy, e)
    w = _vwhere(is_glossy, r, normal)
    sh = np.broadcast_to(0.0 * w.x, w.x.shape)
    eps = _vwhere(
        is_glossy,
        _V(sh + _EG[0], sh + _EG[1], sh + _EG[2]),
        _V(sh + _EM[0], sh + _EM[1], sh + _EM[2]),
    )
    c, c2 = _frame_about(w, eps)
    f1 = _vwhere(is_glossy, c, c2)
    f2 = _vwhere(is_glossy, c2, c)
    tang = _V(
        hx * f1.x + hy * f2.x, hx * f1.y + hy * f2.y, hx * f1.z + hy * f2.z
    )
    axial = w * hz
    horizon = _dot(normal, tang + axial)
    below = (horizon < 0.0) & is_glossy
    if margin is not None:
        np.minimum(
            margin,
            np.where(margin_mask & is_glossy, np.abs(horizon), np.inf),
            out=margin,
        )
    wi = tang * np.where(below, -1.0, 1.0) + axial
    return _vwhere(is_perfect, r, wi)


# ---------------------------------------------------------------------------
# NEE / MIS in f64 — mirroring ops/nee.py + the NEE arms of ops/shade.py.
# ---------------------------------------------------------------------------


class _Lights(NamedTuple):
    """f64 light set (ops/nee.py LightArrays analog)."""

    kinds: tuple  # 'sphere' | 'tri' per light
    ctr: np.ndarray  # (L, 3) sphere center / tri centroid
    rad: np.ndarray  # (L,)
    emit: np.ndarray  # (L, 3) color × power
    sidx: np.ndarray  # (L,) int32 full shape index
    pick: np.ndarray  # (L,)
    cdf: np.ndarray  # (L,) exclusive prefix sum
    tv0: np.ndarray  # (L, 3)
    te1: np.ndarray  # (L, 3)
    te2: np.ndarray  # (L, 3)
    tn: np.ndarray  # (L, 3)
    area: np.ndarray  # (L,)


def _extract_lights(sd: SceneData):
    """ops/nee.py extract_lights in f64 (None when the scene has no NEE
    lights). Selection weights use the same luminance · area/(4π) rule;
    pick-boundary flips vs the f32 table are measure-zero per sample."""
    recs = []
    n_sph = sum(isinstance(s, SphereData) for s in sd.shapes)
    n_pln = sum(isinstance(s, PlaneData) for s in sd.shapes)
    si = ti = 0
    z3 = np.zeros(3)
    for s in sd.shapes:
        if isinstance(s, SphereData):
            m = s.material
            if m.kind == MaterialKind.EMISSIVE and not s.invert:
                emit = np.asarray(m.color, np.float64) * m.param
                recs.append(("sphere", np.asarray(s.center, np.float64),
                             float(s.radius), emit, si, z3, z3, z3, z3, 0.0,
                             float(s.radius) ** 2))
            si += 1
        elif isinstance(s, TriangleData):
            m = s.material
            if m.kind == MaterialKind.EMISSIVE:
                emit = np.asarray(m.color, np.float64) * m.param
                v0 = np.asarray(s.v0, np.float64)
                e1 = np.asarray(s.v1, np.float64) - v0
                e2 = np.asarray(s.v2, np.float64) - v0
                cr = np.cross(e1, e2)
                area = 0.5 * float(np.linalg.norm(cr))
                nrm = cr / max(np.linalg.norm(cr), 1e-300)
                ctr = v0 + (e1 + e2) / 3.0
                recs.append(("tri", ctr, 0.0, emit, n_sph + n_pln + ti,
                             v0, e1, e2, nrm, area, area / (4.0 * np.pi)))
            ti += 1
    if not recs:
        return None
    n = len(recs)
    emits = np.asarray([r[3] for r in recs], np.float64).reshape(n, 3)
    lum = 0.2126 * emits[:, 0] + 0.7152 * emits[:, 1] + 0.0722 * emits[:, 2]
    w = lum * np.asarray([r[10] for r in recs], np.float64)
    total = float(w.sum())
    pick = w / total if total > 0 else np.full(n, 1.0 / n)
    cdf = np.concatenate([[0.0], np.cumsum(pick)[:-1]])
    arr = lambda k: np.asarray([r[k] for r in recs], np.float64).reshape(
        (n, 3) if np.ndim(recs[0][k]) else (n,)
    )
    return _Lights(
        kinds=tuple(r[0] for r in recs),
        ctr=arr(1), rad=arr(2), emit=emits,
        sidx=np.asarray([r[4] for r in recs], np.int32),
        pick=pick, cdf=cdf,
        tv0=arr(5), te1=arr(6), te2=arr(7), tn=arr(8), area=arr(9),
    )


def _acos_conservative(x):
    """ops/nee.py _acos_conservative in f64: the SAME Abramowitz–Stegun
    4.4.45 polynomial + 1e-4 pad, NOT true arccos — the sampled arc and its
    density are defined by this formula (any ⊇-true-arc choice is unbiased),
    so the oracle must draw from the identical arc, sample for sample."""
    ax = np.abs(x)
    poly = 1.5707288 + ax * (-0.2121144 + ax * (0.0742610 + ax * -0.0187293))
    a = np.sqrt(np.maximum(1.0 - ax, 0.0)) * poly
    a = np.where(x < 0.0, np.pi - a, a)
    return np.clip(a + 1e-4, 0.0, np.pi)


def _sample_light_dirs(lt: _Lights, p: _V, ux, uy, upick, normal=None):
    """ops/nee.py sample_light_dirs in f64. Returns (d, weight_scalar·emit,
    sidx, pdf, center, radius, tri_t, tri_mask)."""
    shape = np.broadcast_shapes(ux.shape, p.x.shape)
    li = np.zeros(shape, np.int32)
    for k in range(1, len(lt.kinds)):
        li = np.where(upick >= lt.cdf[k], np.int32(k), li)
    cx, cy, cz = (lt.ctr[li, c] for c in range(3))
    rad = lt.rad[li]
    pk = lt.pick[li]
    sidx = lt.sidx[li]
    emit = _V(*(lt.emit[li, c] for c in range(3)))

    dc = _V(cx - p.x, cy - p.y, cz - p.z)
    dist2 = _dot(dc, dc)
    dist = np.sqrt(dist2)
    inside = dist2 <= rad * rad
    sin2_max = np.clip(rad * rad / np.maximum(dist2, 1e-12), 0.0, 1.0)
    cos_max = np.sqrt(np.maximum(1.0 - sin2_max, 0.0))
    w = dc * (1.0 / np.maximum(dist, 1e-12))
    cos_a = 1.0 - ux * (1.0 - cos_max)
    sin_a = np.sqrt(np.maximum(1.0 - cos_a * cos_a, 0.0))
    sh = np.zeros(shape)
    u, v = _frame_about(w, _V(sh + _EM[0], sh + _EM[1], sh + _EM[2]))

    arc_frac = None
    if normal is None:
        phi = 2.0 * np.pi * uy
        cp, sp = np.cos(phi), np.sin(phi)
    else:
        # Partial-cone horizon clipping (reference mode), the exact
        # construction of ops/nee.py:331-364.
        n_u = _dot(normal, u)
        n_v = _dot(normal, v)
        n_w = _dot(normal, w)
        rho = np.sqrt(n_u * n_u + n_v * n_v)
        with np.errstate(divide="ignore", invalid="ignore"):
            c = -(cos_a * n_w) / np.maximum(sin_a * rho, 1e-12)
        phi_lim = _acos_conservative(np.clip(c, -1.0, 1.0))
        arc_frac = phi_lim * (1.0 / np.pi)
        safe = rho > 1e-6
        inv_rho = 1.0 / np.maximum(rho, 1e-12)
        c0 = np.where(safe, n_u * inv_rho, 1.0)
        s0 = np.where(safe, n_v * inv_rho, 0.0)
        delta = (2.0 * uy - 1.0) * phi_lim
        cd, sd_ = np.cos(delta), np.sin(delta)
        cp = c0 * cd - s0 * sd_
        sp = s0 * cd + c0 * sd_

    d = _V(
        sin_a * (cp * u.x + sp * v.x) + cos_a * w.x,
        sin_a * (cp * u.y + sp * v.y) + cos_a * w.y,
        sin_a * (cp * u.z + sp * v.z) + cos_a * w.z,
    )
    wgt = 2.0 * np.pi * (1.0 - cos_max) / np.maximum(pk, 1e-12)
    wgt = np.where(inside, 0.0, wgt)
    if arc_frac is not None:
        wgt = wgt * arc_frac

    tri_t = tri_mask = None
    cos_l = None
    if "tri" in lt.kinds:
        is_tri = np.asarray([k == "tri" for k in lt.kinds])
        tri_mask = is_tri[li]
        uu = np.broadcast_to(ux, shape).copy()
        vv = np.broadcast_to(uy, shape).copy()
        flip = uu + vv > 1.0
        uu = np.where(flip, 1.0 - uu, uu)
        vv = np.where(flip, 1.0 - vv, vv)
        q = _V(*(lt.tv0[li, c] + uu * lt.te1[li, c] + vv * lt.te2[li, c]
                 for c in range(3)))
        dv = q - p
        r2 = np.maximum(_dot(dv, dv), 1e-12)
        r = np.sqrt(r2)
        td = dv * (1.0 / r)
        tn = _V(*(lt.tn[li, c] for c in range(3)))
        cos_l = -_dot(tn, td)
        area = lt.area[li]
        wgt_tri = area * np.maximum(cos_l, 0.0) / (np.maximum(pk, 1e-12) * r2)
        d = _vwhere(tri_mask, td, d)
        wgt = np.where(tri_mask, wgt_tri, wgt)
        tri_t = r
    pdf = 1.0 / np.maximum(wgt, 1e-20)
    if cos_l is not None:
        pdf_tri = np.where(
            cos_l > 0.0,
            pk * r2 / np.maximum(lt.area[li] * cos_l, 1e-12),
            0.0,
        )
        pdf = np.where(tri_mask, pdf_tri, pdf)
    return d, emit, wgt, sidx, pdf, _V(cx, cy, cz), rad, tri_t, tri_mask


def _light_emission(lt: _Lights, shape_idx):
    m = np.zeros(shape_idx.shape, bool)
    for k in range(len(lt.kinds)):
        m |= shape_idx == lt.sidx[k]
    return m


def _nee_pdf_toward(lt: _Lights, p: _V, shape_idx, d: _V, t, normal=None):
    """ops/nee.py nee_pdf_toward in f64 (the MIS reverse density; with
    ``normal`` — the previous vertex's stored normal — the PARTIAL-CONE
    clipped density, the exact reverse of the clipped sampler)."""
    pdf = np.zeros(shape_idx.shape)
    for k, kind in enumerate(lt.kinds):
        sel = shape_idx == lt.sidx[k]
        if kind == "tri":
            cos_l = -(lt.tn[k, 0] * d.x + lt.tn[k, 1] * d.y + lt.tn[k, 2] * d.z)
            pdf_k = lt.pick[k] * t * t / np.maximum(lt.area[k] * cos_l, 1e-12)
            pdf_k = np.where(cos_l > 0.0, pdf_k, 0.0)
        else:
            dc = _V(lt.ctr[k, 0] - p.x, lt.ctr[k, 1] - p.y, lt.ctr[k, 2] - p.z)
            dist2 = _dot(dc, dc)
            r = lt.rad[k]
            sin2 = np.clip(r * r / np.maximum(dist2, 1e-12), 0.0, 1.0)
            cos_max = np.sqrt(np.maximum(1.0 - sin2, 0.0))
            omega = 2.0 * np.pi * (1.0 - cos_max)
            pdf_k = lt.pick[k] / np.maximum(omega, 1e-20)
            if normal is not None:
                dist = np.sqrt(np.maximum(dist2, 1e-12))
                w = dc * (1.0 / dist)
                sh = np.zeros(np.broadcast_shapes(p.x.shape))
                u, v = _frame_about(
                    w, _V(sh + _EM[0], sh + _EM[1], sh + _EM[2])
                )
                cos_a = _dot(w, d)
                sin_a = np.sqrt(np.maximum(1.0 - cos_a * cos_a, 0.0))
                n_u = _dot(normal, u)
                n_v = _dot(normal, v)
                n_w = _dot(normal, w)
                rho = np.sqrt(n_u * n_u + n_v * n_v)
                with np.errstate(divide="ignore", invalid="ignore"):
                    c = -(cos_a * n_w) / np.maximum(sin_a * rho, 1e-12)
                phi_lim = _acos_conservative(np.clip(c, -1.0, 1.0))
                pdf_k = pdf_k * np.pi / np.maximum(phi_lim, 1e-9)
            pdf_k = np.where(dist2 <= r * r, 0.0, pdf_k)
        pdf = np.where(sel, pdf_k, pdf)
    return pdf


def _occluded(sc: _Scene, o: _V, d: _V, t_max, exclude_idx):
    """Any-hit shadow sweep in f64 (ops/intersect.occluded_sweep analog).

    No origin-shape exclusion needed: the production path's exact
    ``on_self``/origin exclusion exists to kill f32 noise roots above
    T_MIN; in f64 the same noise sits at ~1e-16 « T_MIN, so the plain
    sweep is semantically identical."""
    a = _dot(d, d)
    occ = np.zeros(o.x.shape, bool)
    for i in range(sc.ctr.shape[0]):
        oc = _V(o.x - sc.ctr[i, 0], o.y - sc.ctr[i, 1], o.z - sc.ctr[i, 2])
        b_half = _dot(oc, d)
        c = _dot(oc, oc) - sc.rad[i] * sc.rad[i]
        disc = b_half * b_half - a * c
        e = np.sqrt(np.maximum(disc, 0.0))
        t_near = (-b_half - e) / a
        t = np.where(t_near > T_MIN, t_near, (-b_half + e) / a)
        valid = (disc >= 0.0) & (t > T_MIN)
        occ |= valid & (t < t_max) & (exclude_idx != np.int32(i))
    ns = sc.ctr.shape[0]
    for j in range(sc.ppt.shape[0]):
        nx, ny, nz = sc.pnm[j]
        num = ((sc.ppt[j, 0] - o.x) * nx + (sc.ppt[j, 1] - o.y) * ny
               + (sc.ppt[j, 2] - o.z) * nz)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = num / (d.x * nx + d.y * ny + d.z * nz)
        occ |= (t > T_MIN) & (t < t_max) & (exclude_idx != np.int32(ns + j))
    npl = sc.ppt.shape[0]
    for k in range(sc.tv0.shape[0]):
        e1, e2, v0 = sc.te1[k], sc.te2[k], sc.tv0[k]
        px = d.y * e2[2] - d.z * e2[1]
        py = d.z * e2[0] - d.x * e2[2]
        pz = d.x * e2[1] - d.y * e2[0]
        det = e1[0] * px + e1[1] * py + e1[2] * pz
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / det
            sx, sy, sz = o.x - v0[0], o.y - v0[1], o.z - v0[2]
            u = (sx * px + sy * py + sz * pz) * inv
            qx = sy * e1[2] - sz * e1[1]
            qy = sz * e1[0] - sx * e1[2]
            qz = sx * e1[1] - sy * e1[0]
            v = (d.x * qx + d.y * qy + d.z * qz) * inv
            t = (e2[0] * qx + e2[1] * qy + e2[2] * qz) * inv
        valid = (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > T_MIN)
        occ |= valid & (t < t_max) & (exclude_idx != np.int32(ns + npl + k))
    return occ


# Triangle-light shadow shrink: the exact f32 constant production folds
# (ops/shade.py — multi-triangle shared-edge exclusion), as f64.
_TRI_SHRINK = float(np.float32(1.0 - 1e-4))


def oracle_render(
    sd: SceneData,
    sample_root: int,
    max_depth: int,
    seed: int = 0,
    physical: bool = False,
    rows_per_band: int = 8,
    nee: bool = False,
    raw_samples: bool = False,
    branch_margins: bool = False,
) -> np.ndarray:
    """Render the scene's frame entirely in float64. Returns (H, W, 3) f64.

    Semantics mirror Renderer(backend='xla', accel='sweep') sample for
    sample — including, with ``nee=True``, the NEE estimator (reference
    transport: hard split + partial-cone horizon clipping) and, with
    ``nee=True, physical=True``, the MIS balance-heuristic estimator.
    See the module docstring for the mirrored pieces.

    ``raw_samples=True`` returns the PER-SAMPLE radiance (spp, H, W, 3)
    before averaging and tone mapping — the probe the borderline-flip
    certification uses (tests/test_scan_parity.py): cross-backend parity flips
    are per-sample whole-path events, only visible pre-average.

    ``branch_margins=True`` (implies per-sample output) returns
    ``(radiance, margins)`` where ``margins`` is (spp, H, W) f64: each
    sample's MINIMUM relative branch margin over every path-determining
    comparison its f64 walk evaluated (nearest-hit competition, tangency,
    T_MIN acceptance, barycentric edges, emissive facing, glossy
    below-horizon flip). A sample whose two f32 backends disagree is a
    GENUINE borderline flip iff its f64 margin is at f32-rounding scale;
    an estimator bug produces disagreements at margins orders of
    magnitude above that — the discriminator behind the principled
    cross-backend parity gate.
    """
    sc = _compile(sd)
    lights = _extract_lights(sd) if nee else None
    W = sd.output_settings.image_width
    H = sd.output_settings.image_height
    root = int(sample_root)
    seed = np.uint32(int(seed) & 0xFFFFFFFF)

    # Camera constants in f64 (camera.py:71-85; basis per scene.rs:22-35).
    s, cdta = sd.camera_settings, sd.camera_data
    eye = np.asarray(s.eye, np.float64)
    w_ax = eye - np.asarray(s.look_at, np.float64)
    w_ax /= np.linalg.norm(w_ax)
    u_ax = np.cross(np.asarray(s.up, np.float64), w_ax)
    u_ax /= np.linalg.norm(u_ax)
    v_ax = np.cross(w_ax, u_ax)
    vp_factor = cdta.focal_distance / cdta.view_plane_distance
    adj_ps = sd.output_settings.pixel_size / cdta.zoom_factor

    spp = root * root
    raw_samples = raw_samples or branch_margins
    out = (
        np.zeros((spp, H, W, 3), np.float64)
        if raw_samples
        else np.zeros((H, W, 3), np.float64)
    )
    margins_out = np.full((spp, H, W), np.inf) if branch_margins else None
    s_idx = np.arange(spp, dtype=np.uint32)[:, None, None]
    for row0 in range(0, H, rows_per_band):
        n_rows = min(rows_per_band, H - row0)
        row = np.arange(row0, row0 + n_rows, dtype=np.uint32)[None, :, None]
        col = np.arange(W, dtype=np.uint32)[None, None, :]
        pixel_base = _hash_combine(seed, row, col)

        ax, ay = _cmj_point(s_idx, root, _hash_combine(pixel_base, SALT_AA))
        ux, uy = _cmj_point(s_idx, root, _hash_combine(pixel_base, SALT_LENS))
        lx, ly = _to_poisson_disc(ux, uy)

        # Primary rays (camera.py:88-125, incl. the img_h − row flip).
        px = adj_ps * (col.astype(np.float64) - W * 0.5 + ax)
        py = adj_ps * ((H - row.astype(np.float64)) - H * 0.5 + ay)
        lpx = lx * cdta.lens_radius
        lpy = ly * cdta.lens_radius
        dx = px * vp_factor - lpx
        dy = py * vp_factor - lpy
        d = _normalize(
            _V(
                dx * u_ax[0] + dy * v_ax[0] - cdta.focal_distance * w_ax[0],
                dx * u_ax[1] + dy * v_ax[1] - cdta.focal_distance * w_ax[1],
                dx * u_ax[2] + dy * v_ax[2] - cdta.focal_distance * w_ax[2],
            )
        )
        shape = (spp, n_rows, W)
        o = _V(
            np.broadcast_to(eye[0] + lpx * u_ax[0] + lpy * v_ax[0], shape).copy(),
            np.broadcast_to(eye[1] + lpx * u_ax[1] + lpy * v_ax[1], shape).copy(),
            np.broadcast_to(eye[2] + lpx * u_ax[2] + lpy * v_ax[2], shape).copy(),
        )
        d = _V(*(np.broadcast_to(c, shape).copy() for c in d))

        tput = _V(np.ones(shape), np.ones(shape), np.ones(shape))
        radx = np.zeros(shape)
        rady = np.zeros(shape)
        radz = np.zeros(shape)
        alive = np.ones(shape, bool)
        suppress = np.zeros(shape, bool)
        prev_pdf = np.zeros(shape)
        # MIS only: previous vertex's normal for the clipped reverse light
        # density (never consulted while prev_pdf == 0).
        prev_n = _V(*(np.zeros(shape) for _ in range(3)))
        band_margin = np.full(shape, np.inf) if branch_margins else None

        for depth in range(1, max_depth + 1):
            # One bounce (ops/shade.py:54-303, NEE/MIS arms included).
            pat = _hash_combine(pixel_base, SALT_BOUNCE, np.uint32(depth))
            sx, sy = _bounce_point(s_idx, root, pat, depth)
            sx = np.broadcast_to(sx, shape)
            sy = np.broadcast_to(sy, shape)

            mask, sidx, point, normal, hit_t = _intersect(
                sc, o, d, margin=band_margin, alive=alive
            )
            if sc.kind.size:
                kind = sc.kind[sidx]
                albv = _V(*(sc.alb[sidx, k] for k in range(3)))
                expo = sc.exp[sidx]
            else:  # shapeless scene: every lane misses to the background
                kind = np.full(shape, -1, np.int32)
                albv = _V(*(np.zeros(shape) for _ in range(3)))
                expo = np.zeros(shape)

            miss = alive & ~mask
            is_em = kind == MaterialKind.EMISSIVE
            facing = _dot(normal, d)
            emit = alive & mask & is_em & (facing < 0.0)
            scatter = alive & mask & ~is_em
            if band_margin is not None:
                # Emissive facing: (−n)·d crossing 0 keeps/drops the full
                # emission — a path-determining branch.
                np.minimum(
                    band_margin,
                    np.where(alive & mask & is_em, np.abs(facing), np.inf),
                    out=band_margin,
                )

            emit_w = None
            if lights is not None and physical:
                # MIS emission weight (ops/shade.py:93-106): a BSDF hit of
                # an NEE light carries pdf_b/(pdf_b + pdf_nee).
                is_l = _light_emission(lights, sidx)
                pdf_nee_prev = _nee_pdf_toward(
                    lights, o, sidx, d, np.where(mask, hit_t, 0.0),
                    normal=prev_n,
                )
                w_b = prev_pdf / np.maximum(prev_pdf + pdf_nee_prev, 1e-20)
                emit_w = np.where(
                    emit, np.where(is_l & (prev_pdf > 0.0), w_b, 1.0), 0.0
                )
            elif lights is not None:
                # Reference transport: hard split (ops/shade.py:107-112).
                emit &= ~(suppress & _light_emission(lights, sidx))

            radx += np.where(miss, tput.x * sc.bg[0], 0.0)
            rady += np.where(miss, tput.y * sc.bg[1], 0.0)
            radz += np.where(miss, tput.z * sc.bg[2], 0.0)
            if emit_w is not None:
                radx += tput.x * albv.x * emit_w
                rady += tput.y * albv.y * emit_w
                radz += tput.z * albv.z * emit_w
            else:
                radx += np.where(emit, tput.x * albv.x, 0.0)
                rady += np.where(emit, tput.y * albv.y, 0.0)
                radz += np.where(emit, tput.z * albv.z, 0.0)

            diffuse = scatter & (kind == MaterialKind.MATTE)
            glossy = scatter & (kind == MaterialKind.GLOSSY)
            mirror = _reflect(d, normal)

            def glossy_lobe(wd):
                """(phong, pdf, dup) of the glossy strategy at wd
                (ops/shade.py:143-159)."""
                rw = np.maximum(_dot(mirror, wd), 0.0)
                phong = rw ** expo
                flipped = _V(
                    2.0 * rw * mirror.x - wd.x,
                    2.0 * rw * mirror.y - wd.y,
                    2.0 * rw * mirror.z - wd.z,
                )
                dup = np.where(_dot(normal, flipped) < 0.0, 1.0, 0.0)
                pdf = (expo + 1.0) * (0.5 / np.pi) * phong * (1.0 + dup)
                return phong, pdf, dup

            if lights is not None:
                # NEE direct-light arm (ops/shade.py:161-262).
                npat = _hash_combine(pixel_base, SALT_NEE, np.uint32(depth))
                nux, nuy = _bounce_point(s_idx, root, npat, depth)
                nux = np.broadcast_to(nux, shape)
                nuy = np.broadcast_to(nuy, shape)
                upick = np.broadcast_to(_randfloat(
                    s_idx, _hash_combine(pixel_base, SALT_NEEPICK, np.uint32(depth))
                ), shape)
                ldir, lemit, lwgt, lidx, pdf_nee, lctr, lrad, tri_t, tri_mask = (
                    _sample_light_dirs(
                        lights, point, nux, nuy, upick, normal=normal,
                    )
                )
                cos_s = _dot(normal, ldir)
                # Light's own ray-t (f64 quadratic; tri rows carry theirs).
                a_sh = _dot(ldir, ldir)
                oc = point - lctr
                b_half = _dot(oc, ldir)
                cq = _dot(oc, oc) - lrad * lrad
                disc = b_half * b_half - a_sh * cq
                e_ = np.sqrt(np.maximum(disc, 0.0))
                t_near = (-b_half - e_) / a_sh
                t_l = np.where(t_near > T_MIN, t_near, (-b_half + e_) / a_sh)
                l_valid = (disc >= 0.0) & (t_l > T_MIN)
                if tri_mask is not None:
                    t_l = np.where(tri_mask, tri_t, t_l)
                    l_valid = np.where(tri_mask, tri_t > T_MIN, l_valid)
                    t_sh = np.where(tri_mask, t_l * _TRI_SHRINK, t_l)
                else:
                    t_sh = t_l
                lit = l_valid & ~_occluded(sc, point, ldir, t_sh, lidx)
                nee_active = depth < max_depth
                lit &= (cos_s > 0.0) & nee_active
                if physical:
                    phong_l, pdf_g, _ = glossy_lobe(ldir)
                    pdf_b = np.where(glossy, pdf_g, cos_s * (1.0 / np.pi))
                    f_fac = np.where(
                        glossy, (expo + 2.0) * (0.5 / np.pi) * phong_l,
                        1.0 / np.pi,
                    )
                    w_nee = pdf_nee / np.maximum(pdf_nee + pdf_b, 1e-20)
                    fac = f_fac * cos_s * w_nee
                    lit &= diffuse | glossy
                else:
                    fac = 1.0 / (2.0 * np.pi)
                    lit &= diffuse
                cw = lwgt * fac
                radx += np.where(lit, tput.x * albv.x * lemit.x * cw, 0.0)
                rady += np.where(lit, tput.y * albv.y * lemit.y * cw, 0.0)
                radz += np.where(lit, tput.z * albv.z * lemit.z * cw, 0.0)
                suppress = diffuse

            wi = _sample_directions(
                kind, expo, normal, d, sx, sy, physical,
                margin=band_margin, margin_mask=scatter,
            )
            new_tput = tput.had(albv)
            if physical:
                # Physical glossy walk weight (ops/shade.py:270-290).
                phong_i, pdf_gi, dup_i = glossy_lobe(wi)
                cos_i = np.maximum(_dot(normal, wi), 0.0)
                fac = np.where(
                    kind == MaterialKind.GLOSSY,
                    (expo + 2.0) / (expo + 1.0) * cos_i / (1.0 + dup_i),
                    1.0,
                )
                new_tput = new_tput * fac
                if lights is not None:
                    prev_pdf = np.where(
                        glossy, pdf_gi,
                        np.where(diffuse, cos_i * (1.0 / np.pi), 0.0),
                    )
                    prev_n = _vwhere(scatter, normal, prev_n)
            tput = _vwhere(scatter, new_tput, tput)
            o = _vwhere(scatter, point, o)
            d = _vwhere(scatter, wi, d)
            alive = scatter

        if raw_samples:
            out[:, row0 : row0 + n_rows] = np.stack([radx, rady, radz], axis=-1)
            if branch_margins:
                margins_out[:, row0 : row0 + n_rows] = band_margin
            continue
        acc = np.stack(
            [radx.sum(axis=0), rady.sum(axis=0), radz.sum(axis=0)], axis=-1
        )
        img = acc / spp
        m = img.max(axis=-1, keepdims=True)
        with np.errstate(divide="ignore"):  # m == 0 rows select the 1.0 arm
            out[row0 : row0 + n_rows] = img * np.where(m > 1.0, 1.0 / m, 1.0)
    if branch_margins:
        return out, margins_out
    return out


def precision_audit(
    sd: SceneData,
    sample_root: int,
    max_depth: int,
    seed: int = 0,
    physical: bool = False,
    renderer=None,
    nee: bool = False,
) -> dict:
    """Render with the f32 production path AND the f64 oracle; report stats.

    The sample streams are bit-identical, so the difference field measures
    pure arithmetic-precision drift — plus the (measure-zero per pixel, but
    visible at low spp) samples whose branch decisions flip near f32
    comparison boundaries. Healthy scenes sit at MC-noise level; a genuine
    f32 precision cliff shows up as a large, spatially-structured error.
    ``nee=True`` audits the NEE estimator (and with ``physical`` the MIS
    weights) instead of the plain walk.
    """
    from .render import Renderer

    r = renderer or Renderer(
        sd, sample_root, max_depth, seed=seed, physical=physical, accel="sweep",
        backend="xla", nee=nee,
    )
    img32 = r.render_image().astype(np.float64)
    img64 = oracle_render(
        sd, sample_root, max_depth, seed=seed, physical=physical, nee=nee
    )
    diff = np.abs(img32 - img64)
    return {
        "mean_abs_diff": float(diff.mean()),
        "p99_abs_diff": float(np.quantile(diff, 0.99)),
        "max_abs_diff": float(diff.max()),
        "f64_mean": float(img64.mean()),
        "f32_mean": float(img32.mean()),
    }
