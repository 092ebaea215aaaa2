"""Next-event estimation: direct sampling of area lights with shadow rays.

The reference finds its lights purely by random walk — no next-event
estimation, no Russian roulette (SURVEY.md §2 #7: materials.rs has neither;
paths just stumble into emissive spheres). That is why its README headline
scene needs 16384 spp: the small emissive sphere (scenes/demo2.yml:40-47)
is a tiny solid angle from most surfaces. NEE is the classic production
answer, added here as an *opt-in* (``Renderer(nee=True)`` / ``--nee``): at
every diffuse vertex, additionally sample one area light directly through a
shadow ray, and suppress that light's emission on the next bounce so each
transport path is counted exactly once.

Estimator (one light ℓ picked with probability p_ℓ ∝ luminance·power·r²
— power-proportional selection, so unequal light sets don't waste samples
on dim lights — cone-sampled over the light's subtended solid angle
Ω = 2π(1 − cosθ_max)):

    L_direct = kd·cd · Ω/(2π) · V · L_e / p_ℓ

This matches the REFERENCE's matte transport rather than textbook
Lambertian: the reference draws uniform-hemisphere bounce directions
(e=0.0 hemisphere tables, fluxcore/src/sampling.rs:25-27) but weights with
a cosine pdf (brdf.rs:27-29), so its estimator integrates incident light
*without* cosine foreshortening. flux_tpu's BSDF walk reproduces that
exactly (pinned by the demo-image parity runs), and NEE must estimate the
same integral or the two estimators would converge to different images.

In the reference-compatible transport, specular and glossy vertices keep
pure BSDF sampling (the reference's glossy estimator has no meaningful pdf
to balance), and the inverted environment sphere is excluded from the light
set (BSDF sampling already finds it constantly — it subtends the entire
sphere). Both estimators converge to the same image; tests/test_nee.py pins
that and the variance reduction. One knowing approximation: a light cone
straddling the horizon is accepted or rejected whole (by the cosθ > 0 test)
instead of clipped.

Under ``--physical`` the combination upgrades from the hard split to
multiple importance sampling (balance heuristic): the NEE term carries
w = pdf_nee/(pdf_nee + pdf_bsdf) and a BSDF hit of an NEE light carries the
complement, using the sampling pdf carried in ``PathState.prev_pdf``
(see ops/shade.py). Physical mode also runs NEE at GLOSSY vertices, with
the normalized-Phong BRDF f = ks·cs·(e+2)/(2π)·(r·w)^e against the
flip-corrected cos^e lobe pdf — the fix for fireflies from strong small
lights seen off glossy lobes (tests/test_physical.py::TestGlossyMIS).
Perfect mirrors stay pure BSDF (delta lobe).

MIS mode uses the PARTIAL-CONE (horizon-clipped) sphere-light density on
BOTH sides of the balance heuristic (round 5): the NEE vertex samples the
clipped arc, and the emission side evaluates the same clipped density via
the PREVIOUS vertex's stored normal (``PathState.prev_normal``) — a single
consistent density, so Σw = 1 and the estimator stays unbiased. Every
walk direction leaving a vertex lies above that vertex's horizon (cosine
and flip-corrected Phong lobes have no below-horizon support), and the
conservatively-over-covering arc contains the whole above-horizon ring
region, so the clipped density is well-defined (non-zero) for every
direction the BSDF walk can hit a light along. Measured single-vertex
variance of the MIS direct-light term vs whole-cone sampling: 1.0× with
the light overhead, 2.25× lower at light_y=0.5, 3.8× at 0.2, 4.5–4.7×
at/below the horizon (NOTES.md round-5 entry) — the gap the round-4
whole-cone compromise left on the table.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..scene import MaterialKind, PlaneData, SceneData, SphereData, TriangleData
from ..vec import Vec3, dot, frame_about
from ..vec import where as vwhere

__all__ = ["LightArrays", "LightSample", "extract_lights", "sample_light_dirs", "light_emission", "nee_pdf_toward"]

_TWO_PI = np.float32(2.0 * np.pi)
_HALF_PI = np.float32(np.pi / 2.0)


def _acos_conservative(x):
    """arccos(x) + a hair, in [0, π] — NEVER below the true value.

    Mosaic TPU has no acos lowering, so the clipped-arc construction uses
    the Abramowitz–Stegun 4.4.45 polynomial (|err| ≤ 6.8e-5 rad) plus a
    1e-4 pad. Over-covering is the safe direction for an arc that must
    contain every above-horizon azimuth: sampling a slightly wider arc
    with the matching density stays unbiased (the sliver below the horizon
    is masked to zero by the caller), while an under-covering arc would
    silently drop visible light."""
    x = jnp.asarray(x, jnp.float32)
    ax = jnp.abs(x)
    poly = (
        np.float32(1.5707288)
        + ax
        * (
            np.float32(-0.2121144)
            + ax * (np.float32(0.0742610) + ax * np.float32(-0.0187293))
        )
    )
    a = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * poly  # arccos(|x|)
    a = jnp.where(x < 0.0, np.float32(np.pi) - a, a)
    return jnp.clip(a + np.float32(1e-4), 0.0, np.float32(np.pi))


def _cone_frame(w):
    """The cone-sampling frame about axis ``w`` — seeded by the SAME matte
    epsilon vector as the BRDF warps (ops/brdf.py ``_EM``). One seed, one
    construction: the sampler, the MIS reverse density, and the f64 oracle
    must all build bit-identical frames, or the two sides of the balance
    weight desynchronize and Σw = 1 breaks."""
    from .brdf import _EM

    return frame_about(
        w, Vec3(jnp.float32(_EM[0]), jnp.float32(_EM[1]), jnp.float32(_EM[2]))
    )


def _ring_decompose(normal, u, v, w):
    """(n_u, n_v, n_w, ρ): the surface normal in the cone frame (u, v, w),
    with ρ = |(n_u, n_v)| the in-plane magnitude — the one decomposition
    both the sampler's arc draw and the reverse density evaluate."""
    n_u = normal.x * u.x + normal.y * u.y + normal.z * u.z
    n_v = normal.x * v.x + normal.y * v.y + normal.z * v.z
    n_w = normal.x * w.x + normal.y * w.y + normal.z * w.z
    rho = jnp.sqrt(n_u * n_u + n_v * n_v)
    return n_u, n_v, n_w, rho


def _clip_arc_halfangle(rho, n_w, cos_a, sin_a):
    """Half-angle φ_lim of the above-horizon azimuth arc on the cone ring
    at polar angle (cos_a, sin_a), for a surface normal whose cone-frame
    decomposition has in-plane magnitude ρ and axis component n_w — the
    ONE definition of the clipped-density arc, shared by the sampler and
    the MIS reverse density (a mismatch there would break Σw = 1).

    sin_a·ρ ≈ 0 (axis sample or normal ∥ axis): visibility is the sign of
    the remaining term cos_a·n_w — the clamp handles it: n_w > 0 ⇒
    c → −inf ⇒ full ring; n_w < 0 ⇒ c → +inf ⇒ empty."""
    c = -(cos_a * n_w) / jnp.maximum(sin_a * rho, np.float32(1e-12))
    return _acos_conservative(jnp.clip(c, -1.0, 1.0))


@dataclass(frozen=True)
class LightArrays:
    """Device-resident area-light set: the non-inverted emissive spheres
    plus (when present) the emissive triangles.

    Sphere lights are cone-sampled; triangle lights are uniform-area
    sampled (exact — no bounding-cone approximation). The two kinds share
    one pick/cdf so a vertex still draws exactly one light per NEE sample.
    The triangle fields are ``None`` for sphere-only scenes, so the layout
    (and therefore the megakernel's light refs and every existing golden)
    is unchanged unless a scene actually has emissive triangles."""

    center: jnp.ndarray  # (L, 3) f32 sphere center / triangle centroid
    radius: jnp.ndarray  # (L,)   f32 sphere radius / 0 on triangle rows
    emit: jnp.ndarray  # (L, 3)  f32 color × power
    shape_idx: jnp.ndarray  # (L,) i32 full shape index (spheres, planes, tris)
    # Power-proportional selection: pick[k] = probability of sampling light
    # k (∝ luminance(emit)·area, normalized); cdf[k] = sum(pick[:k]) —
    # uniform picking wastes samples on dim lights in unequal-light scenes.
    pick: jnp.ndarray = None  # (L,) f32
    cdf: jnp.ndarray = None  # (L,) f32 exclusive prefix sum
    # Triangle-light geometry (None when the light set is spheres only).
    is_tri: jnp.ndarray = None  # (L,) f32 0/1
    tri_v0: jnp.ndarray = None  # (L, 3) f32 (zeros on sphere rows)
    tri_e1: jnp.ndarray = None  # (L, 3) f32 v1 - v0
    tri_e2: jnp.ndarray = None  # (L, 3) f32 v2 - v0
    tri_n: jnp.ndarray = None  # (L, 3) f32 unit authored normal
    tri_area: jnp.ndarray = None  # (L,) f32
    # Static per-light kind tags ('sphere' | 'tri'); () means all-sphere.
    kinds: tuple = ()

    @property
    def num_lights(self) -> int:
        return self.center.shape[0]

    @property
    def has_tris(self) -> bool:
        return self.tri_v0 is not None


jax.tree_util.register_dataclass(
    LightArrays,
    data_fields=[
        f.name for f in dataclasses.fields(LightArrays) if f.name != "kinds"
    ],
    meta_fields=["kinds"],
)


def extract_lights(sd: SceneData):
    """Build the NEE light set from scene data, or None if there are no
    non-inverted emissive spheres and no emissive triangles.

    Triangles keep the shape-index convention of the intersection paths
    (spheres, then planes, then triangles — scene.py scene_arrays), so
    shadow-ray self-exclusion and emission suppression match the sweep."""
    n_spheres = sum(isinstance(s, SphereData) for s in sd.shapes)
    n_planes = sum(isinstance(s, PlaneData) for s in sd.shapes)
    tri_base = n_spheres + n_planes
    # Per-light records: (kind, center, radius, emit, shape_idx, v0, e1, e2,
    # unit normal, area) with zero geometry on the kind it isn't.
    recs = []
    sphere_i = 0
    tri_i = 0
    z3 = (0.0, 0.0, 0.0)
    for s in sd.shapes:
        if isinstance(s, SphereData):
            m = s.material
            if m.kind == MaterialKind.EMISSIVE and not s.invert:
                emit = tuple(c * m.param for c in m.color)
                # Selection weight ∝ emitted power: luminance × area/(4π)
                # (= lum·r² for a sphere; one-sided triangles use A/(4π)
                # so mixed sets weight consistently).
                recs.append(
                    ("sphere", s.center, s.radius, emit, sphere_i,
                     z3, z3, z3, z3, 0.0, float(s.radius) ** 2)
                )
            sphere_i += 1
        elif isinstance(s, TriangleData):
            m = s.material
            if m.kind == MaterialKind.EMISSIVE:
                emit = tuple(c * m.param for c in m.color)
                v0 = np.asarray(s.v0, np.float64)
                e1 = np.asarray(s.v1, np.float64) - v0
                e2 = np.asarray(s.v2, np.float64) - v0
                cr = np.cross(e1, e2)
                area = 0.5 * float(np.linalg.norm(cr))
                nrm = cr / max(np.linalg.norm(cr), 1e-30)
                ctr = v0 + (e1 + e2) / 3.0
                recs.append(
                    ("tri", tuple(ctr), 0.0, emit, tri_base + tri_i,
                     tuple(v0), tuple(e1), tuple(e2), tuple(nrm), area,
                     area / (4.0 * np.pi))
                )
            tri_i += 1
    if not recs:
        return None
    f32 = lambda a, shp: jnp.asarray(np.asarray(a, np.float32).reshape(shp))
    n = len(recs)
    kinds = tuple(r[0] for r in recs)
    emits = np.asarray([r[3] for r in recs], np.float32).reshape(n, 3)
    # Selection weights ∝ emitted power reaching the scene: luminance of
    # (color × power) × surface area. Degenerate all-zero weights (black
    # "lights") fall back to uniform.
    lum = 0.2126 * emits[:, 0] + 0.7152 * emits[:, 1] + 0.0722 * emits[:, 2]
    w = lum * np.asarray([r[10] for r in recs], np.float32)
    total = float(w.sum())
    pick = w / total if total > 0 else np.full(n, 1.0 / n, np.float32)
    cdf = np.concatenate([[0.0], np.cumsum(pick)[:-1]]).astype(np.float32)
    la = LightArrays(
        center=f32([r[1] for r in recs], (n, 3)),
        radius=f32([r[2] for r in recs], (n,)),
        emit=jnp.asarray(emits),
        shape_idx=jnp.asarray(np.asarray([r[4] for r in recs], np.int32)),
        pick=f32(pick, (n,)),
        cdf=f32(cdf, (n,)),
    )
    if "tri" not in kinds:
        return la  # sphere-only: exact round-1 layout, megakernel-ready
    return dataclasses.replace(
        la,
        is_tri=f32([1.0 if r[0] == "tri" else 0.0 for r in recs], (n,)),
        tri_v0=f32([r[5] for r in recs], (n, 3)),
        tri_e1=f32([r[6] for r in recs], (n, 3)),
        tri_e2=f32([r[7] for r in recs], (n, 3)),
        tri_n=f32([r[8] for r in recs], (n, 3)),
        tri_area=f32([r[9] for r in recs], (n,)),
        kinds=kinds,
    )


class LightSample(NamedTuple):
    """One NEE light sample per lane (the return of sample_light_dirs)."""

    d: Vec3  # unit direction toward the sampled light point
    weight: Vec3  # L_e / (pick · pdf_solid_angle); 0 when unsampleable
    sidx: jnp.ndarray  # (B,) i32 full shape index of the picked light
    pdf: jnp.ndarray  # (B,) f32 solid-angle density of this strategy
    center: Vec3  # picked light's center (sphere rows; shade's sphere_t)
    radius: jnp.ndarray  # (B,) f32 picked light's radius (0 on tri rows)
    # Triangle-light channel: None for sphere-only light sets.
    tri_t: jnp.ndarray = None  # (B,) f32 ray-t of the sampled tri point
    tri_mask: jnp.ndarray = None  # (B,) bool: lane picked a triangle light


def sample_light_dirs(lights: LightArrays, p: Vec3, ux, uy, upick, normal: Vec3 = None):
    """Sample a direction from ``p`` toward a light picked with
    probability ``lights.pick`` (power-proportional selection): sphere
    lights by uniform cone sampling, triangle lights by uniform AREA
    sampling (exact solid-angle conversion pdf = pick·r²/(A·cosθ_l)).

    Returns a :class:`LightSample`: ``weight`` is L_e / (pick · pdf), i.e.
    everything of the estimator except the surface's f·cosθ and
    visibility; zero when ``p`` is inside a sphere light or behind a
    triangle light. ``pdf`` is the strategy's solid-angle density — the
    MIS balance-heuristic ingredient. ``center``/``radius`` are the picked
    light's sphere geometry, so the caller can compute the light's own
    ray-t with the exact same ``sphere_t`` rule the intersection sweep
    uses (any-hit shadow rays need t_max); triangle rows carry their
    sampled-point ray-t in ``tri_t`` instead (``tri_mask`` says which).

    ``normal`` (optional) enables PARTIAL-CONE horizon clipping: on each
    cone ring (fixed polar angle about the light axis) the azimuth is
    drawn only from the arc above the surface horizon ``normal·d ≥ 0``,
    and the weight scales by that arc's fraction of the full ring.
    Per-ring this is uniform sampling of the visible arc with the exactly
    matching density, so the estimator stays unbiased while the zero
    outcomes of whole-cone accept/reject vanish — strictly lower variance
    when a light cone straddles the horizon (grazing lights). The returned
    ``pdf`` reflects the clipped density. Callers using MIS must pass the
    SAME convention to the reverse-direction density (nee_pdf_toward has
    no access to the prior vertex's normal and evaluates the unclipped
    density, so MIS mode keeps ``normal=None``; see ops/shade.py).
    """
    nl = lights.num_lights
    upick = jnp.asarray(upick)
    # Power-proportional pick: light k owns [cdf[k], cdf[k] + pick[k]); the
    # cdf is monotone so the LAST k with upick >= cdf[k] wins.
    li = jnp.zeros(upick.shape, jnp.int32)
    for k in range(1, nl):
        li = jnp.where(upick >= lights.cdf[k], np.int32(k), li)
    # Per-lane light record via a static select loop: light sets are tiny
    # and this form lowers cleanly everywhere (Mosaic has no cheap gather),
    # so the same code serves the XLA path and the megakernel.
    shape = li.shape
    cx = jnp.zeros(shape, jnp.float32)
    cy, cz, rad = cx, cx, cx
    er, eg, eb = cx, cx, cx
    pk = jnp.zeros(shape, jnp.float32)
    sidx = jnp.zeros(shape, jnp.int32)
    has_tris = lights.has_tris
    if has_tris:
        it = jnp.zeros(shape, jnp.float32)
        tv = [jnp.zeros(shape, jnp.float32) for _ in range(3)]
        t1 = [jnp.zeros(shape, jnp.float32) for _ in range(3)]
        t2 = [jnp.zeros(shape, jnp.float32) for _ in range(3)]
        tn = [jnp.zeros(shape, jnp.float32) for _ in range(3)]
        tarea = jnp.zeros(shape, jnp.float32)
    for k in range(nl):
        sel = li == k
        cx = jnp.where(sel, lights.center[k, 0], cx)
        cy = jnp.where(sel, lights.center[k, 1], cy)
        cz = jnp.where(sel, lights.center[k, 2], cz)
        rad = jnp.where(sel, lights.radius[k], rad)
        er = jnp.where(sel, lights.emit[k, 0], er)
        eg = jnp.where(sel, lights.emit[k, 1], eg)
        eb = jnp.where(sel, lights.emit[k, 2], eb)
        pk = jnp.where(sel, lights.pick[k], pk)
        sidx = jnp.where(sel, lights.shape_idx[k], sidx)
        if has_tris:
            it = jnp.where(sel, lights.is_tri[k], it)
            for c in range(3):
                tv[c] = jnp.where(sel, lights.tri_v0[k, c], tv[c])
                t1[c] = jnp.where(sel, lights.tri_e1[k, c], t1[c])
                t2[c] = jnp.where(sel, lights.tri_e2[k, c], t2[c])
                tn[c] = jnp.where(sel, lights.tri_n[k, c], tn[c])
            tarea = jnp.where(sel, lights.tri_area[k], tarea)
    emit = (er, eg, eb)

    dc = Vec3(cx - p.x, cy - p.y, cz - p.z)
    dist2 = dot(dc, dc)
    dist = jnp.sqrt(dist2)
    inside = dist2 <= rad * rad
    sin2_max = jnp.clip(rad * rad / jnp.maximum(dist2, 1e-12), 0.0, 1.0)
    cos_max = jnp.sqrt(jnp.maximum(1.0 - sin2_max, 0.0))

    # Uniform direction in the cone around w = dc/dist.
    w = dc * (1.0 / jnp.maximum(dist, 1e-12))
    cos_a = 1.0 - jnp.asarray(ux) * (1.0 - cos_max)
    sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))
    u, v = _cone_frame(w)

    arc_frac = None
    if normal is None:
        phi = _TWO_PI * jnp.asarray(uy)
        cp, sp = jnp.cos(phi), jnp.sin(phi)
    else:
        # Horizon clipping per ring: d(φ)·n = sin_a·ρ·cos(φ−φ0) + cos_a·n_w
        # with n = (n_u, n_v, n_w) in the cone frame, ρ = |(n_u, n_v)| and
        # φ0 the azimuth of (n_u, n_v). Visible arc: |φ−φ0| ≤ arccos(c) for
        # c = −cos_a·n_w / (sin_a·ρ) clamped to [−1, 1] (c ≤ −1: whole ring
        # visible; c ≥ +1: none — weight 0 via arc_frac).
        #
        # No atan2/arccos anywhere: Mosaic TPU has no lowering for either
        # (the megakernel shares this code), so (cos φ0, sin φ0) come
        # straight from (n_u, n_v)/ρ and the arc half-angle uses
        # `_acos_conservative`, an over-covering polynomial arccos: the arc
        # sampled is guaranteed ⊇ the visible arc (never misses visible
        # light — sub-horizon overshoot is zeroed by the caller's
        # cosθ > 0 mask, which the matching 1/arc density keeps unbiased).
        n_u, n_v, n_w, rho = _ring_decompose(normal, u, v, w)
        phi_lim = _clip_arc_halfangle(rho, n_w, cos_a, sin_a)
        arc_frac = phi_lim * np.float32(1.0 / np.pi)
        # φ = φ0 + δ via angle addition; ρ ∥ axis ⇒ any φ0 serves (full or
        # empty ring), but it must stay a unit rotation — hence the guard.
        safe = rho > np.float32(1e-6)
        inv_rho = 1.0 / jnp.maximum(rho, np.float32(1e-12))
        c0 = jnp.where(safe, n_u * inv_rho, 1.0)
        s0 = jnp.where(safe, n_v * inv_rho, 0.0)
        delta = (2.0 * jnp.asarray(uy) - 1.0) * phi_lim
        cd, sd = jnp.cos(delta), jnp.sin(delta)
        cp = c0 * cd - s0 * sd
        sp = s0 * cd + c0 * sd

    d = Vec3(
        sin_a * (cp * u.x + sp * v.x) + cos_a * w.x,
        sin_a * (cp * u.y + sp * v.y) + cos_a * w.y,
        sin_a * (cp * u.z + sp * v.z) + cos_a * w.z,
    )

    # weight = L_e / (pick_k · pdf_cone); pdf_cone = 1/(2π(1−cos_max)).
    wgt = _TWO_PI * (1.0 - cos_max) / jnp.maximum(pk, 1e-12)
    wgt = jnp.where(inside, 0.0, wgt)
    if arc_frac is not None:
        # Clipped density: pdf_ring is up by π/φ_lim, so the weight scales
        # by the visible fraction (φ_lim = 0 ⇒ no visible arc ⇒ zero).
        wgt = wgt * arc_frac

    tri_t = tri_mask = None
    if has_tris:
        # Triangle lanes: uniform point on the triangle (barycentric fold
        # of the same (ux, uy) square sample the cone lanes spend), exact
        # area→solid-angle conversion. The cone's horizon clipping doesn't
        # apply — below-horizon outcomes are already masked by the caller's
        # cosθ > 0 test, and a back-facing triangle (the reference's
        # one-sided emissive rule, materials.rs:44-49) weighs zero here.
        uu = jnp.asarray(ux)
        vv = jnp.asarray(uy)
        flip = uu + vv > 1.0
        uu = jnp.where(flip, 1.0 - uu, uu)
        vv = jnp.where(flip, 1.0 - vv, vv)
        qx = tv[0] + uu * t1[0] + vv * t2[0]
        qy = tv[1] + uu * t1[1] + vv * t2[1]
        qz = tv[2] + uu * t1[2] + vv * t2[2]
        dvx, dvy, dvz = qx - p.x, qy - p.y, qz - p.z
        r2 = jnp.maximum(dvx * dvx + dvy * dvy + dvz * dvz, np.float32(1e-12))
        r = jnp.sqrt(r2)
        inv_r = 1.0 / r
        td = Vec3(dvx * inv_r, dvy * inv_r, dvz * inv_r)
        # cosθ_l: the light's authored normal against the incoming shadow
        # ray — matches the emission facing test (-n)·d > 0 at a hit.
        cos_l = -(tn[0] * td.x + tn[1] * td.y + tn[2] * td.z)
        wgt_tri = (
            tarea * jnp.maximum(cos_l, 0.0) / (jnp.maximum(pk, 1e-12) * r2)
        )
        tri_mask = it > 0.5
        d = vwhere(tri_mask, td, d)
        wgt = jnp.where(tri_mask, wgt_tri, wgt)
        tri_t = r

    weight = Vec3(emit[0] * wgt, emit[1] * wgt, emit[2] * wgt)
    pdf = 1.0 / jnp.maximum(wgt, 1e-20)
    if has_tris:
        # Forward density in the IDENTICAL clamped form nee_pdf_toward uses
        # (pick·r²/max(A·cosθ_l, ε)) rather than inverting the weight, so
        # the MIS balance heuristic sees bit-matching forward/reverse
        # densities even at grazing cosθ_l. Back-facing lanes (cosθ_l ≤ 0)
        # are zeroed exactly like nee_pdf_toward zeroes them — the invariant
        # must hold on the pdf itself, not rest on every consumer also
        # multiplying by the (zero) weight.
        pdf_tri = jnp.where(
            cos_l > 0.0,
            pk * r2 / jnp.maximum(tarea * cos_l, np.float32(1e-12)),
            0.0,
        )
        pdf = jnp.where(tri_mask, pdf_tri, pdf)
    return LightSample(
        d=d, weight=weight, sidx=sidx, pdf=pdf, center=Vec3(cx, cy, cz),
        radius=rad, tri_t=tri_t, tri_mask=tri_mask,
    )


def light_emission(lights: LightArrays, shape_idx):
    """(is_nee_light, ...) mask: is `shape_idx` one of the NEE light set?
    Used to suppress double counting after a diffuse NEE vertex."""
    m = jnp.zeros(shape_idx.shape, jnp.bool_)
    for k in range(lights.num_lights):
        m |= shape_idx == lights.shape_idx[k]
    return m


def nee_pdf_toward(lights: LightArrays, p: Vec3, shape_idx, d: Vec3 = None, t=None, normal: Vec3 = None):
    """Solid-angle density with which NEE at ``p`` would have sampled a
    direction toward the light identified by ``shape_idx`` — the balance-
    heuristic counterweight for BSDF hits of a light. Zero for non-lights.

    ``d``/``t`` (the hit ray's unit direction and hit distance) are only
    consulted for triangle lights, whose area-sampling density depends on
    the actual hit point: pdf = pick·t²/(A·cosθ_l). Sphere-light sets can
    omit them (the cone density needs only ``p``).

    ``normal`` (the normal AT ``p`` — the previous vertex's stored normal,
    PathState.prev_normal) selects the PARTIAL-CONE clipped density, the
    exact reverse of ``sample_light_dirs(..., normal=...)``: the ring of
    ``d`` gets density ·π/φ_lim. Every BSDF direction leaving ``p`` lies
    above its horizon, hence inside the (conservatively over-covering)
    sampled arc, so the clipped density is well-defined wherever a BSDF
    hit can occur. Requires ``d``.

    Approximation shared with every production tracer: when light cones
    overlap, only the hit light's own cone density is counted.
    """
    nl = lights.num_lights
    kinds = lights.kinds or ("sphere",) * nl
    pdf = jnp.zeros(shape_idx.shape, jnp.float32)
    for k in range(nl):
        sel = shape_idx == lights.shape_idx[k]
        if kinds[k] == "tri":
            if d is None or t is None:
                raise ValueError(
                    "nee_pdf_toward needs d and t for triangle lights"
                )
            cos_l = -(
                lights.tri_n[k, 0] * d.x
                + lights.tri_n[k, 1] * d.y
                + lights.tri_n[k, 2] * d.z
            )
            pdf_k = (
                lights.pick[k]
                * t
                * t
                / jnp.maximum(lights.tri_area[k] * cos_l, np.float32(1e-12))
            )
            # A back-facing triangle cannot be NEE-sampled (weight 0), so
            # its reverse density is 0 — the BSDF walk keeps full weight.
            pdf_k = jnp.where(cos_l > 0.0, pdf_k, 0.0)
        else:
            dcx = lights.center[k, 0] - p.x
            dcy = lights.center[k, 1] - p.y
            dcz = lights.center[k, 2] - p.z
            dist2 = dcx * dcx + dcy * dcy + dcz * dcz
            r = lights.radius[k]
            sin2 = jnp.clip(r * r / jnp.maximum(dist2, 1e-12), 0.0, 1.0)
            cos_max = jnp.sqrt(jnp.maximum(1.0 - sin2, 0.0))
            omega = _TWO_PI * (1.0 - cos_max)
            pdf_k = lights.pick[k] / jnp.maximum(omega, 1e-20)
            if normal is not None:
                # Clipped density on the ring of d (see docstring): the
                # same cone frame, ρ/n_w decomposition, and φ_lim formula
                # as the sampler — bit-matching by shared construction.
                dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
                inv = 1.0 / dist
                w = Vec3(dcx * inv, dcy * inv, dcz * inv)
                u, v = _cone_frame(w)
                cos_a = w.x * d.x + w.y * d.y + w.z * d.z
                sin_a = jnp.sqrt(jnp.maximum(1.0 - cos_a * cos_a, 0.0))
                n_u, n_v, n_w, rho = _ring_decompose(normal, u, v, w)
                phi_lim = _clip_arc_halfangle(rho, n_w, cos_a, sin_a)
                pdf_k = pdf_k * np.float32(np.pi) / jnp.maximum(
                    phi_lim, np.float32(1e-9)
                )
            # Inside the light NEE cannot sample it at all.
            pdf_k = jnp.where(dist2 <= r * r, 0.0, pdf_k)
        pdf = jnp.where(sel, pdf_k, pdf)
    return pdf
