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
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..scene import MaterialKind, SceneData, SphereData
from ..vec import Vec3, dot, frame_about

__all__ = ["LightArrays", "extract_lights", "sample_light_dirs", "light_emission", "nee_pdf_toward"]

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


@dataclass(frozen=True)
class LightArrays:
    """Device-resident area-light set: the non-inverted emissive spheres."""

    center: jnp.ndarray  # (L, 3) f32
    radius: jnp.ndarray  # (L,)   f32
    emit: jnp.ndarray  # (L, 3)  f32 color × power
    shape_idx: jnp.ndarray  # (L,) i32 sphere index in the scene's shape order
    # Power-proportional selection: pick[k] = probability of sampling light
    # k (∝ luminance(emit)·radius², normalized); cdf[k] = sum(pick[:k]) —
    # uniform picking wastes samples on dim lights in unequal-light scenes.
    pick: jnp.ndarray = None  # (L,) f32
    cdf: jnp.ndarray = None  # (L,) f32 exclusive prefix sum

    @property
    def num_lights(self) -> int:
        return self.center.shape[0]


jax.tree_util.register_dataclass(
    LightArrays,
    data_fields=[f.name for f in dataclasses.fields(LightArrays)],
    meta_fields=[],
)


def extract_lights(sd: SceneData):
    """Build the NEE light set from scene data, or None if there are no
    non-inverted emissive spheres."""
    centers, radii, emits, idxs = [], [], [], []
    sphere_i = 0
    for s in sd.shapes:
        if not isinstance(s, SphereData):
            continue
        m = s.material
        if m.kind == MaterialKind.EMISSIVE and not s.invert:
            centers.append(s.center)
            radii.append(s.radius)
            emits.append(tuple(c * m.param for c in m.color))
            idxs.append(sphere_i)
        sphere_i += 1
    if not centers:
        return None
    f32 = lambda a, shp: jnp.asarray(np.asarray(a, np.float32).reshape(shp))
    n = len(centers)
    # Selection weights ∝ emitted power reaching the scene: luminance of
    # (color × power) × surface area (∝ r²). Degenerate all-zero weights
    # (black "lights") fall back to uniform.
    e = np.asarray(emits, np.float32).reshape(n, 3)
    lum = 0.2126 * e[:, 0] + 0.7152 * e[:, 1] + 0.0722 * e[:, 2]
    w = lum * np.asarray(radii, np.float32) ** 2
    total = float(w.sum())
    pick = w / total if total > 0 else np.full(n, 1.0 / n, np.float32)
    cdf = np.concatenate([[0.0], np.cumsum(pick)[:-1]]).astype(np.float32)
    return LightArrays(
        center=f32(centers, (n, 3)),
        radius=f32(radii, (n,)),
        emit=f32(emits, (n, 3)),
        shape_idx=jnp.asarray(np.asarray(idxs, np.int32)),
        pick=f32(pick, (n,)),
        cdf=f32(cdf, (n,)),
    )


def sample_light_dirs(lights: LightArrays, p: Vec3, ux, uy, upick, normal: Vec3 = None):
    """Cone-sample a direction from ``p`` toward a light picked with
    probability ``lights.pick`` (power-proportional selection).

    Returns (dir, weight, light_shape_idx, pdf, center, radius): ``weight``
    is L_e · L / pdf_cone, i.e. everything of the estimator except the
    surface's f·cosθ and visibility; zero when ``p`` is inside the light.
    ``pdf`` is the strategy's solid-angle density pdf_cone/L — the MIS
    balance-heuristic ingredient (inf when inside the light). ``center``
    (Vec3) and ``radius`` are the picked light's geometry, so the caller
    can compute the light's own ray-t with the exact same ``sphere_t``
    rule the intersection sweep uses (any-hit shadow rays need t_max).

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
    # Frame about w (the matte epsilon vector, ops/brdf.py _EM).
    eps = Vec3(jnp.float32(0.0034), jnp.float32(1.0), jnp.float32(0.0071))
    u, v = frame_about(w, eps)

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
        n_u = normal.x * u.x + normal.y * u.y + normal.z * u.z
        n_v = normal.x * v.x + normal.y * v.y + normal.z * v.z
        n_w = normal.x * w.x + normal.y * w.y + normal.z * w.z
        rho = jnp.sqrt(n_u * n_u + n_v * n_v)
        c = -(cos_a * n_w) / jnp.maximum(sin_a * rho, np.float32(1e-12))
        # sin_a·ρ ≈ 0 (axis sample or normal ∥ axis): visibility is the
        # sign of the remaining term cos_a·n_w — the clamp handles it:
        # n_w > 0 ⇒ c → −inf ⇒ full ring; n_w < 0 ⇒ c → +inf ⇒ empty.
        phi_lim = _acos_conservative(jnp.clip(c, -1.0, 1.0))
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
    weight = Vec3(emit[0] * wgt, emit[1] * wgt, emit[2] * wgt)
    pdf = 1.0 / jnp.maximum(wgt, 1e-20)
    return d, weight, sidx, pdf, Vec3(cx, cy, cz), rad


def light_emission(lights: LightArrays, shape_idx):
    """(is_nee_light, ...) mask: is `shape_idx` one of the NEE light set?
    Used to suppress double counting after a diffuse NEE vertex."""
    m = jnp.zeros(shape_idx.shape, jnp.bool_)
    for k in range(lights.num_lights):
        m |= shape_idx == lights.shape_idx[k]
    return m


def nee_pdf_toward(lights: LightArrays, p: Vec3, shape_idx):
    """Solid-angle density with which NEE at ``p`` would have sampled a
    direction toward the light identified by ``shape_idx`` — the balance-
    heuristic counterweight for BSDF hits of a light. Zero for non-lights.

    Approximation shared with every production tracer: when light cones
    overlap, only the hit light's own cone density is counted.
    """
    nl = lights.num_lights
    pdf = jnp.zeros(shape_idx.shape, jnp.float32)
    for k in range(nl):
        sel = shape_idx == lights.shape_idx[k]
        dcx = lights.center[k, 0] - p.x
        dcy = lights.center[k, 1] - p.y
        dcz = lights.center[k, 2] - p.z
        dist2 = dcx * dcx + dcy * dcy + dcz * dcz
        r = lights.radius[k]
        sin2 = jnp.clip(r * r / jnp.maximum(dist2, 1e-12), 0.0, 1.0)
        cos_max = jnp.sqrt(jnp.maximum(1.0 - sin2, 0.0))
        omega = _TWO_PI * (1.0 - cos_max)
        pdf_k = lights.pick[k] / jnp.maximum(omega, 1e-20)
        # Inside the light NEE cannot sample it at all.
        pdf_k = jnp.where(dist2 <= r * r, 0.0, pdf_k)
        pdf = jnp.where(sel, pdf_k, pdf)
    return pdf
