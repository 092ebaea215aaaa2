"""Branchless wavefront BRDF sampling and throughput weights (SoA lanes).

The reference shades each hit through virtual dispatch — ``Material::
path_shade`` selecting a ``BRDF::sample_f`` (fluxcore/src/materials.rs:8-72,
brdf.rs:9-79) — and its estimator multiplies ``f * (n·wi) / pdf`` per bounce.
For every reference material that product *cancels analytically*:

* Lambertian (brdf.rs:14-31):      f = kd·cd/π,  pdf = (n·wi)/π  → kd·cd
* PerfectSpecular (brdf.rs:33-46): f = kr·cr,    pdf = n·wi      → kr·cr
* GlossySpecular (brdf.rs:48-79):  f = ks·cs·(r·wi)^e, pdf = (r·wi)^e·(n·wi)
                                                                  → ks·cs

so the shader multiplies path throughput by the material's (color × amount)
directly (see ops/shade.py).  This is both faster and more robust than the
reference: at exponents like 1e5 (scenes/demo1.yml) the f32 ``(r·wi)^e``
under/overflows and the literal f/pdf ratio would be 0/0, while the analytic
form is exact.  Only the *direction* distributions differ per material, and
they are sampled here branch-free with per-lane exponents, reproducing the
reference's frames and flip rules:

* matte  frame: v = normalize((0.0034,1,0.0071) × n), u = v × n, e = 0
  (brdf.rs:22-27)
* glossy frame about the mirror direction r: u = normalize((0.00424,1,
  0.00764) × r), v = u × r, cos^e warp, below-horizon flip (brdf.rs:56-71)
* perfect mirror: wi = reflect(d, n) (brdf.rs:40-43)

One deliberate statistical deviation: for the glossy warp the reference
reuses the *pixel anti-aliasing* sample at every bounce depth
(materials.rs:23,60 index into ``pixel_sets``), correlating lens placement,
AA jitter and all glossy lobes of a path.  We draw a fresh stratified sample
per (pixel, sample, depth) instead — identical in expectation, strictly
better decorrelation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..samplers.warps import to_unit_hemi
from ..scene import MaterialKind
from ..vec import Vec3, dot, frame_about, reflect
from ..vec import where as vwhere

__all__ = ["sample_directions"]

# Frame-epsilon vectors (brdf.rs:23 and brdf.rs:57).
_EM = np.array([0.0034, 1.0, 0.0071], np.float32)
_EG = np.array([0.00424, 1.0, 0.00764], np.float32)


def sample_directions(
    kind, exponent, normal: Vec3, d: Vec3, sx, sy, physical: bool = False
) -> Vec3:
    """Sample the bounce direction for every lane of a wavefront.

    Args:
      kind:     (B,) int32 material kind codes.
      exponent: (B,) f32 Phong exponents (meaningful for GLOSSY lanes).
      normal:   surface normals at the hits (Vec3 of (B,) arrays).
      d:        incoming ray directions (unit).
      sx, sy:   (B,) stratified unit-square sample for this bounce.
      physical: matte lanes draw cosine-weighted directions (e=1) instead
        of the reference's uniform hemisphere (e=0, sampling.rs:25-27).
        With cosine sampling the analytic f·cos/pdf = kd·cd cancellation
        is *correct* rather than reference-compatible, so the throughput
        update needs no change — only the direction distribution moves.

    Returns unit outgoing directions ``wi``.
    """
    r = reflect(d, normal)  # mirror direction (unit)
    is_glossy = kind == MaterialKind.GLOSSY
    is_perfect = kind == MaterialKind.REFLECTIVE

    # Shared cos^e hemisphere warp; matte lanes use e=0 (reference
    # transport) or e=1 (physical Lambertian).
    e = jnp.where(is_glossy, exponent, 1.0 if physical else 0.0)
    hx, hy, hz = to_unit_hemi(sx, sy, e)

    # Per-lane frame. Matte: w=n, v=normalize(em×w), u=v×w, wi=x·u+y·v+z·w.
    # Glossy: w=r, u=normalize(eg×w), v=u×w, wi=x·u+y·v+z·w. Both reduce to
    # wi = x·f1 + y·f2 + z·w with (f1, f2) chosen per lane.
    w = vwhere(is_glossy, r, normal)
    eps = vwhere(
        is_glossy,
        Vec3(jnp.float32(_EG[0]), jnp.float32(_EG[1]), jnp.float32(_EG[2])),
        Vec3(jnp.float32(_EM[0]), jnp.float32(_EM[1]), jnp.float32(_EM[2])),
    )
    c, c2 = frame_about(w, eps)  # matte (v, u=v×w) / glossy (u, v=u×w)
    f1 = vwhere(is_glossy, c, c2)  # multiplies the x component
    f2 = vwhere(is_glossy, c2, c)  # multiplies the y component

    tangential = Vec3(
        hx * f1.x + hy * f2.x,
        hx * f1.y + hy * f2.y,
        hx * f1.z + hy * f2.z,
    )
    axial = w * hz

    # Glossy below-horizon flip (brdf.rs:66-71): negate the tangential part.
    below = (dot(normal, tangential + axial) < 0.0) & is_glossy
    sign = jnp.where(below, -1.0, 1.0)
    wi = tangential * sign + axial

    return vwhere(is_perfect, r, wi)
