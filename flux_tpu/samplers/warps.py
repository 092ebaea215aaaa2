"""Warps from the unit square to hemisphere / disc distributions.

TPU-native equivalents of the reference's warp functions
(samplers/src/lib.rs:129-182): ``to_unit_hemi`` (cos^e-weighted hemisphere)
and ``to_poisson_disc`` (Shirley-Chiu concentric square→disc map).  All
functions are vectorized over leading axes and accept per-lane exponents,
which is what lets the renderer warp an entire wavefront of glossy bounces
with per-ray Phong exponents in one fused VPU pass (the reference warps one
scalar sample per hit inside virtual dispatch, fluxcore/src/brdf.rs:56-65).
"""

import jax.numpy as jnp
import numpy as np

__all__ = ["to_unit_hemi", "to_hemisphere", "to_poisson_disc"]

_TWO_PI = np.float32(2.0 * np.pi)
_QUARTER_PI = np.float32(np.pi / 4.0)


def to_unit_hemi(x, y, e):
    """Map a unit-square point to a cos^e-weighted unit hemisphere direction.

    Returns the local-frame components ``(u, v, w)`` with ``w = cos(theta) =
    (1-y)^(1/(e+1))`` — the exact distribution of the reference
    (samplers/src/lib.rs:133-142).  ``e`` may be a scalar or per-lane array.
    The result is already unit length; the reference's extra ``normalize`` is
    a numerical no-op and is omitted.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    e = jnp.asarray(e, jnp.float32)
    phi = _TWO_PI * x
    cos_phi = jnp.cos(phi)
    # sin from cos instead of a second transcendental: |sin| = √(1−cos²),
    # sign + for φ in (0, π) i.e. x < ½. This runs once per LANE per BOUNCE
    # (the hottest transcendental in the kernel); the √ form is exact where
    # sin ≈ 0 (1−cos² ≈ φ² there) and ~1-ulp elsewhere.
    sin_phi = jnp.where(x < 0.5, 1.0, -1.0) * jnp.sqrt(
        jnp.maximum(1.0 - cos_phi * cos_phi, 0.0)
    )
    cos_theta = jnp.power(jnp.maximum(1.0 - y, 0.0), 1.0 / (e + 1.0))
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    return sin_theta * cos_phi, sin_theta * sin_phi, cos_theta


def to_hemisphere(points, e):
    """Batch form: (N, 2) unit-square points -> (N, 3) hemisphere directions.

    API parity with the reference's ``to_hemisphere`` (lib.rs:129-131).
    """
    u, v, w = to_unit_hemi(points[..., 0], points[..., 1], e)
    return jnp.stack([u, v, w], axis=-1)


def to_poisson_disc(x, y):
    """Concentric map of unit-square points onto the unit disc.

    Vectorized, branch-free version of the reference's four-quadrant
    concentric map (lib.rs:144-182): the square is recentered to [-1,1]²,
    each quadrant picks radius from the dominant coordinate and a fractional
    angle from the ratio of the other, giving a low-distortion area-
    preserving disc distribution for thin-lens sampling.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    spx = 2.0 * x - 1.0
    spy = 2.0 * y - 1.0

    def safe_div(a, b):
        return a / jnp.where(b == 0.0, 1.0, b)

    c1 = spx > -spy
    c2 = spx > spy
    c3 = spx < spy

    r = jnp.where(
        c1,
        jnp.where(c2, spx, spy),
        jnp.where(c3, -spx, -spy),
    )
    phi = jnp.where(
        c1,
        jnp.where(c2, safe_div(spy, spx), 2.0 - safe_div(spx, spy)),
        jnp.where(
            c3,
            4.0 + safe_div(spy, spx),
            jnp.where(spy != 0.0, 6.0 - safe_div(spx, spy), 0.0),
        ),
    )
    # phi (pre-scale) lies in [-1, 8) ≙ [-π/4, 2π): sin ≥ 0 exactly on
    # [0, π), i.e. pre-scale [0, 4).
    sin_sign = jnp.where((phi >= 0.0) & (phi < 4.0), 1.0, -1.0)
    phi = phi * _QUARTER_PI
    cos_phi = jnp.cos(phi)
    sin_phi = sin_sign * jnp.sqrt(jnp.maximum(1.0 - cos_phi * cos_phi, 0.0))
    return r * cos_phi, r * sin_phi
