"""One wavefront bounce: intersect, emit/terminate, scatter (SoA lanes).

This is the loop-inversion of the reference's recursive shader
(fluxcore/src/scene.rs:162-172 + materials.rs): instead of each ray
recursing into ``scene.shade(depth+1)``, the whole wavefront advances one
bounce per call with alive-masking, carrying (origin, direction, throughput,
radiance, alive) state.  Termination semantics match the reference exactly:

* miss          → radiance += throughput × background  (scene.rs:168)
* emissive hit  → radiance += throughput × color×power if the (possibly
                  inverted) normal faces the ray, else black; either way the
                  path ends — Emissive never recurses (materials.rs:42-50)
* other hit     → throughput ×= albedo (see ops/brdf.py for the analytic
                  f·cos/pdf cancellation), ray moves to the hit point with a
                  sampled direction (materials.rs:24-32,62-70)
* depth cap     → handled by the caller running exactly ``max_trace_depth``
                  bounces; still-alive paths contribute nothing, matching
                  ``depth > max → black`` (scene.rs:164-165)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..scene import MaterialKind, SceneArrays
from ..vec import Vec3, dot
from ..vec import where as vwhere
from .brdf import sample_directions
from .intersect import intersect, intersect_bvh, intersect_scan, intersect_scan_carry

__all__ = ["PathState", "bounce"]


class PathState(NamedTuple):
    o: Vec3  # ray origin
    d: Vec3  # ray direction (unit)
    throughput: Vec3
    radiance: Vec3  # accumulated
    alive: jnp.ndarray  # (B,) bool


def bounce(
    scene: SceneArrays,
    state: PathState,
    sx,
    sy,
    bvh=None,
    accel: str = "sweep",
    intersect_fn=None,
) -> PathState:
    """Advance every alive path by one bounce.

    ``sx``/``sy`` is the stratified unit-square sample for this bounce depth
    (one fresh 2-D sample per lane per depth). Intersection strategy:
    ``intersect_fn(scene, o, d)`` overrides everything (the Pallas kernel
    injects a ref-slicing closure here); ``bvh`` arrays (ops/bvh.py) take
    the O(log N) traversal; ``accel='scan'`` streams sphere blocks under
    ``lax.scan`` (constant compile time, the large-scene default);
    ``'scan_carry'`` is its winner-carrying form; otherwise the unrolled
    sweep.
    """
    o, d, tput, rad, alive = state
    if intersect_fn is not None:
        hit = intersect_fn(scene, o, d)
    elif bvh is not None:
        hit = intersect_bvh(scene, bvh, o, d)
    elif accel == "scan":
        hit = intersect_scan(scene, o, d)
    elif accel == "scan_carry":
        hit = intersect_scan_carry(scene, o, d)
    else:
        hit = intersect(scene, o, d)

    miss = alive & ~hit.mask
    is_emissive = hit.kind == MaterialKind.EMISSIVE
    emit_hit = alive & hit.mask & is_emissive
    scatter = alive & hit.mask & ~is_emissive

    # Miss → background, weighted by throughput (scene.rs:168).
    bg = Vec3(scene.background[0], scene.background[1], scene.background[2])
    # Emissive → emit only when facing: (-n)·d > 0 (materials.rs:44-49).
    facing = dot(hit.normal, d) < 0.0
    emit_mask = emit_hit & facing

    def add_masked(acc, mask_a, va, mask_b, vb):
        return Vec3(
            acc.x + jnp.where(mask_a, va.x, 0.0) + jnp.where(mask_b, vb.x, 0.0),
            acc.y + jnp.where(mask_a, va.y, 0.0) + jnp.where(mask_b, vb.y, 0.0),
            acc.z + jnp.where(mask_a, va.z, 0.0) + jnp.where(mask_b, vb.z, 0.0),
        )

    rad = add_masked(rad, miss, tput.hadamard(bg), emit_mask, tput.hadamard(hit.albedo))

    # Scatter: new direction + analytic throughput update.
    wi = sample_directions(hit.kind, hit.exponent, hit.normal, d, sx, sy)
    tput = vwhere(scatter, tput.hadamard(hit.albedo), tput)
    o = vwhere(scatter, hit.point, o)
    d = vwhere(scatter, wi, d)

    return PathState(o=o, d=d, throughput=tput, radiance=rad, alive=scatter)
