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
import numpy as np

from ..constants import T_MIN
from ..scene import MaterialKind, SceneArrays
from ..vec import Vec3, dot, reflect
from ..vec import where as vwhere
from .brdf import sample_directions
from .intersect import intersect

__all__ = ["PathState", "bounce"]


class PathState(NamedTuple):
    o: Vec3  # ray origin
    d: Vec3  # ray direction (unit)
    throughput: Vec3
    radiance: Vec3  # accumulated
    alive: jnp.ndarray  # (B,) bool
    # True when the previous vertex was a diffuse NEE vertex: emission from
    # the NEE light set is suppressed at the next hit so each transport path
    # is counted exactly once (see ops/nee.py). Constant False without NEE.
    suppress: jnp.ndarray = None  # (B,) bool | None
    # Physical+NEE (MIS) only: the solid-angle pdf with which the previous
    # diffuse vertex sampled this ray's direction (0 when the previous
    # vertex had no light-sampling alternative — camera, specular, glossy).
    prev_pdf: jnp.ndarray = None  # (B,) f32 | None
    # Shape index the ray ORIGINATES on (previous bounce's hit; −1 for
    # camera rays). Drives the exact self-re-hit exclusion in the
    # intersection paths (ops/intersect.sphere_t ``on_self``): without it,
    # f32 noise in the sphere quadratic's c manufactures false
    # self-intersections above T_MIN at grazing exit angles — bounces the
    # reference's f64 would never take. None = legacy behavior (no
    # exclusion), kept for the precision tests that measure the bug.
    prev_shape: jnp.ndarray = None  # (B,) i32 | None
    # Physical+NEE (MIS) only: the previous vertex's shading normal — lets
    # the emission side of the balance heuristic evaluate the PARTIAL-CONE
    # clipped light density (nee_pdf_toward(..., normal=...)) that the NEE
    # side sampled with, keeping one consistent density (Σw = 1) while
    # cutting the grazing-light variance whole-cone sampling left
    # (2.25–4.7× measured; ops/nee.py module docstring).
    prev_normal: Vec3 = None  # Vec3 | None


def bounce(
    scene: SceneArrays,
    state: PathState,
    sx,
    sy,
    isect=None,
    lights=None,
    nee_samples=None,
    physical: bool = False,
    first_bounce: bool = False,
) -> PathState:
    """Advance every alive path by one bounce.

    ``sx``/``sy`` is the stratified unit-square sample for this bounce depth
    (one fresh 2-D sample per lane per depth). ``isect(scene, o, d)`` is the
    intersection strategy — an ops/intersect.py :class:`Intersector` built
    at Renderer construction, or the Pallas kernel's ref-slicing closure;
    default the unrolled sweep. ``lights`` (ops/nee.py LightArrays) with
    ``nee_samples`` (ux, uy, upick, active) enables next-event estimation
    at diffuse vertices; ``active`` (a traced bool) gates the direct-light
    add OFF at the final depth so the NEE estimator truncates transport at
    exactly the same path length as the BSDF walk (NEE at vertex k collects
    the emission a BSDF path would collect at vertex k+1).
    """
    do_intersect = isect if isect is not None else intersect

    o, d, tput, rad, alive, suppress, prev_pdf, prev_shape, prev_normal = state
    if prev_shape is None or first_bounce:
        # first_bounce: camera rays originate on no shape (prev ≡ −1), so
        # the per-shape exclusion compares are statically dropped — the
        # exclusion costs nothing at depth 1 (prev_shape still updates
        # below so depth 2 sees this bounce's hits).
        hit = do_intersect(scene, o, d)
    else:
        hit = do_intersect(scene, o, d, prev=prev_shape)

    miss = alive & ~hit.mask
    is_emissive = hit.kind == MaterialKind.EMISSIVE
    emit_hit = alive & hit.mask & is_emissive
    scatter = alive & hit.mask & ~is_emissive

    # Miss → background, weighted by throughput (scene.rs:168).
    bg = Vec3(scene.background[0], scene.background[1], scene.background[2])
    # Emissive → emit only when facing: (-n)·d > 0 (materials.rs:44-49).
    facing = dot(hit.normal, d) < 0.0
    emit_mask = emit_hit & facing
    emit_w = None  # MIS emission weight (physical mode); None = hard mask
    if lights is not None and physical:
        # Multiple importance sampling (balance heuristic): a BSDF hit of an
        # NEE light is weighted by pdf_b/(pdf_b + pdf_nee) instead of being
        # dropped outright — strictly lower variance than the hard split.
        from .nee import light_emission, nee_pdf_toward

        is_l = light_emission(lights, hit.shape)
        pdf_nee_prev = nee_pdf_toward(
            lights, o, hit.shape, d=d, t=hit.t, normal=prev_normal
        )
        w_b = prev_pdf / jnp.maximum(prev_pdf + pdf_nee_prev, 1e-20)
        emit_w = jnp.where(
            emit_mask,
            jnp.where(is_l & (prev_pdf > 0.0), w_b, 1.0),
            0.0,
        )
    elif lights is not None:
        # Reference transport: hard split — this light's direct term was
        # already added in full at the previous (diffuse) vertex.
        from .nee import light_emission

        emit_mask &= ~(suppress & light_emission(lights, hit.shape))

    def add_masked(acc, mask_a, va, mask_b, vb):
        return Vec3(
            acc.x + jnp.where(mask_a, va.x, 0.0) + jnp.where(mask_b, vb.x, 0.0),
            acc.y + jnp.where(mask_a, va.y, 0.0) + jnp.where(mask_b, vb.y, 0.0),
            acc.z + jnp.where(mask_a, va.z, 0.0) + jnp.where(mask_b, vb.z, 0.0),
        )

    if emit_w is not None:
        emis = tput.hadamard(hit.albedo)
        rad = Vec3(
            rad.x + jnp.where(miss, tput.x * bg.x, 0.0) + emis.x * emit_w,
            rad.y + jnp.where(miss, tput.y * bg.y, 0.0) + emis.y * emit_w,
            rad.z + jnp.where(miss, tput.z * bg.z, 0.0) + emis.z * emit_w,
        )
    else:
        rad = add_masked(
            rad, miss, tput.hadamard(bg), emit_mask, tput.hadamard(hit.albedo)
        )

    diffuse = scatter & (hit.kind == MaterialKind.MATTE)
    glossy = scatter & (hit.kind == MaterialKind.GLOSSY)
    # Physical glossy transport: normalized Phong f = ks·cs·(e+2)/(2π)·(r·w)^e
    # sampled from the cos^e lobe about the mirror direction r, whose TRUE
    # density is (e+1)/(2π)·(r·w)^e·(1+dup): the below-horizon flip
    # (brdf.rs:66-71) maps the lobe onto itself (it preserves r·w, the lobe
    # being symmetric about its own axis r), doubling the density wherever
    # the flipped counterpart 2(w·r)r − w lies below the surface horizon.
    mirror = reflect(d, hit.normal) if physical else None

    def glossy_lobe(wd):
        """(phong, pdf, dup) of the glossy sampling strategy at direction wd:
        phong = max(r·wd, 0)^e, the flip-corrected lobe density, and the
        flip-duplication indicator (1.0 where the flipped counterpart is
        below the horizon, else 0.0)."""
        rw = jnp.maximum(
            mirror.x * wd.x + mirror.y * wd.y + mirror.z * wd.z, 0.0
        )
        phong = jnp.power(rw, hit.exponent)
        flipped = Vec3(
            2.0 * rw * mirror.x - wd.x,
            2.0 * rw * mirror.y - wd.y,
            2.0 * rw * mirror.z - wd.z,
        )
        dup = jnp.where(dot(hit.normal, flipped) < 0.0, 1.0, 0.0)
        pdf = (hit.exponent + 1.0) * np.float32(0.5 / np.pi) * phong * (1.0 + dup)
        return phong, pdf, dup

    if lights is not None:
        # Next-event estimation at diffuse vertices: cone-sample one light,
        # trace a shadow ray, add the direct term (see ops/nee.py).
        #
        # The weight matches the REFERENCE's matte transport, not textbook
        # Lambertian: the reference draws uniform-hemisphere directions
        # (e=0.0 tables, sampling.rs:25-27) yet weights f·(n·wi)/pdf with
        # pdf = cosθ/π (brdf.rs:27-29), which cancels to a constant — its
        # matte estimator therefore integrates incident light WITHOUT
        # cosine foreshortening: L_direct = kd·cd · Ω/(2π) · L_e for a
        # light of solid angle Ω. Our BSDF walk reproduces that exactly
        # (pinned by the demo parity renders), so NEE must estimate the
        # same integral — hence weight/(2π), no cosθ, with the horizon
        # test standing in for the hemisphere's support.
        from .intersect import sphere_t
        from .nee import sample_light_dirs

        ux, uy, upick, nee_active = nee_samples
        # Partial-cone horizon clipping in BOTH transports: azimuths are
        # drawn from the above-horizon arc of each cone ring, weighted by
        # the arc fraction — strictly lower variance for lights straddling
        # the horizon. MIS mode (round 5): the reverse density at the NEXT
        # vertex evaluates the same clipped density via this vertex's
        # normal carried in PathState.prev_normal, so Σw = 1 holds with
        # the clipped density on both sides (ops/nee.py docstring; the
        # whole-cone compromise measured 2.25–4.7× worse at grazing
        # lights).
        ls = sample_light_dirs(
            lights, hit.point, ux, uy, upick, normal=hit.normal,
        )
        ldir, lweight, lidx, pdf_nee = ls.d, ls.weight, ls.sidx, ls.pdf
        cos_s = dot(hit.normal, ldir)
        # Shadow test. Strategies expose an any-hit primitive (`occluded`):
        # visibility only needs "any occluder before the light", so the
        # light's own ray-t is computed with the exact sphere_t rule the
        # sweep would use (triangle lights carry their sampled point's t
        # directly) and everything else is a cheap OR fold — about a third
        # less work per sphere than the nearest-hit sweep. Fallback
        # (plain intersect callables): nearest hit must BE the light.
        # The shadow ray originates ON hit.shape: give it the same exact
        # self-exclusion as the bounce ray (grazing light angles otherwise
        # read f32 self-hits as shadow acne). None when the caller opted
        # out of exclusion (legacy PathState without prev_shape).
        sh_origin = None if prev_shape is None else hit.shape
        occluded = getattr(do_intersect, "occluded", None)
        if occluded is not None:
            if scene.unit_d:
                a_sh = inv_a_sh = None  # cone dirs are unit by construction
            else:
                a_sh = dot(ldir, ldir)
                inv_a_sh = 1.0 / a_sh
            t_l, l_valid = sphere_t(
                hit.point, ldir, a_sh, inv_a_sh,
                ls.center.x, ls.center.y, ls.center.z, ls.radius,
            )
            if ls.tri_mask is not None:
                t_l = jnp.where(ls.tri_mask, ls.tri_t, t_l)
                # Bitwise select, not jnp.where: a where over i1 vectors
                # lowers through an i8 intermediate that Mosaic TPU cannot
                # truncate back (arith.trunci i8 -> i1 is unsupported).
                l_valid = (ls.tri_mask & (ls.tri_t > np.float32(T_MIN))) | (
                    ~ls.tri_mask & l_valid
                )
                # Triangle-light shadow rays stop a hair short of the light:
                # points sampled on the shared edge of a multi-triangle light
                # can otherwise be falsely occluded by the ADJACENT coplanar
                # light triangle (only the picked one is index-excluded, and
                # roundoff can put the neighbor's plane hit at t marginally
                # below t_l). Sphere lanes keep the exact t_l: the shared-edge
                # failure mode does not exist for spheres, and the relative
                # shrink would otherwise open a 1e-4·t_l light-leak gap that
                # grows with light distance.
                t_sh = jnp.where(
                    ls.tri_mask, t_l * np.float32(1.0 - 1e-4), t_l
                )
            else:
                t_sh = t_l
            lit = l_valid & ~occluded(
                scene, hit.point, ldir, t_sh, lidx, origin_idx=sh_origin
            )
        else:
            if sh_origin is None:
                shadow = do_intersect(scene, hit.point, ldir)
            else:
                shadow = do_intersect(scene, hit.point, ldir, prev=sh_origin)
            lit = shadow.mask & (shadow.shape == lidx)
        lit &= (cos_s > 0.0) & nee_active
        if physical:
            # NEE at diffuse AND glossy vertices, MIS-weighted against the
            # vertex's own BSDF strategy (balance heuristic). Matte: true
            # Lambertian f·cosθ with the cosine-lobe pdf. Glossy: normalized
            # Phong f·cosθ with the flip-corrected cos^e lobe pdf — this is
            # the firefly fix for strong small lights seen off glossy lobes.
            phong_l, pdf_g, _ = glossy_lobe(ldir)
            pdf_b = jnp.where(glossy, pdf_g, cos_s * np.float32(1.0 / np.pi))
            f_fac = jnp.where(
                glossy,
                (hit.exponent + 2.0) * np.float32(0.5 / np.pi) * phong_l,
                np.float32(1.0 / np.pi),
            )
            w_nee = pdf_nee / jnp.maximum(pdf_nee + pdf_b, 1e-20)
            fac = f_fac * cos_s * w_nee
            lit &= diffuse | glossy
        else:
            fac = np.float32(1.0 / (2.0 * np.pi))
            lit &= diffuse
        contrib = tput.hadamard(hit.albedo).hadamard(lweight) * fac
        rad = Vec3(
            rad.x + jnp.where(lit, contrib.x, 0.0),
            rad.y + jnp.where(lit, contrib.y, 0.0),
            rad.z + jnp.where(lit, contrib.z, 0.0),
        )
        suppress = diffuse
    elif suppress is not None:
        suppress = jnp.zeros_like(suppress)

    # Scatter: new direction + analytic throughput update.
    wi = sample_directions(hit.kind, hit.exponent, hit.normal, d, sx, sy, physical=physical)
    tput_fac = None
    if physical:
        # Physical glossy walk weight f·cosθ/pdf: the Phong powers cancel,
        # leaving (e+2)/(e+1) · cosθ / (1+dup) — applied with or without NEE
        # so the transport is estimator-independent. (Matte and perfect-
        # specular cancellations stay exactly 1; see ops/brdf.py.)
        phong_i, pdf_gi, dup_i = glossy_lobe(wi)
        cos_i = jnp.maximum(dot(hit.normal, wi), 0.0)
        tput_fac = jnp.where(
            glossy,
            (hit.exponent + 2.0) / (hit.exponent + 1.0) * cos_i / (1.0 + dup_i),
            1.0,
        )
        if lights is not None:
            # The MIS counterweight for the next bounce: the sampling pdf of
            # the chosen direction at diffuse/glossy vertices, 0 elsewhere
            # (camera, perfect specular — no light-sampling alternative at a
            # delta lobe).
            prev_pdf = jnp.where(
                glossy,
                pdf_gi,
                jnp.where(diffuse, cos_i * np.float32(1.0 / np.pi), 0.0),
            )
    elif prev_pdf is not None:
        prev_pdf = jnp.zeros_like(prev_pdf)
    new_tput = tput.hadamard(hit.albedo)
    if tput_fac is not None:
        new_tput = new_tput * tput_fac
    tput = vwhere(scatter, new_tput, tput)
    o = vwhere(scatter, hit.point, o)
    d = vwhere(scatter, wi, d)
    if prev_shape is not None:
        # Dead lanes keep their stale index (they never intersect again).
        prev_shape = jnp.where(scatter, hit.shape, prev_shape)
    if prev_normal is not None:
        prev_normal = vwhere(scatter, hit.normal, prev_normal)

    return PathState(
        o=o, d=d, throughput=tput, radiance=rad, alive=scatter, suppress=suppress,
        prev_pdf=prev_pdf, prev_shape=prev_shape, prev_normal=prev_normal,
    )
