"""f64 oracle tests: sampler bit-parity and f32-vs-f64 precision audits.

The oracle (flux_tpu/oracle.py) is the precision escape hatch: same sample
streams as the production f32 path, every float op in f64. These tests pin
(a) that the streams really are bit-identical, and (b) that the f32 path
sits at Monte-Carlo-noise distance from f64 truth on representative AND
adversarial (extreme-exponent, deep-recursion) scenes — the audit that
round 1 could only argue statistically against the reference's one PNG.
"""

import numpy as np

from flux_tpu import oracle
from flux_tpu.oracle import oracle_render, precision_audit
from flux_tpu.scene import (
    MaterialData,
    MaterialKind,
    PlaneData,
    SphereData,
)

from tests.test_render import env_sphere, make_scene


def test_sampler_streams_bit_identical():
    """The oracle's uint32 hashing must equal the JAX samplers bit for bit
    (that is what makes an audit measure precision, not estimator drift)."""
    from flux_tpu.samplers.hash import hash_combine, permute_pow2, randfloat

    idx = np.arange(4096, dtype=np.uint32)
    pats = np.arange(4096, dtype=np.uint32) * np.uint32(2654435761)

    np.testing.assert_array_equal(
        np.asarray(hash_combine(idx, 0x1234, pats)),
        oracle._hash_combine(idx, 0x1234, pats),
    )
    np.testing.assert_array_equal(
        np.asarray(permute_pow2(idx, 64, pats)),
        oracle._permute_pow2(idx, 64, pats),
    )
    # randfloat: the f32 value is exactly representable in f64.
    np.testing.assert_array_equal(
        np.asarray(randfloat(idx, pats), np.float64),
        oracle._randfloat(idx, pats),
    )


def test_pattern_points_match_f32_within_rounding():
    """CMJ points differ only by the final f64-vs-f32 divisions (≤ 2 ulp)."""
    from flux_tpu.samplers.patterns import cmj_point

    s = np.arange(256, dtype=np.uint32)
    x32, y32 = (np.asarray(v, np.float64) for v in cmj_point(s, 16, 0xABCD))
    x64, y64 = oracle._cmj_point(s, 16, 0xABCD)
    np.testing.assert_allclose(x32, x64, atol=4e-7)
    np.testing.assert_allclose(y32, y64, atol=4e-7)


def _audit(sd, root=8, depth=5, seed=1, **kw):
    return precision_audit(sd, root, depth, seed=seed, **kw)


def test_oracle_background_exact():
    img = oracle_render(make_scene([], background=(0.25, 0.5, 0.75)), 2, 2)
    expect = np.broadcast_to(np.array([0.25, 0.5, 0.75]), img.shape)
    np.testing.assert_allclose(img, expect, atol=0)


def test_f32_matches_f64_oracle_core_scene():
    """Matte + mirror + glossy + emissive + plane: the f32 path must sit at
    MC-noise distance from f64 truth (a precision cliff would blow the mean
    by orders of magnitude, not fractions of it)."""
    shapes = [
        env_sphere(1.0),
        SphereData(
            center=(-1.2, 1.0, 0.0),
            radius=0.9,
            material=MaterialData(
                kind=MaterialKind.MATTE, color=(0.7, 0.3, 0.2), param=1.0
            ),
        ),
        SphereData(
            center=(1.2, 1.0, 0.0),
            radius=0.9,
            material=MaterialData(
                kind=MaterialKind.GLOSSY, color=(0.9, 0.9, 0.9), param=0.8,
                exponent=50.0,
            ),
        ),
        SphereData(
            center=(0.0, 2.4, 1.0),
            radius=0.7,
            material=MaterialData(
                kind=MaterialKind.REFLECTIVE, color=(0.95, 0.95, 0.95), param=0.9
            ),
        ),
        PlaneData(
            point=(0.0, 0.0, 0.0),
            normal=(0.0, 1.0, 0.0),
            material=MaterialData(
                kind=MaterialKind.MATTE, color=(0.4, 0.4, 0.45), param=1.0
            ),
        ),
    ]
    rep = _audit(make_scene(shapes, w=24, h=18))
    # Borderline branch flips at 64 spp dominate the tail; the mean pins
    # the precision story.
    assert rep["mean_abs_diff"] < 5e-3, rep
    assert abs(rep["f32_mean"] - rep["f64_mean"]) < 2e-3, rep


def test_extreme_exponent_no_f32_cliff():
    """Phong exponent 1e5 (demo1's mirror-like glossy): the analytic
    f·cos/pdf cancellation must keep f32 at noise level even where the
    literal f/pdf ratio would be 0/0 (see ops/brdf.py docstring)."""
    shapes = [
        env_sphere(1.0),
        SphereData(
            center=(0.0, 1.0, 0.0),
            radius=1.2,
            material=MaterialData(
                kind=MaterialKind.GLOSSY, color=(0.9, 0.85, 0.8), param=0.9,
                exponent=1e5,
            ),
        ),
    ]
    rep = _audit(make_scene(shapes, w=24, h=18))
    assert rep["mean_abs_diff"] < 5e-3, rep
    assert abs(rep["f32_mean"] - rep["f64_mean"]) < 2e-3, rep


def test_deep_recursion_no_f32_drift():
    """Two facing mirrors walk 16 bounces; throughput products must not
    drift: f32 vs f64 stays at noise level at depth 16."""
    shapes = [
        env_sphere(0.8),
        SphereData(
            center=(0.0, 1.0, 2.6),
            radius=1.0,
            material=MaterialData(
                kind=MaterialKind.REFLECTIVE, color=(0.97, 0.96, 0.95),
                param=0.95,
            ),
        ),
        SphereData(
            center=(0.0, 1.0, -2.6),
            radius=1.0,
            material=MaterialData(
                kind=MaterialKind.REFLECTIVE, color=(0.95, 0.96, 0.97),
                param=0.95,
            ),
        ),
    ]
    rep = _audit(make_scene(shapes, w=16, h=12), root=4, depth=16)
    assert rep["mean_abs_diff"] < 5e-3, rep


def test_oracle_physical_mode():
    """Physical transport (cosine matte + normalized Phong) audits clean."""
    shapes = [
        env_sphere(1.0),
        SphereData(
            center=(0.0, 1.0, 0.0),
            radius=1.0,
            material=MaterialData(
                kind=MaterialKind.GLOSSY, color=(0.8, 0.8, 0.85), param=0.9,
                exponent=25.0,
            ),
        ),
        PlaneData(
            point=(0.0, 0.0, 0.0),
            normal=(0.0, 1.0, 0.0),
            material=MaterialData(
                kind=MaterialKind.MATTE, color=(0.5, 0.45, 0.4), param=1.0
            ),
        ),
    ]
    rep = _audit(make_scene(shapes, w=16, h=12), root=6, physical=True)
    assert rep["mean_abs_diff"] < 5e-3, rep


def test_oracle_nee_reference_transport():
    """The NEE estimator (power-proportional pick, partial-cone clipping,
    shadow sweep, hard-split suppression) audits clean against its f64
    mirror on bit-identical streams — covering precision of the direct-
    light arm itself, not just its statistical unbiasedness."""
    from tests.test_nee import light_scene

    rep = _audit(light_scene(), root=4, depth=3, seed=0, nee=True)
    assert rep["mean_abs_diff"] < 1e-4, rep
    assert abs(rep["f32_mean"] - rep["f64_mean"]) < 1e-4, rep


def test_oracle_nee_mis_mixed_lights():
    """MIS (physical+NEE) on a MIXED sphere+triangle light set: the
    balance-heuristic weights, triangle area-sampling densities (incl. the
    pdf_tri back-face zeroing), the tri-light shadow shrink, and the
    sphere-lane exact shadow t_l are all exercised on bit-identical
    streams. Any weight asymmetry between the forward and reverse density
    forms shows up as estimator drift here, not as f32 rounding."""
    from tests.test_nee import tri_light_scene

    sd = tri_light_scene(sphere_light=True)
    for physical in (False, True):
        rep = _audit(sd, root=4, depth=3, seed=0, nee=True, physical=physical)
        # Borderline-branch flips (occlusion edges) can cost a whole
        # sample on isolated pixels; the mean pins the precision story.
        assert rep["mean_abs_diff"] < 5e-4, (physical, rep)
        assert abs(rep["f32_mean"] - rep["f64_mean"]) < 2e-4, (physical, rep)


def test_oracle_nee_unbiased_in_f64():
    """f64-vs-f64: the oracle's own NEE estimator converges to the oracle's
    plain BSDF walk — a pure-f64 unbiasedness pin with no f32 noise floor,
    closing the loop the f32-only statistical tests can't."""
    from tests.test_nee import light_scene

    sd = light_scene(w=16, h=12)
    a = oracle_render(sd, 8, 3, seed=0, nee=True)
    b = oracle_render(sd, 40, 3, seed=1, nee=False)
    assert np.abs(a - b).mean() < 0.02
    assert abs(float(a.mean()) - float(b.mean())) < 0.01


def test_oracle_triangles():
    """Triangle geometry audits clean: the f64 Möller–Trumbore sweep mirrors
    ops/intersect.triangle_t (double-sided, NaN-rejection, plane-style
    authored normal) and the f32 path tracks it to f32 rounding."""
    from flux_tpu.scene import TriangleData

    shapes = [
        env_sphere(1.0),
        PlaneData(
            point=(0.0, 0.0, 0.0),
            normal=(0.0, 1.0, 0.0),
            material=MaterialData(
                kind=MaterialKind.MATTE, color=(0.6, 0.6, 0.6), param=1.0
            ),
        ),
        TriangleData(
            v0=(-1.0, 0.2, 0.5), v1=(1.0, 0.2, 0.5), v2=(0.0, 1.8, 0.5),
            material=MaterialData(
                kind=MaterialKind.MATTE, color=(0.7, 0.3, 0.3), param=1.0
            ),
        ),
        TriangleData(  # emissive triangle, facing-only emission
            v0=(2.0, 0.2, 1.0), v1=(3.0, 0.2, 1.0), v2=(2.5, 1.2, 1.0),
            material=MaterialData(
                kind=MaterialKind.EMISSIVE, color=(0.2, 0.9, 1.0), param=3.0
            ),
        ),
    ]
    rep = _audit(make_scene(shapes, w=16, h=12), root=4)
    assert rep["mean_abs_diff"] < 5e-3, rep
