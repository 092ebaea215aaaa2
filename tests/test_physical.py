"""Physical Lambertian transport (--physical).

The reference's matte estimator is non-physical: it draws
uniform-hemisphere bounce directions (e=0.0 tables, sampling.rs:25-27) but
weights with a cosine pdf (brdf.rs:27-29), dropping cosine foreshortening.
The default reproduces that for parity; ``physical=True`` fixes it —
cosine-weighted matte sampling plus the cosine NEE weight. These tests pin
internal consistency (physical BSDF == physical NEE), the closed-form
furnace value, and that the two transports really differ where they should.
"""

import numpy as np
import pytest

from flux_tpu.render import Renderer
from tests.test_nee import light_scene


def _img(sd, root, *, nee=False, physical=False, seed=0, depth=3):
    r = Renderer(sd, sample_root=root, max_depth=depth, seed=seed,
                 nee=nee, physical=physical, target_lanes=1 << 18)
    return r.render_rows(0, sd.output_settings.image_height)


def test_physical_nee_matches_physical_bsdf():
    sd = light_scene()
    a = _img(sd, root=8, nee=True, physical=True)
    b = _img(sd, root=64, nee=False, physical=True)
    assert np.abs(a - b).mean() < 0.015
    assert abs(float(a.mean()) - float(b.mean())) < 0.01


def test_physical_differs_from_reference_transport():
    # A small light off the normal direction: the cosine term matters, so
    # the two transports must disagree visibly on the lit floor.
    sd = light_scene(light_radius=0.3, power=80.0)
    ref = _img(sd, root=16, nee=True, physical=False)
    phy = _img(sd, root=16, nee=True, physical=True)
    assert np.abs(ref - phy).mean() > 0.005


def test_furnace_constant_env_is_transport_invariant():
    # Under a constant environment the cosine-free and cosine-weighted
    # estimators integrate to the same value (both equal albedo x L), so a
    # furnace-like scene must agree across transports.
    from dataclasses import replace

    from tests.test_render import env_sphere, make_scene
    from flux_tpu.scene import MaterialData, MaterialKind, PlaneData

    floor = PlaneData(
        point=(0.0, 0.0, 0.0),
        normal=(0.0, 1.0, 0.0),
        material=MaterialData(kind=MaterialKind.MATTE, color=(0.5, 0.5, 0.5), param=1.0),
    )
    sd = make_scene([env_sphere(1.0), floor], w=16, h=12)
    a = _img(sd, root=16, physical=False, depth=2)
    b = _img(sd, root=16, physical=True, depth=2)
    # Equal in expectation; MC noise only.
    assert abs(float(a.mean()) - float(b.mean())) < 0.01


def _furnace_scene(rho=0.6, L=1.0):
    from tests.test_render import make_scene
    from flux_tpu.scene import MaterialData, MaterialKind, SphereData

    env = SphereData(
        center=(0.0, 0.0, 0.0),
        radius=100.0,
        material=MaterialData(
            kind=MaterialKind.EMISSIVE, color=(1.0, 1.0, 1.0), param=L
        ),
        invert=True,
    )
    ball = SphereData(
        center=(0.0, 1.0, 0.0),  # on the camera axis; fills the narrow FOV
        radius=2.0,
        material=MaterialData(
            kind=MaterialKind.MATTE, color=(rho, rho, rho), param=1.0
        ),
    )
    return make_scene([env, ball], w=16, h=12)


def test_furnace_convex_sphere_exact():
    """The sharp furnace: a CONVEX matte sphere filling the frame under a
    constant environment. Every bounce direction escapes (convexity ⇒ no
    self-rehit), so each sample is exactly albedo × L with ZERO variance in
    both transports — physical (f·cosθ/pdf ≡ ρ by the cosine-lobe
    cancellation) and reference (the cosine-free constant-weight estimator,
    brdf.rs:27-29 against uniform directions). Any normalization slip in
    either estimator (a stray π, a lost 1/2π, a flipped pdf) shifts this
    value deterministically — no MC tolerance to hide behind.

    BOTH transports are exact on EVERY pixel: the prev-shape self-hit
    exclusion (ops/intersect.sphere_t ``on_self``) removes the grazing-ray
    f32 false re-hits that reference mode's uniform hemisphere draws used
    to take at ~1 sample in 10³ (cosθ ≲ 1e-3, where the f32 noise in
    c = |o−C|²−R² crosses T_MIN; the reference's f64 noise never does,
    shapes.rs:176-211). test_furnace_legacy_no_exclusion_shows_f32_rehits
    keeps the un-excluded path's failure measurable; the oracle test pins
    the f64 ground truth on the identical sample stream."""
    rho, L = 0.6, 1.0
    sd = _furnace_scene(rho, L)

    img = _img(sd, root=4, physical=True, depth=2)
    np.testing.assert_allclose(img, rho * L, rtol=0, atol=5e-5)

    ref = _img(sd, root=4, physical=False, depth=2)
    np.testing.assert_allclose(ref, rho * L, rtol=0, atol=5e-5)


def test_furnace_legacy_no_exclusion_shows_f32_rehits():
    """Opting OUT of the prev-shape exclusion (a PathState without
    prev_shape) reproduces the f32 grazing self-re-hit: rare deviating
    pixels, each bounded by one lost sample. Pins that the exclusion is
    doing real work — if this ever passes exactly, either the ulp
    behavior changed or the legacy path quietly gained the fix."""
    import jax.numpy as jnp

    from flux_tpu.camera import camera_arrays, primary_rays
    from flux_tpu.ops.shade import PathState, bounce
    from flux_tpu.samplers.hash import hash_combine
    from flux_tpu.samplers.patterns import bounce_point, cmj_point
    from flux_tpu.samplers.warps import to_poisson_disc
    from flux_tpu.scene import compile_scene
    from flux_tpu.constants import SALT_AA, SALT_BOUNCE, SALT_LENS
    from flux_tpu.vec import Vec3

    rho, L = 0.6, 1.0
    spp = 16
    sd = _furnace_scene(rho, L)
    sc = compile_scene(sd)
    cam = camera_arrays(sd.camera_settings, sd.camera_data,
                        sd.output_settings.pixel_size)
    w, h, root = 16, 12, 4
    s_idx = jnp.arange(spp, dtype=jnp.uint32)[:, None, None]
    row = jnp.arange(h, dtype=jnp.int32)[None, :, None]
    col = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    pixel_base = hash_combine(jnp.uint32(0), row, col)
    ax, ay = cmj_point(s_idx, root, hash_combine(pixel_base, SALT_AA))
    ux, uy = cmj_point(s_idx, root, hash_combine(pixel_base, SALT_LENS))
    lx, ly = to_poisson_disc(ux, uy)
    o, d = primary_rays(cam, row, col, w, h, ax, ay, lx, ly)
    shape = (spp, h, w)
    full = lambda v: Vec3(*(jnp.broadcast_to(c, shape) for c in (v.x, v.y, v.z)))
    ones = jnp.ones(shape, jnp.float32)
    zeros = jnp.zeros(shape, jnp.float32)
    st = PathState(
        o=full(o), d=full(d), throughput=Vec3(ones, ones, ones),
        radiance=Vec3(zeros, zeros, zeros), alive=jnp.ones(shape, bool),
    )  # prev_shape=None: the legacy, exclusion-free walk
    for depth in (1, 2):
        pat = hash_combine(pixel_base, SALT_BOUNCE, np.uint32(depth))
        bx, by = bounce_point(s_idx, root, pat, depth)
        st = bounce(sc, st, bx, by)
    img = np.asarray(
        jnp.stack([st.radiance.x, st.radiance.y, st.radiance.z], -1).mean(0)
    )
    err = np.abs(img - rho * L)
    assert err.max() > 5e-5, "legacy path no longer shows the f32 re-hit"
    assert (err > 5e-5).mean() < 0.02, "more than rare grazing deviations"
    assert err.max() <= rho * L / spp + 5e-5, "deviation exceeds one sample"


def test_furnace_oracle_exact_in_f64():
    """The f64 oracle renders the furnace exactly in BOTH transports on the
    bitwise-identical sample stream — isolating the reference-mode f32
    deviation above to arithmetic precision (the class of error the oracle
    exists to audit), not to a different Monte Carlo estimate."""
    from flux_tpu.oracle import oracle_render

    rho, L = 0.6, 1.0
    sd = _furnace_scene(rho, L)
    for physical in (False, True):
        img = oracle_render(sd, sample_root=4, max_depth=2, seed=0,
                            physical=physical)
        np.testing.assert_allclose(
            img, rho * L, rtol=0, atol=1e-12, err_msg=f"physical={physical}"
        )


def test_physical_travels_in_job_config():
    from flux_tpu.job import Job, JobConfiguration, JobIDAllocator
    from flux_tpu.workers import default_renderer_factory

    cfg = JobConfiguration(
        sample_root=2, max_trace_depth=2, rows_per_work_unit=8, physical=True
    )
    job = Job(id=JobIDAllocator().next_id(), scene_data=light_scene(), config=cfg)
    r = default_renderer_factory(Job.from_dict(job.to_dict()))
    assert r.physical


def test_kernel_physical_matches_xla():
    from flux_tpu.camera import camera_arrays
    from flux_tpu.ops.nee import extract_lights
    from flux_tpu.ops.pallas_kernel import render_block_pallas
    from flux_tpu.render import render_block_impl
    from flux_tpu.scene import compile_scene

    sd = light_scene()
    sc = compile_scene(sd)
    cam = camera_arrays(sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size)
    lights = extract_lights(sd)
    kw = dict(img_w=32, img_h=24, n_rows=24, n_samples=4, root=2, max_depth=3,
              lights=lights, physical=True)
    a = np.asarray(render_block_pallas(
        sc, cam, np.int32(0), np.uint32(0), np.uint32(0), interpret=True, **kw))
    b = np.asarray(render_block_impl(
        sc, cam, np.int32(0), np.uint32(0), np.uint32(0), **kw))
    assert (np.abs(a - b) > 1e-5).mean() < 0.01


def test_mesh_physical_matches_single_device(devices8):
    from flux_tpu.parallel import MeshRenderer, make_mesh

    sd = light_scene()
    mr = MeshRenderer(
        sd, sample_root=4, max_depth=3, seed=0, nee=True, physical=True,
        mesh=make_mesh(devices8, rows_shards=2), target_lanes=1 << 16,
    )
    out = mr.render_rows(0, sd.output_settings.image_height)
    single = _img(sd, root=4, nee=True, physical=True)
    np.testing.assert_allclose(out, single, rtol=2e-5, atol=2e-5)


class TestMIS:
    """Physical+NEE uses multiple importance sampling (balance heuristic):
    BSDF hits of NEE lights are down-weighted instead of dropped, and the
    NEE term carries the complementary weight. Unbiasedness: MIS must
    converge to the pure-BSDF physical image; efficiency: at equal spp its
    error must not exceed either pure strategy's by more than noise."""

    def test_mis_unbiased_vs_pure_bsdf(self):
        sd = light_scene()
        mis = _img(sd, root=12, nee=True, physical=True)
        pure = _img(sd, root=64, nee=False, physical=True)
        assert np.abs(mis - pure).mean() < 0.015
        assert abs(float(mis.mean()) - float(pure.mean())) < 0.008

    @pytest.mark.parametrize("radius,power", [(0.15, 250.0), (1.5, 3.0)])
    def test_mis_error_not_worse_than_pure_strategies(self, radius, power):
        # Small light: NEE dominates; large light: BSDF is competitive.
        # MIS must track the better strategy in both regimes.
        sd = light_scene(light_radius=radius, power=power)
        truth = _img(sd, root=48, nee=True, physical=True)
        def mse(**kw):
            img = _img(sd, root=4, seed=11, **kw)
            return float(((img - truth) ** 2).mean())
        m_mis = mse(nee=True, physical=True)
        m_bsdf = mse(nee=False, physical=True)
        # Not worse than pure BSDF sampling by more than sampling noise.
        assert m_mis < 1.5 * m_bsdf, (m_mis, m_bsdf)


def glossy_light_scene(w=32, h=24, exponent=16.0, light_radius=0.25, power=120.0):
    """Glossy floor + glossy ball under one small bright light: the firefly
    regime for pure-BSDF glossy transport. Moderate exponent so both the
    light-sampling and lobe-sampling strategies contribute."""
    from flux_tpu.scene import (
        CameraData, CameraSettings, MaterialData, MaterialKind,
        OutputSettings, PlaneData, SceneData, SphereData,
    )

    shapes = (
        SphereData(
            center=(0.0, 3.0, 0.0),
            radius=light_radius,
            material=MaterialData(
                kind=MaterialKind.EMISSIVE, color=(1.0, 0.95, 0.9), param=power
            ),
        ),
        SphereData(
            center=(0.8, 0.5, 0.0),
            radius=0.5,
            material=MaterialData(
                kind=MaterialKind.GLOSSY, color=(0.7, 0.5, 0.3), param=0.9,
                exponent=exponent,
            ),
        ),
        PlaneData(
            point=(0.0, 0.0, 0.0),
            normal=(0.0, 1.0, 0.0),
            material=MaterialData(
                kind=MaterialKind.GLOSSY, color=(0.6, 0.6, 0.65), param=0.8,
                exponent=exponent,
            ),
        ),
    )
    return SceneData(
        scene_name="glossymis",
        output_settings=OutputSettings(image_width=w, image_height=h, pixel_size=16.0),
        background=(0.0, 0.0, 0.0),
        shapes=shapes,
        camera_settings=CameraSettings(
            eye=(0.0, 2.0, 7.0), look_at=(0.0, 1.0, 0.0), up=(0.0, 1.0, 0.0)
        ),
        camera_data=CameraData(
            zoom_factor=1.0, view_plane_distance=500.0,
            focal_distance=500.0, lens_radius=0.0,
        ),
    )


class TestGlossyMIS:
    """Physical mode runs NEE (with MIS) at glossy vertices too, using the
    normalized-Phong BRDF and the flip-corrected cos^e lobe pdf — the fix
    for fireflies from strong small lights seen off glossy lobes."""

    def test_glossy_mis_unbiased_vs_pure_bsdf(self):
        sd = glossy_light_scene()
        mis = _img(sd, root=16, nee=True, physical=True)
        pure = _img(sd, root=90, nee=False, physical=True, seed=3)
        assert np.abs(mis - pure).mean() < 0.02, np.abs(mis - pure).mean()
        assert abs(float(mis.mean()) - float(pure.mean())) < 0.01

    def test_glossy_mis_kills_fireflies(self):
        # At low spp the pure-BSDF glossy image has rare huge-luminance
        # outliers (lobe samples that happen to hit the small light); MIS
        # re-weights them down and adds the low-variance NEE term instead.
        sd = glossy_light_scene(exponent=64.0, light_radius=0.12, power=500.0)
        truth = _img(sd, root=64, nee=True, physical=True)
        def p99_err(**kw):
            img = _img(sd, root=4, seed=7, **kw)
            return float(np.percentile(np.abs(img - truth), 99.5))
        assert p99_err(nee=True, physical=True) < p99_err(nee=False, physical=True)

    def test_glossy_mis_kernel_parity(self):
        from flux_tpu.camera import camera_arrays
        from flux_tpu.ops.nee import extract_lights
        from flux_tpu.ops.pallas_kernel import render_block_pallas
        from flux_tpu.render import render_block_impl
        from flux_tpu.scene import compile_scene

        sd = glossy_light_scene()
        sc = compile_scene(sd)
        cam = camera_arrays(
            sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
        )
        lights = extract_lights(sd)
        kw = dict(img_w=32, img_h=24, n_rows=24, n_samples=4, root=2, max_depth=3,
                  lights=lights, physical=True)
        a = np.asarray(render_block_pallas(
            sc, cam, np.int32(0), np.uint32(0), np.uint32(0), interpret=True, **kw))
        b = np.asarray(render_block_impl(
            sc, cam, np.int32(0), np.uint32(0), np.uint32(0), **kw))
        assert (np.abs(a - b) > 1e-5).mean() < 0.01

    def test_reference_transport_glossy_untouched(self):
        # Non-physical NEE must keep glossy vertices on pure BSDF sampling
        # (the reference-compatible estimator has no pdf to balance), so the
        # non-physical image is identical with and without this feature —
        # pinned by comparing against a matte-only NEE scene's invariance:
        # glossy lanes contribute NO direct-light term.
        sd = glossy_light_scene()
        ref_nee = _img(sd, root=24, nee=True, physical=False)
        ref_bsdf = _img(sd, root=90, nee=False, physical=False, seed=5)
        # Both reference-transport estimators still agree (unbiasedness of
        # the hard split with glossy excluded).
        assert np.abs(ref_nee - ref_bsdf).mean() < 0.02
