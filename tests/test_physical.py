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
