"""Next-event estimation: unbiasedness and variance reduction.

NEE is an opt-in estimator change (the reference finds lights only by
random walk, materials.rs:13-34); both estimators must converge to the
same image, with NEE far less noisy on small area lights.
"""

import numpy as np
import pytest

from flux_tpu.checkpoint import ProgressiveRenderer
from flux_tpu.ops.nee import extract_lights
from flux_tpu.render import Renderer
from flux_tpu.scene import (
    CameraData,
    CameraSettings,
    MaterialData,
    MaterialKind,
    OutputSettings,
    PlaneData,
    SceneData,
    SphereData,
)


def light_scene(w=32, h=24, light_radius=0.4, power=40.0):
    """Matte floor + matte ball lit by one small emissive sphere, black
    background — direct lighting dominates, the NEE showcase. The light is
    in view so camera-visible emission is exercised too."""
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
                kind=MaterialKind.MATTE, color=(0.7, 0.3, 0.3), param=1.0
            ),
        ),
        PlaneData(
            point=(0.0, 0.0, 0.0),
            normal=(0.0, 1.0, 0.0),
            material=MaterialData(
                kind=MaterialKind.MATTE, color=(0.6, 0.6, 0.6), param=1.0
            ),
        ),
    )
    return SceneData(
        scene_name="neetest",
        output_settings=OutputSettings(image_width=w, image_height=h, pixel_size=16.0),
        background=(0.0, 0.0, 0.0),
        shapes=shapes,
        camera_settings=CameraSettings(
            eye=(0.0, 2.0, 7.0), look_at=(0.0, 1.0, 0.0), up=(0.0, 1.0, 0.0)
        ),
        camera_data=CameraData(
            zoom_factor=1.0,
            view_plane_distance=400.0,
            focal_distance=7.0,
            lens_radius=0.0,
        ),
    )


def _mean_image(sd, root, nee, seed=0, depth=3):
    r = Renderer(sd, sample_root=root, max_depth=depth, seed=seed, nee=nee,
                 target_lanes=1 << 18)
    return r.render_rows(0, sd.output_settings.image_height)


class TestLightExtraction:
    def test_extracts_only_noninverted_emissive_spheres(self):
        sd = light_scene()
        lights = extract_lights(sd)
        assert lights is not None and lights.num_lights == 1
        assert float(lights.radius[0]) == pytest.approx(0.4)
        assert int(lights.shape_idx[0]) == 0

    def test_env_sphere_excluded(self):
        from flux_tpu.scene import loads_scene

        with open("scenes/demo1.yml") as f:
            sd = loads_scene(f.read())
        lights = extract_lights(sd)
        # demo1's only emissive sphere is the inverted env sphere.
        assert lights is None

    def test_demo2_has_one_area_light(self):
        from flux_tpu.scene import load_scene

        lights = extract_lights(load_scene("scenes/demo2.yml"))
        assert lights is not None and lights.num_lights == 1

    def test_no_lights_disables_nee(self):
        from flux_tpu.scene import load_scene

        r = Renderer(load_scene("scenes/demo1.yml"), 2, 2, nee=True)
        assert not r.nee and r.lights is None


class TestUnbiasedness:
    def test_nee_converges_to_bsdf_image(self):
        sd = light_scene()
        # NEE at modest spp vs brute-force BSDF sampling at high spp.
        nee_img = _mean_image(sd, root=8, nee=True)
        ref_img = _mean_image(sd, root=64, nee=False)
        # Direct-lit matte scene: NEE@64spp is near-converged; the 4096spp
        # BSDF reference still carries MC noise, hence the tolerance.
        assert np.abs(nee_img - ref_img).mean() < 0.015
        assert np.abs(nee_img.mean() - ref_img.mean()) < 0.01

    def test_camera_visible_light_not_suppressed(self):
        sd = light_scene()
        img = _mean_image(sd, root=4, nee=True)
        # The light sits at image-space top center; its pixels must be
        # saturated (direct camera hit, never NEE-suppressed).
        h, w = img.shape[:2]
        top = img[: h // 4].reshape(-1, 3).max(axis=0)
        assert (top > 0.9).all()


class TestVarianceReduction:
    def test_nee_cuts_error_at_equal_spp(self):
        # Small, harsh light: BSDF sampling rarely finds it; NEE always does.
        sd = light_scene(light_radius=0.15, power=250.0)
        truth = _mean_image(sd, root=32, nee=True)  # near-converged
        mse = {}
        for nee in (False, True):
            img = _mean_image(sd, root=4, nee=nee, seed=9)  # 16 spp
            mse[nee] = float(((img - truth) ** 2).mean())
        # NEE at 16 spp should beat BSDF sampling by a wide margin.
        assert mse[True] < 0.25 * mse[False], mse


class TestMeshAndCheckpoint:
    def test_mesh_nee_matches_single_device(self):
        import jax

        from flux_tpu.parallel import MeshRenderer, make_mesh

        sd = light_scene()
        mr = MeshRenderer(
            sd, sample_root=4, max_depth=3, seed=0, nee=True,
            mesh=make_mesh(jax.devices()[:8], rows_shards=2),
            target_lanes=1 << 16,
        )
        assert mr.nee and mr.backend == "xla"
        out = mr.render_rows(0, sd.output_settings.image_height)
        single = _mean_image(sd, root=4, nee=True)
        np.testing.assert_allclose(out, single, rtol=2e-5, atol=2e-5)

    def test_mesh_tri_light_nee_matches_single_device(self):
        # Triangle lights ride the same LightArrays pytree through
        # shard_map; the mesh render must match the single-device one.
        import jax

        from flux_tpu.parallel import MeshRenderer, make_mesh

        sd = tri_light_scene(sphere_light=True)
        mr = MeshRenderer(
            sd, sample_root=4, max_depth=3, seed=0, nee=True,
            mesh=make_mesh(jax.devices()[:8], rows_shards=2),
            target_lanes=1 << 16,
        )
        assert mr.lights is not None and mr.lights.has_tris
        out = mr.render_rows(0, sd.output_settings.image_height)
        single = _mean_image(sd, root=4, nee=True)
        np.testing.assert_allclose(out, single, rtol=2e-5, atol=2e-5)

    def test_checkpoint_fingerprint_includes_nee(self, tmp_path):
        sd = light_scene()
        a = ProgressiveRenderer(sd, sample_root=2, max_depth=2, seed=1, nee=True,
                                target_lanes=1 << 16)
        a.render_pass(2)
        p = str(tmp_path / "x.npz")
        a.save(p)
        b = ProgressiveRenderer(sd, sample_root=2, max_depth=2, seed=1, nee=False,
                                target_lanes=1 << 16)
        with pytest.raises(ValueError):
            b.resume(p)


class TestDepthTruncationParity:
    def test_nee_respects_depth_cap(self):
        # At depth=1 the BSDF walk collects only camera-visible emission;
        # NEE must not smuggle in the depth-2 direct term.
        sd = light_scene()
        a = _mean_image(sd, root=8, nee=True, depth=1)
        b = _mean_image(sd, root=8, nee=False, depth=1)
        np.testing.assert_allclose(a, b, atol=1e-6)


class TestKernelNEE:
    def test_megakernel_nee_matches_xla(self):
        from flux_tpu.camera import camera_arrays
        from flux_tpu.ops.pallas_kernel import render_block_pallas
        from flux_tpu.render import render_block_impl
        from flux_tpu.scene import compile_scene

        sd = light_scene()
        sc = compile_scene(sd)
        cam = camera_arrays(
            sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
        )
        lights = extract_lights(sd)
        kw = dict(img_w=32, img_h=24, n_rows=24, n_samples=4, root=2, max_depth=3)
        a = np.asarray(
            render_block_pallas(
                sc, cam, np.int32(0), np.uint32(0), np.uint32(0),
                lights=lights, interpret=True, **kw,
            )
        )
        b = np.asarray(
            render_block_impl(
                sc, cam, np.int32(0), np.uint32(0), np.uint32(0), lights=lights, **kw
            )
        )
        assert (np.abs(a - b) > 1e-5).mean() < 0.01

    def test_pallas_backend_accepts_nee(self):
        # Construction must not reject pallas+nee (the megakernel implements
        # NEE); rendering on CPU would be interpret-slow, so only construct.
        sd = light_scene()
        r = Renderer(sd, 2, 2, nee=True, backend="pallas")
        assert r.nee and r.lights is not None and r.backend == "pallas"

        from flux_tpu.parallel import MeshRenderer

        mr = MeshRenderer(sd, 2, 2, nee=True, backend="pallas", rows_shards=1)
        assert mr.nee and mr.backend == "pallas"


class TestMultiLight:
    def test_many_lights_converge(self):
        # Several area lights: the uniform light pick must stay unbiased.
        from dataclasses import replace

        sd = light_scene()
        extra = tuple(
            SphereData(
                center=(x, 2.5, z),
                radius=0.3,
                material=MaterialData(
                    kind=MaterialKind.EMISSIVE, color=c, param=25.0
                ),
            )
            for (x, z, c) in [
                (-2.0, 1.0, (1.0, 0.2, 0.2)),
                (2.0, -1.0, (0.2, 1.0, 0.2)),
                (0.0, -2.0, (0.2, 0.2, 1.0)),
            ]
        )
        sd = replace(sd, shapes=sd.shapes + extra)
        lights = extract_lights(sd)
        assert lights.num_lights == 4
        nee_img = _mean_image(sd, root=12, nee=True)
        ref_img = _mean_image(sd, root=64, nee=False)
        assert np.abs(nee_img - ref_img).mean() < 0.02
        assert np.abs(nee_img.mean() - ref_img.mean()) < 0.012


class TestWirePropagation:
    def test_nee_travels_in_job_config(self):
        from flux_tpu.job import Job, JobConfiguration, JobIDAllocator
        from flux_tpu.workers import default_renderer_factory

        cfg = JobConfiguration(
            sample_root=2, max_trace_depth=2, rows_per_work_unit=8, seed=0, nee=True
        )
        # Round-trip through the wire dict (what a network node receives).
        job = Job(id=JobIDAllocator().next_id(), scene_data=light_scene(), config=cfg)
        job2 = Job.from_dict(job.to_dict())
        assert job2.config.nee is True
        r = default_renderer_factory(job2)
        assert r.nee  # the node's renderer uses the job's estimator


class TestPowerWeightedPick:
    """NEE picks lights with probability ∝ luminance·power·r² instead of
    uniformly — unequal light sets stop wasting half their shadow rays on
    dim lights. Unbiasedness must hold (the 1/p_ℓ weight compensates)."""

    def unequal_scene(self):
        from flux_tpu.scene import CameraData, CameraSettings, OutputSettings

        shapes = (
            SphereData(  # bright main light
                center=(-1.5, 3.0, 0.0), radius=0.4,
                material=MaterialData(
                    kind=MaterialKind.EMISSIVE, color=(1.0, 0.9, 0.8), param=60.0
                ),
            ),
            SphereData(  # dim fill light, 100x less power
                center=(1.5, 3.0, 0.0), radius=0.4,
                material=MaterialData(
                    kind=MaterialKind.EMISSIVE, color=(0.4, 0.5, 1.0), param=0.6
                ),
            ),
            SphereData(
                center=(0.0, 0.5, 0.0), radius=0.5,
                material=MaterialData(
                    kind=MaterialKind.MATTE, color=(0.7, 0.6, 0.5), param=1.0
                ),
            ),
            PlaneData(
                point=(0.0, 0.0, 0.0), normal=(0.0, 1.0, 0.0),
                material=MaterialData(
                    kind=MaterialKind.MATTE, color=(0.6, 0.6, 0.6), param=1.0
                ),
            ),
        )
        return SceneData(
            scene_name="unequal",
            output_settings=OutputSettings(image_width=32, image_height=24, pixel_size=16.0),
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

    def test_pick_weights(self):
        lights = extract_lights(self.unequal_scene())
        pick = np.asarray(lights.pick)
        assert pick.shape == (2,)
        np.testing.assert_allclose(pick.sum(), 1.0, rtol=1e-6)
        # 100x power ratio -> bright light gets ~99% of the picks.
        assert pick[0] > 0.95 and pick[1] < 0.05
        cdf = np.asarray(lights.cdf)
        np.testing.assert_allclose(cdf, [0.0, pick[0]], rtol=1e-6)

    def test_unbiased_on_unequal_lights(self):
        sd = self.unequal_scene()
        def img(root, nee, seed=0):
            r = Renderer(sd, sample_root=root, max_depth=3, seed=seed, nee=nee,
                         target_lanes=1 << 18)
            return r.render_rows(0, 24)
        a = img(8, True)
        b = img(64, False, seed=9)
        assert np.abs(a - b).mean() < 0.015, np.abs(a - b).mean()
        assert abs(float(a.mean()) - float(b.mean())) < 0.008


def tri_light_scene(w=32, h=24, half=0.5, power=15.0, flip=False,
                    sphere_light=False):
    """Matte floor + matte ball under a square area light made of TWO
    emissive triangles at y=3 (normals authored downward, toward the
    floor; ``flip`` reverses the winding so the light faces away). The
    triangle-light NEE scene — ``sphere_light`` adds a small emissive
    sphere so mixed light sets are exercised too."""
    from flux_tpu.scene import TriangleData

    s = half
    emissive = MaterialData(
        kind=MaterialKind.EMISSIVE, color=(1.0, 0.95, 0.9), param=power
    )

    def tri(v0, v1, v2):
        if flip:
            v1, v2 = v2, v1
        return TriangleData(v0=v0, v1=v1, v2=v2, material=emissive)

    shapes = (
        SphereData(
            center=(0.8, 0.5, 0.0),
            radius=0.5,
            material=MaterialData(
                kind=MaterialKind.MATTE, color=(0.7, 0.3, 0.3), param=1.0
            ),
        ),
        PlaneData(
            point=(0.0, 0.0, 0.0),
            normal=(0.0, 1.0, 0.0),
            material=MaterialData(
                kind=MaterialKind.MATTE, color=(0.6, 0.6, 0.6), param=1.0
            ),
        ),
        # (v1-v0)×(v2-v0) points -y: the light shines down.
        tri((-s, 3.0, -s), (s, 3.0, -s), (-s, 3.0, s)),
        tri((s, 3.0, s), (-s, 3.0, s), (s, 3.0, -s)),
    ) + (
        (
            SphereData(
                center=(2.5, 2.0, -1.0),
                radius=0.3,
                material=MaterialData(
                    kind=MaterialKind.EMISSIVE, color=(0.9, 0.9, 1.0), param=30.0
                ),
            ),
        )
        if sphere_light
        else ()
    )
    return SceneData(
        scene_name="trilight",
        output_settings=OutputSettings(image_width=w, image_height=h, pixel_size=16.0),
        background=(0.0, 0.0, 0.0),
        shapes=shapes,
        camera_settings=CameraSettings(
            eye=(0.0, 2.0, 7.0), look_at=(0.0, 1.0, 0.0), up=(0.0, 1.0, 0.0)
        ),
        camera_data=CameraData(
            zoom_factor=1.0,
            view_plane_distance=400.0,
            focal_distance=7.0,
            lens_radius=0.0,
        ),
    )


class TestTriangleLights:
    """NEE direct sampling of emissive triangles (uniform-area strategy,
    ops/nee.py): same estimator contract as sphere lights — unbiased vs
    the BSDF walk, large variance cut, depth-cap parity — plus the
    triangle-only facing rule and the megakernel gate."""

    def test_extraction_mixed_set(self):
        lights = extract_lights(tri_light_scene(sphere_light=True))
        assert lights is not None and lights.num_lights == 3
        assert lights.has_tris
        # Shapes order: 2 spheres, 1 plane, 2 triangles; lights follow
        # shape order (sphere 2 comes after the triangles in shapes but
        # sphere records precede triangle records only by scene order).
        assert lights.kinds == ("tri", "tri", "sphere")
        np.testing.assert_array_equal(
            np.asarray(lights.shape_idx), [3, 4, 1]
        )
        assert float(lights.tri_area[0]) == pytest.approx(0.5)
        # Authored normals point down at the floor.
        np.testing.assert_allclose(
            np.asarray(lights.tri_n)[:2], [[0, -1, 0], [0, -1, 0]], atol=1e-6
        )
        # Pick weights are normalized and favor the big bright quad.
        assert float(np.asarray(lights.pick).sum()) == pytest.approx(1.0)

    def test_sphere_only_layout_unchanged(self):
        lights = extract_lights(light_scene())
        assert not lights.has_tris
        assert lights.kinds == () and lights.tri_v0 is None

    def test_nee_converges_to_bsdf_image(self):
        sd = tri_light_scene()
        nee_img = _mean_image(sd, root=8, nee=True)
        ref_img = _mean_image(sd, root=64, nee=False)
        assert np.abs(nee_img - ref_img).mean() < 0.015
        assert np.abs(nee_img.mean() - ref_img.mean()) < 0.01

    def test_variance_reduction_small_quad(self):
        sd = tri_light_scene(half=0.15, power=250.0)
        truth = _mean_image(sd, root=32, nee=True)
        mse = {}
        for nee in (False, True):
            img = _mean_image(sd, root=4, nee=nee, seed=9)  # 16 spp
            mse[nee] = float(((img - truth) ** 2).mean())
        assert mse[True] < 0.25 * mse[False], mse

    def test_depth_cap_parity(self):
        sd = tri_light_scene()
        a = _mean_image(sd, root=8, nee=True, depth=1)
        b = _mean_image(sd, root=8, nee=False, depth=1)
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_back_facing_light_is_dark_both_ways(self):
        # Flipped winding: the quad emits upward only. The reference's
        # one-sided emissive rule (materials.rs:44-49) must hold for BOTH
        # estimators: the walk sees a non-facing hit (black) and NEE's
        # cosθ_l ≤ 0 weighs the sample to zero.
        sd = tri_light_scene(flip=True)
        a = _mean_image(sd, root=4, nee=True)
        b = _mean_image(sd, root=4, nee=False)
        assert float(a.max()) < 1e-6 and float(b.max()) < 1e-6

    def test_physical_mis_converges(self):
        from flux_tpu.render import Renderer

        sd = tri_light_scene()

        def img(root, nee):
            r = Renderer(sd, sample_root=root, max_depth=3, seed=0, nee=nee,
                         physical=True, target_lanes=1 << 18)
            return r.render_rows(0, sd.output_settings.image_height)

        a = img(8, True)
        b = img(64, False)
        assert np.abs(a - b).mean() < 0.015
        assert np.abs(a.mean() - b.mean()) < 0.01

    def test_mixed_light_set_converges(self):
        sd = tri_light_scene(sphere_light=True)
        nee_img = _mean_image(sd, root=8, nee=True)
        ref_img = _mean_image(sd, root=64, nee=False)
        assert np.abs(nee_img - ref_img).mean() < 0.02
        assert np.abs(nee_img.mean() - ref_img.mean()) < 0.012

    def test_pallas_backend_accepts_tri_lights(self):
        # Round 3: the megakernel samples triangle lights in-kernel (the
        # former "sphere lights only" gate is gone). Construction must
        # succeed; radiance parity is pinned in
        # tests/test_pallas.py::test_triangle_light_nee_parity.
        r = Renderer(tri_light_scene(), 2, 2, nee=True, backend="pallas")
        assert r.backend == "pallas" and r.nee

    def test_forward_reverse_pdf_symmetry(self):
        # Advisor r2: the MIS forward density (sample_light_dirs) and the
        # reverse density (nee_pdf_toward) must agree — both sides now use
        # the identically clamped pick·r²/max(A·cosθ_l, ε) form for
        # triangle lanes instead of inverting the weight.
        import jax.numpy as jnp

        from flux_tpu.ops.nee import nee_pdf_toward, sample_light_dirs
        from flux_tpu.vec import Vec3

        lights = extract_lights(tri_light_scene(sphere_light=True))
        rng = np.random.default_rng(3)
        n = 256
        p = Vec3(
            jnp.asarray(rng.uniform(-2, 2, n), jnp.float32),
            jnp.asarray(rng.uniform(0.0, 1.5, n), jnp.float32),
            jnp.asarray(rng.uniform(-2, 2, n), jnp.float32),
        )
        ux = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        uy = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        up = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
        ls = sample_light_dirs(lights, p, ux, uy, up)
        rev = np.asarray(nee_pdf_toward(lights, p, ls.sidx, d=ls.d, t=ls.tri_t))
        fwd = np.asarray(ls.pdf)
        live = np.asarray(ls.weight.x) > 0
        tri = np.asarray(ls.tri_mask) & live
        sph = ~np.asarray(ls.tri_mask) & live
        assert tri.any() and sph.any()
        np.testing.assert_allclose(fwd[tri], rev[tri], rtol=1e-4)
        np.testing.assert_allclose(fwd[sph], rev[sph], rtol=1e-4)

    def test_shared_edge_shadow_not_self_occluded(self):
        # Advisor r2: a shadow ray toward a point ON the shared edge of the
        # two-triangle quad must not be falsely occluded by the ADJACENT
        # coplanar light triangle (only the picked one is index-excluded).
        # shade.py stops shadow rays at t_l·(1−1e-4); pin that contract on
        # the any-hit primitive directly.
        import jax.numpy as jnp

        from flux_tpu.ops.intersect import occluded_sweep
        from flux_tpu.scene import compile_scene
        from flux_tpu.vec import Vec3

        scene = compile_scene(tri_light_scene())
        s = np.float32(0.5)
        n = 64
        u = jnp.linspace(0.02, 0.98, n).astype(jnp.float32)
        # Shared diagonal runs (s, 3, -s) → (-s, 3, s).
        qx, qy, qz = s - 2 * s * u, jnp.full_like(u, 3.0), -s + 2 * s * u
        p = Vec3(
            jnp.full_like(u, -1.5), jnp.zeros_like(u), jnp.full_like(u, 0.5)
        )
        dvx, dvy, dvz = qx - p.x, qy - p.y, qz - p.z
        r = jnp.sqrt(dvx * dvx + dvy * dvy + dvz * dvz)
        d = Vec3(dvx / r, dvy / r, dvz / r)
        t_sh = r * np.float32(1.0 - 1e-4)
        # Shapes order: sphere=0, plane=1, tri0=2, tri1=3.
        occ = np.asarray(occluded_sweep(scene, p, d, t_sh, jnp.full_like(u, 2, jnp.int32)))
        assert not occ.any(), f"{occ.sum()} edge shadow rays falsely occluded"
        # Positive control: a genuine occluder strictly before the light
        # (the matte sphere at (0.8, 0.5, 0)) is still caught at the
        # shrunk t_max.
        p2 = Vec3(jnp.full_like(u, 0.8), jnp.zeros_like(u), jnp.zeros_like(u))
        d2 = Vec3(jnp.zeros_like(u), jnp.ones_like(u), jnp.zeros_like(u))
        occ2 = np.asarray(
            occluded_sweep(scene, p2, d2, jnp.full_like(u, 3.0) * np.float32(1.0 - 1e-4),
                           jnp.full_like(u, 2, jnp.int32))
        )
        assert occ2.all()


class TestPartialConeClipping:
    """Horizon clipping of the NEE light cone (ops/nee.py): azimuth drawn
    only from the above-horizon arc with matching density — same mean
    (unbiased), strictly lower variance when a light straddles the horizon
    (previously a documented whole-cone accept/reject approximation)."""

    def _estimates(self, normal_arg):
        """Monte-Carlo estimates of ∫_cone max(n·d, 0) dΩ-ish term using
        the sampler in whole-cone (normal=None) or clipped mode."""
        import jax.numpy as jnp

        from flux_tpu.ops.nee import LightArrays, sample_light_dirs
        from flux_tpu.samplers.hash import randfloat
        from flux_tpu.vec import Vec3, dot

        lights = LightArrays(
            center=jnp.asarray([[0.0, 0.2, -3.0]], jnp.float32),  # grazing
            radius=jnp.asarray([1.0], jnp.float32),
            emit=jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32),
            shape_idx=jnp.asarray([0], jnp.int32),
            pick=jnp.asarray([1.0], jnp.float32),
            cdf=jnp.asarray([0.0], jnp.float32),
        )
        n = 4096
        i = jnp.arange(n, dtype=jnp.uint32)
        ux, uy = randfloat(i, 11), randfloat(i, 22)
        up = jnp.zeros(n, jnp.float32)
        p = Vec3(*(jnp.zeros(n, jnp.float32) for _ in range(3)))
        normal = Vec3(
            jnp.zeros(n, jnp.float32),
            jnp.ones(n, jnp.float32),
            jnp.zeros(n, jnp.float32),
        )
        d, w, *_ = sample_light_dirs(
            lights, p, ux, uy, up, normal=normal if normal_arg else None
        )
        cos_s = dot(normal, d)
        est = np.asarray(w.x * np.maximum(np.asarray(cos_s), 0.0))
        return est

    def test_same_mean_lower_variance(self):
        full = self._estimates(False)
        clip = self._estimates(True)
        # Unbiased: identical integral (within MC error of 4096 samples).
        np.testing.assert_allclose(clip.mean(), full.mean(), rtol=0.05)
        # The grazing cone straddles the horizon, so whole-cone sampling
        # wastes ~half its samples on zero outcomes; clipping must cut the
        # estimator variance substantially.
        assert clip.var() < 0.7 * full.var(), (clip.var(), full.var())
        # And every clipped sample lands on or above the horizon.
        assert (clip >= 0).all()

    def test_clipped_reverse_density_matches_sampler(self):
        """MIS consistency (Σw = 1): nee_pdf_toward with the stored normal
        must return EXACTLY the clipped density the sampler drew with, for
        every sampled direction — the two sides of the balance heuristic
        share one density function (round 5; ops/nee.py docstring)."""
        import jax.numpy as jnp

        from flux_tpu.ops.nee import LightArrays, nee_pdf_toward, sample_light_dirs
        from flux_tpu.samplers.hash import randfloat
        from flux_tpu.vec import Vec3

        lights = LightArrays(
            center=jnp.asarray([[0.0, 0.2, -3.0]], jnp.float32),  # grazing
            radius=jnp.asarray([1.0], jnp.float32),
            emit=jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32),
            shape_idx=jnp.asarray([7], jnp.int32),
            pick=jnp.asarray([1.0], jnp.float32),
            cdf=jnp.asarray([0.0], jnp.float32),
        )
        n = 2048
        i = jnp.arange(n, dtype=jnp.uint32)
        ux, uy = randfloat(i, 5), randfloat(i, 6)
        up = jnp.zeros(n, jnp.float32)
        p = Vec3(*(jnp.zeros(n, jnp.float32) for _ in range(3)))
        normal = Vec3(
            jnp.zeros(n, jnp.float32), jnp.ones(n, jnp.float32),
            jnp.zeros(n, jnp.float32),
        )
        ls = sample_light_dirs(lights, p, ux, uy, up, normal=normal)
        rev = nee_pdf_toward(
            lights, p, jnp.full(n, 7, jnp.int32), d=ls.d, t=None, normal=normal
        )
        fwd = np.asarray(ls.pdf)
        rev = np.asarray(rev)
        ok = np.isfinite(fwd) & (fwd < 1e19)  # skip zero-weight (empty-arc) lanes
        # Same density function, but the reverse recomputes the ring from
        # the FINAL f32 direction (the sampler used its internal cos_a) —
        # agreement is f32-rounding-tight, amplified for rings near the
        # clamp boundary: p99 at 1e-4, a bounded tail beyond.
        rel = np.abs(rev[ok] - fwd[ok]) / fwd[ok]
        assert np.quantile(rel, 0.99) < 1e-4, np.quantile(rel, 0.99)
        assert rel.max() < 0.05, rel.max()

    def test_fully_visible_cone_unchanged_weight(self):
        """A light high above the surface: the visible arc is the whole
        ring, so clipping must not change the estimator at all."""
        import jax.numpy as jnp

        from flux_tpu.ops.nee import LightArrays, sample_light_dirs
        from flux_tpu.samplers.hash import randfloat
        from flux_tpu.vec import Vec3

        lights = LightArrays(
            center=jnp.asarray([[0.0, 5.0, 0.0]], jnp.float32),  # overhead
            radius=jnp.asarray([0.5], jnp.float32),
            emit=jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32),
            shape_idx=jnp.asarray([0], jnp.int32),
            pick=jnp.asarray([1.0], jnp.float32),
            cdf=jnp.asarray([0.0], jnp.float32),
        )
        n = 512
        i = jnp.arange(n, dtype=jnp.uint32)
        ux, uy = randfloat(i, 3), randfloat(i, 4)
        up = jnp.zeros(n, jnp.float32)
        p = Vec3(*(jnp.zeros(n, jnp.float32) for _ in range(3)))
        normal = Vec3(
            jnp.zeros(n, jnp.float32),
            jnp.ones(n, jnp.float32),
            jnp.zeros(n, jnp.float32),
        )
        _, w_full, *_ = sample_light_dirs(lights, p, ux, uy, up)
        _, w_clip, *_ = sample_light_dirs(
            lights, p, ux, uy, up, normal=normal
        )
        np.testing.assert_allclose(
            np.asarray(w_clip.x), np.asarray(w_full.x), rtol=1e-5
        )
