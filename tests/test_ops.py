"""Unit tests of the compute kernels: intersection, AABB, BRDF directions."""

import jax.numpy as jnp
import numpy as np
import pytest

from flux_tpu.ops.aabb import aabb_hit, sphere_bounds
from flux_tpu.ops.brdf import sample_directions
from flux_tpu.ops.intersect import intersect
from flux_tpu.scene import (
    MaterialData,
    MaterialKind,
    OutputSettings,
    PlaneData,
    SceneData,
    SphereData,
    CameraSettings,
    CameraData,
    compile_scene,
)
from flux_tpu.vec import Vec3


def vec(x, y, z):
    return Vec3(jnp.asarray([x], jnp.float32), jnp.asarray([y], jnp.float32), jnp.asarray([z], jnp.float32))


def make_arrays(shapes):
    sd = SceneData(
        scene_name="t",
        output_settings=OutputSettings(image_width=1, image_height=1, pixel_size=1.0),
        background=(0, 0, 0),
        shapes=tuple(shapes),
        camera_settings=CameraSettings(eye=(0, 0, -5), look_at=(0, 0, 0), up=(0, 1, 0)),
        camera_data=CameraData(),
    )
    return compile_scene(sd)


MATTE = MaterialData(kind=MaterialKind.MATTE, color=(1, 1, 1), param=1.0)


class TestIntersect:
    def test_sphere_head_on(self):
        scene = make_arrays(
            [SphereData(center=(0.0, 0.0, 0.0), radius=1.0, material=MATTE)]
        )
        hit = intersect(scene, vec(0, 0, -5), vec(0, 0, 1))
        assert bool(hit.mask[0])
        assert float(hit.t[0]) == pytest.approx(4.0, abs=1e-5)
        assert float(hit.normal.z[0]) == pytest.approx(-1.0, abs=1e-5)
        assert int(hit.shape[0]) == 0

    def test_sphere_miss(self):
        scene = make_arrays(
            [SphereData(center=(0.0, 0.0, 0.0), radius=1.0, material=MATTE)]
        )
        hit = intersect(scene, vec(0, 3, -5), vec(0, 0, 1))
        assert not bool(hit.mask[0])
        assert np.isinf(float(hit.t[0]))

    def test_inside_sphere_uses_far_root(self):
        """Origin inside the sphere: near root < T_MIN, far root accepted
        (shapes.rs:197-211)."""
        scene = make_arrays(
            [SphereData(center=(0.0, 0.0, 0.0), radius=2.0, material=MATTE)]
        )
        hit = intersect(scene, vec(0, 0, 0), vec(0, 0, 1))
        assert bool(hit.mask[0])
        assert float(hit.t[0]) == pytest.approx(2.0, abs=1e-5)

    def test_inverted_sphere_normal_flipped(self):
        scene = make_arrays(
            [SphereData(center=(0.0, 0.0, 0.0), radius=2.0, material=MATTE, invert=True)]
        )
        hit = intersect(scene, vec(0, 0, 0), vec(0, 0, 1))
        # outward normal (0,0,1) flipped to (0,0,-1)
        assert float(hit.normal.z[0]) == pytest.approx(-1.0, abs=1e-5)

    def test_nearest_wins_and_tie_break(self):
        near = SphereData(center=(0.0, 0.0, 2.0), radius=0.5, material=MATTE)
        far = SphereData(center=(0.0, 0.0, 5.0), radius=0.5, material=MATTE)
        scene = make_arrays([far, near])
        hit = intersect(scene, vec(0, 0, 0), vec(0, 0, 1))
        assert int(hit.shape[0]) == 1  # the nearer sphere, index 1
        assert float(hit.t[0]) == pytest.approx(1.5, abs=1e-5)

    def test_plane(self):
        scene = make_arrays(
            [PlaneData(point=(0.0, -1.0, 0.0), normal=(0.0, 1.0, 0.0), material=MATTE)]
        )
        hit = intersect(scene, vec(0, 0, 0), vec(0, -1, 0))
        assert bool(hit.mask[0])
        assert float(hit.t[0]) == pytest.approx(1.0, abs=1e-6)
        # parallel ray misses
        hit2 = intersect(scene, vec(0, 0, 0), vec(1, 0, 0))
        assert not bool(hit2.mask[0])

    def test_t_min_epsilon(self):
        """A hit closer than T_MIN is rejected (self-intersection guard)."""
        scene = make_arrays(
            [PlaneData(point=(0.0, 0.0, 0.0), normal=(0.0, 1.0, 0.0), material=MATTE)]
        )
        hit = intersect(scene, vec(0, 1e-4, 0), vec(0, -1, 0))
        assert not bool(hit.mask[0])

    def test_material_record_fused(self):
        glossy = MaterialData(
            kind=MaterialKind.GLOSSY, color=(0.5, 0.25, 1.0), param=0.5, exponent=64.0
        )
        scene = make_arrays(
            [SphereData(center=(0.0, 0.0, 3.0), radius=1.0, material=glossy)]
        )
        hit = intersect(scene, vec(0, 0, 0), vec(0, 0, 1))
        assert int(hit.kind[0]) == MaterialKind.GLOSSY
        assert float(hit.exponent[0]) == 64.0
        np.testing.assert_allclose(
            [float(hit.albedo.x[0]), float(hit.albedo.y[0]), float(hit.albedo.z[0])],
            [0.25, 0.125, 0.5],
            atol=1e-6,
        )


class TestAABB:
    def test_hit_and_miss(self):
        c0, c1 = sphere_bounds((0.0, 0.0, 5.0), 1.0)
        assert bool(aabb_hit(c0, c1, vec(0, 0, 0), vec(0, 0, 1))[0])
        assert not bool(aabb_hit(c0, c1, vec(0, 3, 0), vec(0, 0, 1))[0])

    def test_axis_parallel_ray(self):
        c0, c1 = sphere_bounds((0.0, 0.0, 5.0), 1.0)
        # dy == 0 but inside the y-slab: still hits
        assert bool(aabb_hit(c0, c1, vec(0.5, 0.5, 0.0), vec(0, 0, 1))[0])
        # dy == 0 and outside the y-slab: misses
        assert not bool(aabb_hit(c0, c1, vec(0.5, 2.0, 0.0), vec(0, 0, 1))[0])

    def test_box_behind_origin(self):
        c0, c1 = sphere_bounds((0.0, 0.0, -5.0), 1.0)
        assert not bool(aabb_hit(c0, c1, vec(0, 0, 0), vec(0, 0, 1))[0])


class TestBRDFDirections:
    def sample_many(self, kind, exponent, n=4096, seed=0):
        rng = np.random.default_rng(seed)
        sx = jnp.asarray(rng.random(n), jnp.float32)
        sy = jnp.asarray(rng.random(n), jnp.float32)
        normal = Vec3(*(jnp.full((n,), v) for v in (0.0, 1.0, 0.0)))
        d = Vec3(*(jnp.full((n,), v) for v in (0.70710677, -0.70710677, 0.0)))
        kinds = jnp.full((n,), kind, jnp.int32)
        exps = jnp.full((n,), exponent, jnp.float32)
        wi = sample_directions(kinds, exps, normal, d, sx, sy)
        return np.stack([np.asarray(wi.x), np.asarray(wi.y), np.asarray(wi.z)], -1)

    def test_matte_upper_hemisphere_unit(self):
        wi = self.sample_many(MaterialKind.MATTE, 0.0)
        assert (wi[:, 1] >= -1e-6).all()
        np.testing.assert_allclose(np.linalg.norm(wi, axis=1), 1.0, atol=1e-5)
        # cos(theta)=n·wi uniform in [0,1] for e=0 (reference's distribution)
        assert abs(wi[:, 1].mean() - 0.5) < 0.02

    def test_perfect_mirror_exact(self):
        wi = self.sample_many(MaterialKind.REFLECTIVE, 0.0, n=4)
        np.testing.assert_allclose(wi, [[0.70710677, 0.70710677, 0.0]] * 4, atol=1e-6)

    def test_glossy_concentrates_around_mirror(self):
        wi = self.sample_many(MaterialKind.GLOSSY, 1e5)
        r = np.array([0.70710677, 0.70710677, 0.0])
        cos_to_mirror = wi @ r
        assert cos_to_mirror.min() > 0.99

    def test_glossy_low_exponent_spreads(self):
        wi = self.sample_many(MaterialKind.GLOSSY, 1.0)
        r = np.array([0.70710677, 0.70710677, 0.0])
        assert (wi @ r).std() > 0.1


class TestOccluded:
    """Any-hit shadow primitive vs the nearest-hit oracle: for random rays
    and a random sphere/plane field, ``occluded(o, d, t_l, ex)`` must equal
    "the nearest hit of (o, d) is NOT shape ex with t == t_l" — i.e. the
    two shadow-test formulations used by ops/shade.py agree."""

    def _field(self, n=37, seed=3):
        rng = np.random.default_rng(seed)
        shapes = [
            SphereData(
                center=tuple(rng.uniform(-4, 4, 3)),
                radius=float(rng.uniform(0.2, 0.9)),
                material=MATTE,
            )
            for _ in range(n)
        ]
        shapes.append(
            PlaneData(point=(0.0, -5.0, 0.0), normal=(0.0, 1.0, 0.0), material=MATTE)
        )
        return make_arrays(shapes)

    def _rays(self, m=512, seed=7):
        rng = np.random.default_rng(seed)
        o = rng.uniform(-5, 5, (3, m)).astype(np.float32)
        d = rng.normal(size=(3, m)).astype(np.float32)
        d /= np.linalg.norm(d, axis=0, keepdims=True)
        return (
            Vec3(*(jnp.asarray(o[k]) for k in range(3))),
            Vec3(*(jnp.asarray(d[k]) for k in range(3))),
        )

    @pytest.mark.parametrize("mode", ["sweep", "scan"])
    def test_matches_nearest_hit_oracle(self, mode):
        from flux_tpu.ops.intersect import Intersector, intersect

        scene = self._field()
        o, d = self._rays()
        h = intersect(scene, o, d)
        # Use each ray's own nearest hit as the "light": t_max = h.t,
        # exclude = h.shape. Nothing is strictly before the nearest hit, so
        # occlusion must be False wherever something was hit; pushing t_max
        # beyond the second hit must flip rays that have two hits.
        isect = Intersector(mode=mode)
        t_max = jnp.where(h.mask, h.t, 1e-3)
        occ = isect.occluded(scene, o, d, t_max, h.shape)
        assert not bool(np.asarray(occ & h.mask).any())
        # With a huge t_max and an excluded id matching nothing, occlusion
        # must be True exactly where intersect found any hit.
        occ_all = isect.occluded(scene, o, d, jnp.full_like(h.t, 1e9), jnp.full_like(h.shape, -1))
        np.testing.assert_array_equal(np.asarray(occ_all), np.asarray(h.mask))

    def test_exclude_only_skips_that_shape(self):
        from flux_tpu.ops.intersect import occluded_sweep

        scene = make_arrays(
            [
                SphereData(center=(0, 0, 2.0), radius=0.5, material=MATTE),
                SphereData(center=(0, 0, 4.0), radius=0.5, material=MATTE),
            ]
        )
        o = vec(0, 0, 0)
        d = vec(0, 0, 1)
        big = jnp.asarray([1e9], jnp.float32)
        # Excluding the near sphere: the far one still occludes.
        assert bool(occluded_sweep(scene, o, d, big, jnp.asarray([0], jnp.int32))[0])
        # Excluding nothing relevant: occluded.
        assert bool(occluded_sweep(scene, o, d, big, jnp.asarray([-1], jnp.int32))[0])
        # t_max before the first sphere: clear.
        near = jnp.asarray([1.0], jnp.float32)
        assert not bool(occluded_sweep(scene, o, d, near, jnp.asarray([-1], jnp.int32))[0])


class TestScanLayoutEdgeCases:
    def test_sphere_free_scene_scan(self):
        # Regression: morton_order/scan_layout on a plane-only scene (the
        # plain scan handled num_spheres == 0 before the sorted layout).
        from flux_tpu.ops.intersect import intersect_scan, occluded_scan, scan_layout

        scene = make_arrays(
            [PlaneData(point=(0, 0, 0), normal=(0, 1, 0), material=MATTE)]
        )
        L = scan_layout(scene)
        # 3, not 1: the layout keeps a 3-block floor so the lax.scan stays
        # a real loop (XLA:CPU compiles the unrolled ≤2-block program
        # pathologically slowly; see scan_layout).
        assert L.n_blocks == 3 and int(np.asarray(L.idx).max()) == -1
        o = vec(0, 1, 0)
        d = vec(0, -1, 0)
        h = intersect_scan(scene, o, d)
        assert bool(h.mask[0]) and int(h.shape[0]) == 0  # the plane (idx ns+0)
        occ = occluded_scan(scene, o, d, jnp.asarray([10.0], jnp.float32),
                            jnp.asarray([-1], jnp.int32))
        assert bool(occ[0])

    def test_equal_t_tie_keeps_lowest_original_index(self):
        # Two spheres tangent to the same ray at bit-identical t; the
        # documented rule (lowest shape index wins, common.rs:16-24) must
        # hold in the Morton-sorted scans exactly as in the sweep.
        from flux_tpu.ops.intersect import (
            intersect, intersect_scan, intersect_scan_carry,
        )

        r = float(np.sqrt(2.0))
        shapes = [
            SphereData(center=(1.0, 1.0, 5.0), radius=r, material=MATTE),
            SphereData(
                center=(-1.0, -1.0, 5.0), radius=r,
                material=MaterialData(kind=MaterialKind.MATTE, color=(1, 0, 0), param=1.0),
            ),
        ]
        # Pad with far-away spheres so the scan actually sorts something.
        rng = np.random.default_rng(0)
        for _ in range(40):
            shapes.append(
                SphereData(center=tuple(rng.uniform(50, 60, 3)), radius=0.1, material=MATTE)
            )
        scene = make_arrays(shapes)
        o = vec(0, 0, 0)
        d = vec(0, 0, 1)
        h_sweep = intersect(scene, o, d)
        h_scan = intersect_scan(scene, o, d)
        h_carry = intersect_scan_carry(scene, o, d)
        assert int(h_sweep.shape[0]) == 0
        assert int(h_scan.shape[0]) == 0
        assert int(h_carry.shape[0]) == 0
        assert float(h_scan.t[0]) == float(h_sweep.t[0])
