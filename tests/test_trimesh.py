"""Triangle/mesh geometry — the flux_tpu extension beyond the reference's
sphere/plane schema (shapes.rs:68-74 has no mesh geometry).

Grounding strategy: the triangle path is pinned three ways — (a) analytic
Möller–Trumbore cases, (b) a NumPy oracle over random triangles for both
the unrolled and the lax.scan block forms, and (c) an icosphere render that
must converge to the analytic-sphere render the reference-parity tests
already pin (the mesh approximates the sphere, so their images must agree
to tessellation error)."""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from flux_tpu.meshgen import box, icosphere, load_obj, mesh_scene, mesh_triangles
from flux_tpu.ops.intersect import (
    TRI_UNROLL_MAX,
    Intersector,
    intersect,
    intersect_scan,
    intersect_scan_carry,
    occluded_sweep,
    occluded_scan,
    triangle_nearest,
    triangle_t,
)
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
    TriangleData,
    compile_scene,
    loads_scene,
)
from flux_tpu.vec import Vec3

MATTE_RED = MaterialData(kind=MaterialKind.MATTE, color=(1.0, 0.0, 0.0))
EMIT = MaterialData(kind=MaterialKind.EMISSIVE, color=(1.0, 1.0, 1.0), param=2.0)


def scene_of(shapes, w=32, h=24, eye=(0, 0, -5), look=(0, 0, 0)):
    return SceneData(
        scene_name="t",
        output_settings=OutputSettings(image_width=w, image_height=h, pixel_size=1.0),
        background=(0.0, 0.0, 0.0),
        shapes=tuple(shapes),
        camera_settings=CameraSettings(eye=eye, look_at=look, up=(0, 1, 0)),
        camera_data=CameraData(
            zoom_factor=1.0, view_plane_distance=500.0, focal_distance=5.0, lens_radius=0.0
        ),
    )


def rays(o_list, d_list):
    o = np.asarray(o_list, np.float32)
    d = np.asarray(d_list, np.float32)
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    return (
        Vec3(*(jnp.asarray(o[:, k]) for k in range(3))),
        Vec3(*(jnp.asarray(d[:, k]) for k in range(3))),
    )


TRI = TriangleData(v0=(-1, -1, 0), v1=(1, -1, 0), v2=(0, 1, 0), material=MATTE_RED)


class TestTriangleT:
    def tri_args(self, t=TRI):
        v0 = np.asarray(t.v0, np.float32)
        e1 = np.asarray(t.v1, np.float32) - v0
        e2 = np.asarray(t.v2, np.float32) - v0
        return tuple(v0), tuple(e1), tuple(e2)

    def test_analytic_hits_and_misses(self):
        v0, e1, e2 = self.tri_args()
        o, d = rays(
            [
                (0, 0, -5),     # interior -> t = 5
                (0, 0.999, -5),  # just below apex -> hit
                (0, 1.001, -5),  # just above apex -> miss
                (2, 0, -5),     # right of triangle -> miss
                (0, 0, 5),      # behind, shooting -z: backface hit (double-sided)
            ],
            [(0, 0, 1), (0, 0, 1), (0, 0, 1), (0, 0, 1), (0, 0, -1)],
        )
        t, valid = jax.jit(triangle_t)(o, d, v0, e1, e2)
        t, valid = np.asarray(t), np.asarray(valid)
        assert valid.tolist() == [True, True, False, False, True]
        np.testing.assert_allclose(t[[0, 1, 4]], [5.0, 5.0, 5.0], rtol=1e-6)

    def test_parallel_ray_rejected(self):
        v0, e1, e2 = self.tri_args()
        # In-plane ray: det == 0 -> inf/NaN arithmetic must reject, not crash.
        o, d = rays([(-5, 0, 0), (-5, -1, 0)], [(1, 0, 0), (1, 0, 0)])
        _, valid = jax.jit(triangle_t)(o, d, v0, e1, e2)
        assert not np.asarray(valid).any()

    def test_t_min_epsilon(self):
        v0, e1, e2 = self.tri_args()
        # Origin ON the triangle, shooting through: t == 0 rejected by T_MIN
        # (the self-intersection guard, constants.rs:4).
        o, d = rays([(0, 0, 0)], [(0, 0, 1)])
        _, valid = jax.jit(triangle_t)(o, d, v0, e1, e2)
        assert not np.asarray(valid).any()


def _mt_oracle(v0, v1, v2, o, d, t_min=5e-4):
    """NumPy Möller–Trumbore over (N triangles, B rays): nearest (t, k)."""
    e1 = (v1 - v0)[:, None, :]
    e2 = (v2 - v0)[:, None, :]
    ob = o[None, :, :]
    db = d[None, :, :]
    p = np.cross(db, e2)
    det = (e1 * p).sum(-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / det
        s = ob - v0[:, None, :]
        u = (s * p).sum(-1) * inv
        q = np.cross(s, e1)
        v = (db * q).sum(-1) * inv
        t = (e2 * q).sum(-1) * inv
    with np.errstate(invalid="ignore"):
        valid = (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min)
    t = np.where(valid, t, np.inf)
    return t.min(axis=0), t.argmin(axis=0)


def _random_tri_scene(n, seed, extra=()):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-6, 6, size=(n, 3))
    a = c + rng.normal(scale=1.2, size=(n, 3))
    b = c + rng.normal(scale=1.2, size=(n, 3))
    tris = [
        TriangleData(v0=tuple(c[i]), v1=tuple(a[i]), v2=tuple(b[i]), material=MATTE_RED)
        for i in range(n)
    ]
    return scene_of(list(extra) + tris), (c, a, b)


class TestOracleParity:
    @pytest.mark.parametrize("n,seed", [(9, 0), (150, 1)])  # unrolled + scan forms
    def test_nearest_matches_numpy(self, n, seed):
        sd, (v0, v1, v2) = _random_tri_scene(n, seed)
        sc = compile_scene(sd)
        assert (n <= TRI_UNROLL_MAX) == (n <= 64)
        rng = np.random.default_rng(seed + 7)
        o = rng.uniform(-10, 10, size=(2048, 3)).astype(np.float32)
        d = rng.normal(size=(2048, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        t_ref, k_ref = _mt_oracle(
            v0.astype(np.float32), v1.astype(np.float32), v2.astype(np.float32), o, d
        )
        ov = Vec3(*(jnp.asarray(o[:, k]) for k in range(3)))
        dv = Vec3(*(jnp.asarray(d[:, k]) for k in range(3)))
        t_got, k_got = jax.jit(triangle_nearest)(sc, ov, dv)
        t_got, k_got = np.asarray(t_got), np.asarray(k_got)
        hit = np.isfinite(t_ref)
        assert (np.isfinite(t_got) == hit).mean() > 0.999
        both = hit & np.isfinite(t_got)
        np.testing.assert_allclose(t_got[both], t_ref[both], rtol=2e-4, atol=2e-4)
        assert (k_got[both] == k_ref[both]).mean() > 0.999

    def test_all_intersect_paths_agree(self):
        sphere = SphereData(center=(2, 0, 2), radius=1.0, material=MATTE_RED)
        plane = PlaneData(point=(0, -3, 0), normal=(0, 1, 0), material=MATTE_RED)
        sd, _ = _random_tri_scene(20, 3, extra=[sphere, plane])
        sc = compile_scene(sd)
        rng = np.random.default_rng(11)
        o = rng.uniform(-8, 8, size=(1024, 3)).astype(np.float32)
        d = rng.normal(size=(1024, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        ov = Vec3(*(jnp.asarray(o[:, k]) for k in range(3)))
        dv = Vec3(*(jnp.asarray(d[:, k]) for k in range(3)))
        a = jax.jit(intersect)(sc, ov, dv)
        b = jax.jit(intersect_scan)(sc, ov, dv)
        c = jax.jit(intersect_scan_carry)(sc, ov, dv)
        hit = np.asarray(a.mask)
        for other in (b, c):
            np.testing.assert_array_equal(np.asarray(a.t), np.asarray(other.t))
            assert (np.asarray(a.mask) == np.asarray(other.mask)).all()
            # shape/kind/normal are only meaningful on hit lanes (shading
            # masks misses; miss-lane fields are whatever the fold left).
            assert (np.asarray(a.shape) == np.asarray(other.shape))[hit].all()
            assert (np.asarray(a.kind) == np.asarray(other.kind))[hit].all()
            for ch in "xyz":
                np.testing.assert_array_equal(
                    np.asarray(getattr(a.normal, ch))[hit],
                    np.asarray(getattr(other.normal, ch))[hit],
                )


class TestShapeOrdering:
    def test_nearest_shape_wins_and_indices_are_stable(self):
        # Sphere at z=2 (front), triangle at z=4 (behind), plane far below.
        sphere = SphereData(center=(0, 0, 2), radius=0.3, material=MATTE_RED)
        tri = TriangleData(v0=(-2, -2, 4), v1=(2, -2, 4), v2=(0, 2, 4), material=EMIT)
        plane = PlaneData(point=(0, -5, 0), normal=(0, 1, 0), material=MATTE_RED)
        sc = compile_scene(scene_of([sphere, plane, tri]))
        # Lane 0 hits the sphere first; lane 1 (offset 0.5) clears the
        # r=0.3 sphere and lands inside the triangle (x range at y=0 is
        # [-1, 1]); triangle shape index = Ns + Np + 0 = 2.
        o, d = rays([(0, 0, -5), (0.5, 0, -5)], [(0, 0, 1), (0, 0, 1)])
        h = jax.jit(intersect)(sc, o, d)
        assert np.asarray(h.shape).tolist() == [0, 2]
        np.testing.assert_allclose(np.asarray(h.t), [6.7, 9.0], rtol=1e-6)
        assert np.asarray(h.kind).tolist() == [MaterialKind.MATTE, MaterialKind.EMISSIVE]

    def test_occlusion_excludes_self(self):
        tri = TriangleData(v0=(-2, -2, 2), v1=(2, -2, 2), v2=(0, 2, 2), material=MATTE_RED)
        sc = compile_scene(scene_of([tri]))
        o, d = rays([(0, 0, -5), (0, 0, -5)], [(0, 0, 1), (0, 0, 1)])
        t_max = jnp.float32([10.0, 10.0])
        # Excluding the triangle (shape index 0 = Ns+Np+0 here) clears the mask.
        occ_excl = jax.jit(occluded_sweep)(sc, o, d, t_max, jnp.int32([0, -1]))
        assert np.asarray(occ_excl).tolist() == [False, True]
        occ_scan = jax.jit(occluded_scan)(sc, o, d, t_max, jnp.int32([0, -1]))
        assert np.asarray(occ_scan).tolist() == [False, True]


class TestMeshSources:
    def test_box_winding_outward(self):
        v, f = box((-1, -1, -1), (1, 1, 1))
        assert f.shape == (12, 3)
        # Every face normal must point away from the origin (outward).
        for i, j, k in f:
            n = np.cross(v[j] - v[i], v[k] - v[i])
            centroid = (v[i] + v[j] + v[k]) / 3
            assert np.dot(n, centroid) > 0
    def test_icosphere_vertices_unit(self):
        v, f = icosphere(2)
        assert f.shape == (320, 3)
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-12)
        for i, j, k in f[:40]:
            n = np.cross(v[j] - v[i], v[k] - v[i])
            centroid = (v[i] + v[j] + v[k]) / 3
            assert np.dot(n, centroid) > 0  # outward winding survives subdivision

    def test_obj_loader_fan_triangulation(self, tmp_path):
        p = tmp_path / "quad.obj"
        p.write_text(
            "# quad\nv 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\nf -4 -3 -2\n"
        )
        v, f = load_obj(str(p))
        assert v.shape == (4, 3)
        assert f.tolist() == [[0, 1, 2], [0, 2, 3], [0, 1, 2]]

    def test_mesh_yaml_roundtrip(self):
        v, f = box()
        sd = scene_of(mesh_triangles(v, f, MATTE_RED, scale=0.5, offset=(0, 0, 2)))
        rt = loads_scene(yaml.safe_dump(sd.to_dict()))
        assert sum(isinstance(s, TriangleData) for s in rt.shapes) == 12
        sc1, sc2 = compile_scene(sd), compile_scene(rt)
        np.testing.assert_array_equal(np.asarray(sc1.tri_v0), np.asarray(sc2.tri_v0))
        np.testing.assert_array_equal(np.asarray(sc1.tri_n), np.asarray(sc2.tri_n))


class TestRendering:
    def test_emissive_triangle_faces_camera_only(self):
        # Front-facing emissive triangle lights the image; flipping the
        # winding (normal away from camera) blacks it out — the facing test
        # the reference applies to emissives (materials.rs:42-50), on the
        # authored triangle normal.
        front = TriangleData(v0=(-2, -2, 3), v1=(0, 2, 3), v2=(2, -2, 3), material=EMIT)
        back = TriangleData(v0=(-2, -2, 3), v1=(2, -2, 3), v2=(0, 2, 3), material=EMIT)
        img_f = Renderer(scene_of([front]), 2, 2, seed=0).render_rows(0, 24)
        img_b = Renderer(scene_of([back]), 2, 2, seed=0).render_rows(0, 24)
        assert img_f.max() > 0.5
        assert img_b.max() == 0.0

    def test_icosphere_converges_to_analytic_sphere(self):
        # The geodesic sphere must render like the analytic sphere it
        # approximates (same center/radius/material, same seed): mean
        # difference bounded by tessellation error. This grounds the whole
        # triangle path against the sphere path that the reference-parity
        # and golden tests already pin.
        light = SphereData(
            center=(0, 6, -2), radius=2.0,
            material=MaterialData(kind=MaterialKind.EMISSIVE, color=(1, 1, 1), param=3.0),
        )
        ground = PlaneData(
            point=(0, -1.2, 0), normal=(0, 1, 0),
            material=MaterialData(kind=MaterialKind.MATTE, color=(0.6, 0.6, 0.6)),
        )
        v, f = icosphere(3)  # 1280 faces -> scan form, max chord error ~0.25%
        mesh = mesh_triangles(v, f, MATTE_RED, scale=1.0, offset=(0.0, 0.0, 0.0))
        analytic = SphereData(center=(0, 0, 0), radius=1.0, material=MATTE_RED)
        sd_mesh = scene_of([light, ground] + mesh, w=48, h=36)
        sd_sph = scene_of([light, ground, analytic], w=48, h=36)
        img_mesh = Renderer(sd_mesh, 4, 3, seed=1).render_rows(0, 36)
        img_sph = Renderer(sd_sph, 4, 3, seed=1).render_rows(0, 36)
        diff = np.abs(img_mesh - img_sph).mean()
        assert diff < 0.02, f"icosphere vs analytic sphere mean |diff| {diff:.4f}"

    def test_pallas_backend_accepts_triangles(self):
        # The megakernel folds triangles (blocked Morton scan,
        # ops/pallas_kernel.py); a triangle scene constructs with
        # backend='pallas' and carries a prebuilt TriLayout. Auto-select
        # still picks XLA off-TPU (Mosaic cannot lower on CPU).
        tri = TriangleData(v0=(-1, -1, 2), v1=(1, -1, 2), v2=(0, 1, 2), material=MATTE_RED)
        r = Renderer(scene_of([tri]), 1, 2, seed=0, backend="pallas")
        assert r.backend == "pallas" and r.tri_blocks is not None
        r = Renderer(scene_of([tri]), 1, 2, seed=0)
        assert r.backend == "xla"

    def test_mesh_scene_smoke(self):
        v, f = icosphere(1)
        sd = mesh_scene(v, f, width=32, height=24)
        img = Renderer(sd, 2, 3, seed=0).render_rows(0, 24)
        assert img.shape == (24, 32, 3)
        assert np.isfinite(img).all() and img.max() > 0.0

    def test_nee_triangle_casts_shadow(self):
        # A triangle between light and floor must darken the floor under
        # NEE exactly because shadow rays fold triangles (occluded_*).
        light = SphereData(
            center=(0, 6, 0), radius=0.8,
            material=MaterialData(kind=MaterialKind.EMISSIVE, color=(1, 1, 1), param=20.0),
        )
        floor = PlaneData(
            point=(0, 0, 0), normal=(0, 1, 0),
            material=MaterialData(kind=MaterialKind.MATTE, color=(0.8, 0.8, 0.8)),
        )
        blocker = TriangleData(v0=(-2, 3, -2), v1=(2, 3, -2), v2=(0, 3, 3), material=MATTE_RED)
        eye = dict(eye=(0, 4.0, -8), look=(0, 0, 0))
        open_sd = scene_of([light, floor], w=32, h=24, **eye)
        block_sd = scene_of([light, floor, blocker], w=32, h=24, **eye)
        img_open = Renderer(open_sd, 3, 2, seed=0, nee=True).render_rows(0, 24)
        img_block = Renderer(block_sd, 3, 2, seed=0, nee=True).render_rows(0, 24)
        # The floor region under the triangle loses most direct light.
        assert img_block.mean() < img_open.mean() * 0.85


class TestMeshParallel:
    def test_mesh_renderer_matches_single_device(self, devices8):
        from flux_tpu.parallel import MeshRenderer, make_mesh

        v, f = icosphere(1)  # 80 triangles
        sd = mesh_scene(v, f, width=64, height=48)
        mr = MeshRenderer(
            sd, sample_root=2, max_depth=3, seed=0,
            mesh=make_mesh(devices8, rows_shards=2), target_lanes=1 << 16,
        )
        out = mr.render_rows(0, 48)
        single = Renderer(sd, 2, 3, seed=0).render_rows(0, 48)
        np.testing.assert_allclose(out, single, rtol=2e-5, atol=2e-5)
