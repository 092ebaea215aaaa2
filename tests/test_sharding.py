"""Multi-device tests on the virtual 8-CPU mesh.

The key invariant: sharded rendering must produce *bit-identical* radiance
sums to the single-device renderer, because counter-based sampling makes
every lane's stream independent of where it executes (the property the
reference could never have — its per-worker sample tables differ per
process, workers.rs:46-54)."""

import numpy as np
import pytest

import jax

from flux_tpu.parallel import MeshRenderer, make_mesh
from flux_tpu.render import Renderer
from tests.test_render import ENV, env_sphere, make_scene
from flux_tpu.scene import MaterialData, MaterialKind, PlaneData, SphereData


def scene():
    floor = PlaneData(
        point=(0.0, 0.0, 0.0),
        normal=(0.0, 1.0, 0.0),
        material=MaterialData(kind=MaterialKind.MATTE, color=(0.5, 0.5, 0.5), param=1.0),
    )
    ball = SphereData(
        center=(0.0, 1.0, 0.0),
        radius=1.0,
        material=MaterialData(
            kind=MaterialKind.GLOSSY, color=(0.9, 1.0, 0.9), param=0.9, exponent=100.0
        ),
    )
    return make_scene([env_sphere(1.0), floor, ball], w=32, h=16)


@pytest.mark.parametrize("rows_shards,spp_shards", [(1, 8), (8, 1), (2, 4), (4, 2)])
def test_sharded_matches_single_device(devices8, rows_shards, spp_shards):
    sd = scene()
    root, depth, seed = 4, 4, 11
    single = Renderer(sd, root, depth, seed=seed, target_lanes=1 << 18)
    expect = single.render_rows(0, 16)

    mesh = make_mesh(devices8, rows_shards=rows_shards, spp_shards=spp_shards)
    mr = MeshRenderer(sd, root, depth, seed=seed, mesh=mesh, target_lanes=1 << 18)
    got = mr.render_rows(0, 16)
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_sharded_nondivisible_spp(devices8):
    """root=3 → 9 samples over 8 spp-shards: the overhang mask must keep
    the estimator exact."""
    sd = scene()
    single = Renderer(sd, 3, 3, seed=5, target_lanes=1 << 18)
    expect = single.render_rows(0, 16)
    mesh = make_mesh(devices8, rows_shards=1, spp_shards=8)
    mr = MeshRenderer(sd, 3, 3, seed=5, mesh=mesh, target_lanes=1 << 18)
    got = mr.render_rows(0, 16)
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_sharded_nondivisible_rows(devices8):
    """13 rows over 8 row-shards: padding rows render and are cropped."""
    sd = scene()
    single = Renderer(sd, 2, 3, seed=5, target_lanes=1 << 18)
    expect = single.render_rows(0, 13)
    mesh = make_mesh(devices8, rows_shards=8, spp_shards=1)
    mr = MeshRenderer(sd, 2, 3, seed=5, mesh=mesh, target_lanes=1 << 18)
    got = mr.render_rows(0, 13)
    assert got.shape == (13, 32, 3)
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_mesh_shapes():
    with pytest.raises(ValueError):
        make_mesh(jax.devices()[:4], rows_shards=8, spp_shards=1)
    m = make_mesh(jax.devices()[:8], rows_shards=2)
    assert m.shape == {"rows": 2, "spp": 4}


def test_sharded_pallas_backend_matches(devices8):
    """The megakernel inside shard_map (interpret mode) must match the
    single-device XLA renderer exactly."""
    sd = scene()
    single = Renderer(sd, 4, 4, seed=11, target_lanes=1 << 18, backend="xla")
    expect = single.render_rows(0, 16)
    mesh = make_mesh(devices8, rows_shards=2, spp_shards=4)
    mr = MeshRenderer(sd, 4, 4, seed=11, mesh=mesh, backend="pallas", interpret=True)
    got = mr.render_rows(0, 16)
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_interleaved_rows_shards_uneven(devices8):
    """rows_shards=4 with a height not divisible by it: the interleaved
    (strided) row assignment must de-interleave back to the exact
    single-device image, padding rows cropped."""
    from flux_tpu.parallel import MeshRenderer, make_mesh
    from flux_tpu.render import Renderer
    from tests.test_render import env_sphere, make_scene
    from flux_tpu.scene import MaterialData, MaterialKind, PlaneData, SphereData

    mat = MaterialData(kind=MaterialKind.MATTE, color=(0.6, 0.4, 0.3), param=1.0)
    shapes = [
        env_sphere(0.7),
        SphereData(center=(0.0, 0.6, 0.0), radius=0.6, material=mat),
        PlaneData(point=(0.0, 0.0, 0.0), normal=(0.0, 1.0, 0.0), material=mat),
    ]
    sd = make_scene(shapes, w=24, h=10)  # 10 rows, 4 shards -> n_local=3, pad 2
    mesh = make_mesh(devices8, rows_shards=4)
    mr = MeshRenderer(sd, sample_root=4, max_depth=3, seed=5, mesh=mesh)
    single = Renderer(sd, sample_root=4, max_depth=3, seed=5)
    import numpy as np

    np.testing.assert_allclose(
        mr.render_rows(0, 10), single.render_rows(0, 10), rtol=2e-5, atol=2e-5
    )


class TestAutoMeshShape:
    """pick_mesh_shape / make_mesh(rows_shards=None): sample-only sharding
    at demo scale; the 'rows' axis engages automatically when an spp-only
    split would be memory-bound (the reason the axis exists)."""

    def test_demo_scale_stays_sample_only(self):
        from flux_tpu.parallel.mesh import pick_mesh_shape

        assert pick_mesh_shape(8, 600, 800) == (1, 8)
        assert pick_mesh_shape(4, 600, 800) == (1, 4)
        assert pick_mesh_shape(1, 600, 800) == (1, 1)

    def test_tall_frame_engages_rows(self):
        from flux_tpu.parallel.mesh import ROWS_LANE_BUDGET, pick_mesh_shape

        # A frame whose per-sample wavefront exceeds the budget splits rows
        # until each device's share fits (or devices run out).
        rows = 4 * ROWS_LANE_BUDGET // 800
        r, s = pick_mesh_shape(8, rows, 800)
        assert r == 4 and s == 2
        assert rows * 800 // r <= ROWS_LANE_BUDGET
        # Out of devices: clamps at n_devices.
        r, s = pick_mesh_shape(2, rows, 800)
        assert (r, s) == (2, 1)

    def test_make_mesh_auto_uses_hints(self, devices8):
        from flux_tpu.parallel.mesh import ROWS_LANE_BUDGET

        tall = 4 * ROWS_LANE_BUDGET // 800
        m = make_mesh(devices8, rows_shards=None, n_rows_hint=tall, n_cols_hint=800)
        assert m.shape["rows"] == 4 and m.shape["spp"] == 2
        m2 = make_mesh(devices8, rows_shards=None, n_rows_hint=600, n_cols_hint=800)
        assert m2.shape["rows"] == 1 and m2.shape["spp"] == 8

    def test_auto_rows_sharded_matches_single_device(self, devices8, monkeypatch):
        """A frame that triggers automatic row sharding still renders the
        exact single-device image (budget shrunk so a test-sized frame is
        'tall')."""
        import flux_tpu.parallel.mesh as mesh_mod

        sd = scene()  # 32x16
        monkeypatch.setattr(mesh_mod, "ROWS_LANE_BUDGET", 128)
        mr = MeshRenderer(sd, sample_root=2, max_depth=3, seed=9, rows_shards=None,
                          target_lanes=1 << 16)
        assert mr.mesh.shape["rows"] > 1
        got = mr.render_image()
        ref = Renderer(sd, 2, 3, seed=9, target_lanes=1 << 16).render_image()
        np.testing.assert_array_equal(got, ref)
