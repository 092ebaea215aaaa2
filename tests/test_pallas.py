"""Pallas megakernel parity tests (interpret mode on CPU).

The kernel must produce bit-identical radiance sums to the XLA path — both
consume the same counter-based sample streams and SoA ops, differing only
in scheduling (ops/pallas_kernel.py)."""

import numpy as np
import pytest

from flux_tpu.camera import camera_arrays
from flux_tpu.ops.pallas_kernel import render_block_pallas
from flux_tpu.render import render_block
from flux_tpu.scene import compile_scene, load_scene
from tests.test_render import env_sphere, make_scene
from flux_tpu.scene import MaterialData, MaterialKind, PlaneData, SphereData


def _pair(sd, **kw):
    scene = compile_scene(sd)
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    a = render_block(scene, cam, np.int32(kw.pop("row0", 0)), np.uint32(kw.pop("s0", 0)),
                     np.uint32(kw.pop("seed", 3)), **kw)
    b = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3), interpret=True, **kw
    )
    return np.asarray(a), np.asarray(b)


def test_demo_scene_parity():
    sd = load_scene("scenes/demo2.yml")
    kw = dict(img_w=800, img_h=600, n_rows=3, n_samples=5, root=4, max_depth=5)
    a, b = _pair(sd, **kw)
    np.testing.assert_array_equal(a, b)


def test_sphere_only_scene_parity():
    sd = make_scene([env_sphere(1.0)], w=20, h=6)
    kw = dict(img_w=20, img_h=6, n_rows=6, n_samples=4, root=2, max_depth=3)
    a, b = _pair(sd, **kw)
    np.testing.assert_array_equal(a, b)


def test_plane_only_scene_parity():
    """Zero spheres exercises the unhittable-padding path."""
    floor = PlaneData(
        point=(0.0, 0.0, 0.0),
        normal=(0.0, 1.0, 0.0),
        material=MaterialData(kind=MaterialKind.MATTE, color=(0.5, 0.5, 0.5), param=1.0),
    )
    sd = make_scene([floor], w=16, h=4, background=(0.2, 0.4, 0.6))
    kw = dict(img_w=16, img_h=4, n_rows=4, n_samples=3, root=2, max_depth=2)
    a, b = _pair(sd, **kw)
    np.testing.assert_array_equal(a, b)


def test_no_planes_scene_parity():
    ball = SphereData(
        center=(0.0, 1.0, 0.0),
        radius=1.0,
        material=MaterialData(
            kind=MaterialKind.GLOSSY, color=(0.9, 1.0, 0.9), param=0.9, exponent=100.0
        ),
    )
    sd = make_scene([env_sphere(1.0), ball], w=16, h=8)
    kw = dict(img_w=16, img_h=8, n_rows=8, n_samples=4, root=2, max_depth=4)
    a, b = _pair(sd, **kw)
    np.testing.assert_array_equal(a, b)


def test_sample_chunk_offsets():
    """Non-zero s0 and ragged n_samples vs S_BLK padding."""
    sd = load_scene("scenes/demo1.yml")
    scene = compile_scene(sd)
    cam = camera_arrays(sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size)
    kw = dict(img_w=800, img_h=600, n_rows=2, root=3, max_depth=3)
    a = render_block(scene, cam, np.int32(5), np.uint32(4), np.uint32(7), n_samples=5, **kw)
    b = render_block_pallas(
        scene, cam, np.int32(5), np.uint32(4), np.uint32(7), n_samples=5,
        interpret=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_early_exit_matches_straightline():
    """The whole-tile early exit (VMEM scratch state + pl.when) must be a
    pure scheduling change: bit-identical to the straight-line bounce loop,
    including on a scene where most tiles die at depth 1 (env sphere)."""
    sd = load_scene("scenes/demo2.yml")
    scene = compile_scene(sd)
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    kw = dict(img_w=800, img_h=600, n_rows=2, n_samples=4, root=4, max_depth=5,
              interpret=True)
    a = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3), early_exit=True, **kw
    )
    b = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3), early_exit=False, **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_early_exit_matches_straightline_nee():
    from flux_tpu.ops.nee import extract_lights
    from tests.test_nee import light_scene

    sd = light_scene()
    scene = compile_scene(sd)
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    lights = extract_lights(sd)
    kw = dict(img_w=32, img_h=24, n_rows=8, n_samples=4, root=2, max_depth=3,
              lights=lights, physical=True, interpret=True)
    a = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(0), early_exit=True, **kw
    )
    b = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(0), early_exit=False, **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_skip_matches_unskipped():
    """The per-block AABB skip must be a pure scheduling change: skipped
    blocks are exactly those no live lane's ray enters, so the winner fold
    is untouched — bit-identical output with the skip on or off."""
    from flux_tpu.genscene import sphere_field

    sd = sphere_field(70, 4, width=40, height=24)
    scene = compile_scene(sd)
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    kw = dict(img_w=40, img_h=24, n_rows=24, n_samples=4, root=2, max_depth=3,
              accel="scan", interpret=True)
    a = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3), scan_skip=True, **kw
    )
    b = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3), scan_skip=False, **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_skip_nee_matches_unskipped():
    from flux_tpu.ops.nee import extract_lights
    from flux_tpu.genscene import sphere_field

    sd = sphere_field(70, 4, width=32, height=16)
    scene = compile_scene(sd)
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    lights = extract_lights(sd)
    if lights is None:
        import pytest

        pytest.skip("generated field has no lights")
    kw = dict(img_w=32, img_h=16, n_rows=16, n_samples=4, root=2, max_depth=3,
              accel="scan", lights=lights, interpret=True)
    a = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(1), scan_skip=True, **kw
    )
    b = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(1), scan_skip=False, **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_sphere_free_scene_kernel():
    """Plane-only scene through the megakernel's scan path (regression:
    the sorted layout must tolerate num_spheres == 0)."""
    sd = make_scene(
        [PlaneData(point=(0.0, -1.0, 0.0), normal=(0.0, 1.0, 0.0),
                   material=MaterialData(kind=MaterialKind.MATTE,
                                         color=(0.5, 0.5, 0.5), param=1.0))],
        w=16, h=8,
    )
    scene = compile_scene(sd)
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    kw = dict(img_w=16, img_h=8, n_rows=8, n_samples=2, root=2, max_depth=2)
    a = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(0), accel="scan",
        interpret=True, **kw
    )
    b = render_block(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(0), **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
