"""Scene schema tests: the reference YAML files must load unmodified."""

import numpy as np
import pytest

from flux_tpu.scene import (
    MaterialKind,
    PlaneData,
    SceneData,
    SphereData,
    compile_scene,
    load_scene,
    loads_scene,
)


def test_demo1_loads():
    sd = load_scene("scenes/demo1.yml")
    assert sd.scene_name == "demo1"
    assert sd.output_settings.image_width == 800
    assert sd.output_settings.image_height == 600
    assert sd.output_settings.pixel_size == 0.5
    assert sd.background == (0.0, 0.0, 0.0)
    assert len(sd.shapes) == 6
    spheres = [s for s in sd.shapes if isinstance(s, SphereData)]
    planes = [p for p in sd.shapes if isinstance(p, PlaneData)]
    assert len(spheres) == 5 and len(planes) == 1
    env = spheres[0]
    assert env.invert and env.radius == 100.0
    assert env.material.kind == MaterialKind.EMISSIVE
    assert env.material.color == (1.0, 0.9686, 0.8588)


def test_demo2_loads_with_anchors():
    """demo2.yml uses top-level YAML anchors for material reuse
    (scenes/demo2.yml:1-15) — they must resolve and the unknown top-level
    keys must be ignored, as serde does."""
    sd = load_scene("scenes/demo2.yml")
    assert sd.scene_name == "demo2"
    assert sd.camera_data.lens_radius == 0.09
    spheres = [s for s in sd.shapes if isinstance(s, SphereData)]
    glossy = [s for s in spheres if s.material.kind == MaterialKind.GLOSSY]
    assert len(glossy) == 10
    exps = sorted({g.material.exponent for g in glossy})
    assert exps == [10.0, 100.0, 10000.0]


def test_roundtrip_dict():
    sd = load_scene("scenes/demo2.yml")
    sd2 = SceneData.from_dict(sd.to_dict())
    assert sd == sd2


def test_compile_scene_soa():
    sd = load_scene("scenes/demo1.yml")
    arr = compile_scene(sd)
    assert arr.num_spheres == 5
    assert arr.num_planes == 1
    assert arr.sphere_center.shape == (5, 3)
    assert arr.mat_kind.shape == (6,)
    # env sphere invert flag becomes -1
    assert float(arr.sphere_invert[0]) == -1.0
    assert float(arr.sphere_invert[1]) == 1.0
    # plane material is last
    assert int(arr.mat_kind[5]) == MaterialKind.MATTE
    np.testing.assert_allclose(np.asarray(arr.background), 0.0)


def test_unknown_material_rejected():
    bad = """
scene_name: x
camera_settings: {eye: [0,0,0], look_at: [0,0,1], up: [0,1,0]}
camera_data: {zoom_factor: 1, view_plane_distance: 500, focal_distance: 10, lens_radius: 0}
output_settings: {image_width: 4, image_height: 4, pixel_size: 1}
background: [0,0,0]
shapes:
  - Sphere:
      center: [0,0,5]
      radius: 1
      material:
        Shiny: {}
      invert: false
"""
    with pytest.raises(ValueError, match="unknown material"):
        loads_scene(bad)


def test_unknown_shape_rejected():
    bad = """
scene_name: x
camera_settings: {eye: [0,0,0], look_at: [0,0,1], up: [0,1,0]}
camera_data: {zoom_factor: 1, view_plane_distance: 500, focal_distance: 10, lens_radius: 0}
output_settings: {image_width: 4, image_height: 4, pixel_size: 1}
background: [0,0,0]
shapes:
  - Torus: {}
"""
    with pytest.raises(ValueError, match="unknown shape"):
        loads_scene(bad)
