"""Renderer correctness tests: analytic radiometry on tiny scenes.

The reference's estimator is simple enough that several configurations have
closed-form expected values; these pin the wavefront implementation to the
reference semantics (scene.rs:162-172, materials.rs, trace.rs:85-87).
"""

import numpy as np
import pytest

from flux_tpu.render import Renderer, plan_chunks
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

ENV = (1.0, 0.9686, 0.8588)


def make_scene(shapes, w=16, h=12, background=(0.0, 0.0, 0.0), lens_radius=0.0):
    return SceneData(
        scene_name="test",
        output_settings=OutputSettings(image_width=w, image_height=h, pixel_size=0.5),
        background=background,
        shapes=tuple(shapes),
        camera_settings=CameraSettings(
            eye=(0.0, 1.0, -9.0), look_at=(0.0, 1.0, 0.0), up=(0.0, 1.0, 0.0)
        ),
        camera_data=CameraData(
            zoom_factor=1.0,
            view_plane_distance=500.0,
            focal_distance=10.0,
            lens_radius=lens_radius,
        ),
    )


def env_sphere(power=1.0):
    return SphereData(
        center=(0.0, 0.0, 0.0),
        radius=100.0,
        material=MaterialData(kind=MaterialKind.EMISSIVE, color=ENV, param=power),
        invert=True,
    )


def render(sd, root=4, depth=5, seed=3):
    r = Renderer(sd, sample_root=root, max_depth=depth, seed=seed, target_lanes=1 << 18)
    return r.render_image()


def test_background_only():
    """No shapes: every pixel is exactly the background (scene.rs:168)."""
    img = render(make_scene([], background=(0.25, 0.5, 0.75)))
    assert np.allclose(img, np.array([0.25, 0.5, 0.75]), atol=1e-6)


def test_env_sphere_direct():
    """Camera inside an inverted emissive sphere sees color×power exactly."""
    img = render(make_scene([env_sphere(power=0.5)]))
    assert np.allclose(img, 0.5 * np.array(ENV), atol=1e-5)


def test_env_sphere_not_facing_is_black():
    """Non-inverted emissive sphere seen from inside: normal points away
    from the ray origin side, so the facing test fails (materials.rs:44-49)."""
    sph = SphereData(
        center=(0.0, 0.0, 0.0),
        radius=100.0,
        material=MaterialData(kind=MaterialKind.EMISSIVE, color=ENV, param=1.0),
        invert=False,
    )
    img = render(make_scene([sph]))
    assert np.allclose(img, 0.0, atol=1e-6)


def test_matte_plane_single_bounce_albedo():
    """A matte floor under a uniform env light: every bounce multiplies by
    the albedo, every path escapes to the env after >=1 bounce, so a pixel
    looking at the floor converges to albedo × env (exact here because the
    env is uniform and the scene has one bounce surface). Camera looks
    straight down so every pixel hits the floor."""
    floor = PlaneData(
        point=(0.0, 0.0, 0.0),
        normal=(0.0, 1.0, 0.0),
        material=MaterialData(
            kind=MaterialKind.MATTE, color=(0.5, 0.5, 0.5), param=1.0
        ),
    )
    sd = make_scene([env_sphere(1.0), floor], w=32, h=24)
    from dataclasses import replace

    sd = replace(
        sd,
        camera_settings=CameraSettings(
            eye=(0.0, 5.0, 0.0), look_at=(0.0, 0.0, 0.0), up=(0.0, 0.0, 1.0)
        ),
    )
    img = render(sd, root=4)
    expect = 0.5 * np.array(ENV)
    # Near-tangent bounces occasionally re-hit the floor (a second ×0.5),
    # so pixels lie in [albedo²·env, albedo·env]; the mean sits at the top.
    assert np.allclose(img.mean(axis=(0, 1)), expect, atol=2e-3)
    assert (img <= expect + 1e-4).all()
    assert (img >= 0.25 * np.array(ENV) - 1e-4).all()


def test_perfect_mirror_sees_env():
    """A perfect mirror with kr=1, cr=white reflects the env exactly."""
    mirror = SphereData(
        center=(0.0, 1.0, 0.0),
        radius=1.0,
        material=MaterialData(
            kind=MaterialKind.REFLECTIVE, color=(1.0, 1.0, 1.0), param=1.0
        ),
    )
    sd = make_scene([env_sphere(1.0), mirror], w=16, h=12)
    img = render(sd)
    # Center pixels view the mirror head-on; one bounce to the env.
    assert np.allclose(img[6, 8], np.array(ENV), atol=1e-4)


def test_depth_cap_blackens_trapped_paths():
    """Two facing mirrors: paths never terminate, so with any finite depth
    the estimator returns black (scene.rs:164-165)."""
    mirror = MaterialData(kind=MaterialKind.REFLECTIVE, color=(1.0, 1.0, 1.0), param=1.0)
    a = PlaneData(point=(0.0, 0.0, 0.0), normal=(0.0, 0.0, -1.0), material=mirror)
    b = PlaneData(point=(0.0, 0.0, -20.0), normal=(0.0, 0.0, 1.0), material=mirror)
    img = render(make_scene([a, b], background=(9.0, 9.0, 9.0)), depth=3)
    assert np.allclose(img, 0.0, atol=1e-6)


def test_max_to_one_tonemap():
    """Pixels brighter than 1 are scaled by 1/max channel (color.rs:35-44)."""
    img = render(make_scene([env_sphere(power=10.0)]))
    # raw = 10*ENV -> max channel 10 -> scaled to ENV exactly
    assert np.allclose(img, np.array(ENV), atol=1e-5)
    assert img.max() <= 1.0 + 1e-6


def test_determinism_same_seed():
    sd = make_scene([env_sphere(1.0)])
    a = render(sd, seed=7)
    b = render(sd, seed=7)
    assert np.array_equal(a, b)


def test_seed_changes_noise():
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
    sd = make_scene([env_sphere(1.0), floor, ball])
    a = render(sd, seed=1, root=2)
    b = render(sd, seed=2, root=2)
    assert not np.array_equal(a, b)


def test_glossy_converges_to_mirror_at_high_exponent():
    """exponent→inf collapses the Phong lobe to the mirror direction."""
    def ball(exp):
        return SphereData(
            center=(0.0, 1.0, 0.0),
            radius=1.0,
            material=MaterialData(
                kind=MaterialKind.GLOSSY,
                color=(1.0, 1.0, 1.0),
                param=1.0,
                exponent=exp,
            ),
        )

    sd_g = make_scene([env_sphere(1.0), ball(1e7)], w=16, h=12)
    img_g = render(sd_g, root=4)
    assert np.allclose(img_g[6, 8], np.array(ENV), atol=1e-3)


def test_chunked_equals_unchunked():
    """Sample chunking must not change the result (pure accumulation)."""
    floor = PlaneData(
        point=(0.0, 0.0, 0.0),
        normal=(0.0, 1.0, 0.0),
        material=MaterialData(kind=MaterialKind.MATTE, color=(0.5, 0.5, 0.5), param=1.0),
    )
    sd = make_scene([env_sphere(1.0), floor], w=16, h=12)
    big = Renderer(sd, sample_root=4, max_depth=5, seed=5, target_lanes=1 << 22)
    small = Renderer(sd, sample_root=4, max_depth=5, seed=5, target_lanes=16 * 12 * 2)
    a = big.render_image()
    b = small.render_image()
    assert np.allclose(a, b, atol=1e-5)


def test_plan_chunks():
    assert plan_chunks(10, 4) == [(0, 4), (4, 4), (8, 2)]
    assert plan_chunks(8, 4) == [(0, 4), (4, 4)]
    assert plan_chunks(3, 100) == [(0, 3)]
    assert plan_chunks(1, 1) == [(0, 1)]


def test_work_unit_rows_match_full_image():
    sd = make_scene([env_sphere(1.0)], w=16, h=12)
    r = Renderer(sd, sample_root=2, max_depth=5, seed=9, target_lanes=1 << 18)
    full = r.render_image()
    band = r.render_rows(4, 3)
    assert np.array_equal(full[4:7], band)
