"""Camera math unit tests against hand-computed values (trace.rs:44-51,
scene.rs:22-35)."""

import numpy as np
import pytest

from flux_tpu.camera import CameraBasis, camera_arrays, primary_rays
from flux_tpu.scene import CameraData, CameraSettings

import jax.numpy as jnp


def test_basis_orthonormal_right_handed():
    s = CameraSettings(eye=(2.5, 1.5, -9.0), look_at=(2.5, 1.0, 0.0), up=(0, 1, 0))
    b = CameraBasis.new(s)
    for v in (b.u, b.v, b.w):
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-12)
    assert np.dot(b.u, b.v) == pytest.approx(0.0, abs=1e-12)
    assert np.dot(b.v, b.w) == pytest.approx(0.0, abs=1e-12)
    # w points from look_at toward the eye
    assert b.w @ (np.array(s.eye) - np.array(s.look_at)) > 0
    # u = up × w (right), v = w × u
    np.testing.assert_allclose(np.cross(b.w, b.u), b.v, atol=1e-12)


def test_axis_aligned_center_ray():
    s = CameraSettings(eye=(0, 0, -10.0), look_at=(0, 0, 0), up=(0, 1, 0))
    d = CameraData(zoom_factor=1.0, view_plane_distance=500.0, focal_distance=10.0, lens_radius=0.0)
    cam = camera_arrays(s, d, pixel_size=0.5)
    # Center of a 2x2 image: row=1, col=1, sample at (0,0) -> px=0.5*(1-1+0)=0
    # py = 0.5*((2-1)-1+0) = 0 -> straight down -w
    row = jnp.asarray([[1]], jnp.int32)
    col = jnp.asarray([[1]], jnp.int32)
    z = jnp.zeros((1, 1), jnp.float32)
    o, dd = primary_rays(cam, row, col, 2, 2, z, z, z, z)
    assert float(dd.z[0, 0]) == pytest.approx(1.0, abs=1e-6)  # -w = +z
    assert float(o.x[0, 0]) == 0.0 and float(o.z[0, 0]) == -10.0


def test_view_plane_scaling():
    """Pixel offset maps through focal/view-plane ratio (trace.rs:44-49):
    direction before normalize is (px·f/v)·u + (py·f/v)·v − f·w."""
    s = CameraSettings(eye=(0, 0, 0), look_at=(0, 0, 1), up=(0, 1, 0))
    d = CameraData(zoom_factor=2.0, view_plane_distance=100.0, focal_distance=10.0, lens_radius=0.0)
    cam = camera_arrays(s, d, pixel_size=1.0)
    # adjusted pixel size = 1/2; img 4x4, row=0,col=3, s=(0.5, 0.5)
    row = jnp.asarray([[0]], jnp.int32)
    col = jnp.asarray([[3]], jnp.int32)
    half = jnp.full((1, 1), 0.5, jnp.float32)
    z = jnp.zeros((1, 1), jnp.float32)
    o, dd = primary_rays(cam, row, col, 4, 4, half, half, z, z)
    px = 0.5 * (3 - 2 + 0.5)  # 0.75
    py = 0.5 * ((4 - 0) - 2 + 0.5)  # 1.25
    expect = np.array([px * 0.1 * -1.0, py * 0.1, 10.0])  # u=-x for this basis
    expect /= np.linalg.norm(expect)
    got = np.array([float(dd.x[0, 0]), float(dd.y[0, 0]), float(dd.z[0, 0])])
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_thin_lens_offsets_origin_and_converges_at_focal_plane():
    s = CameraSettings(eye=(0, 0, 0), look_at=(0, 0, 1), up=(0, 1, 0))
    d = CameraData(zoom_factor=1.0, view_plane_distance=500.0, focal_distance=10.0, lens_radius=0.5)
    cam = camera_arrays(s, d, pixel_size=0.5)
    row = jnp.asarray([[1]], jnp.int32)
    col = jnp.asarray([[1]], jnp.int32)
    z = jnp.zeros((1, 1), jnp.float32)
    lens = jnp.full((1, 1), 0.8, jnp.float32)  # lens sample (0.8, 0)
    o, dd = primary_rays(cam, row, col, 2, 2, z, z, lens, z)
    # origin shifted by lens_radius * 0.8 along u
    assert abs(float(o.x[0, 0])) == pytest.approx(0.4, abs=1e-6)
    # The ray through the lens point must hit the same focal-plane point as
    # the central ray: at t where z = focal_distance.
    t = d.focal_distance / float(dd.z[0, 0])
    hit_x = float(o.x[0, 0]) + t * float(dd.x[0, 0])
    # central pinhole ray for this pixel goes straight to (0, 0, 10)
    assert hit_x == pytest.approx(0.0, abs=1e-5)
