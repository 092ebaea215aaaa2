"""Thin-lens camera: orthonormal basis and vectorized primary-ray generation.

The math mirrors the reference exactly — basis construction
(fluxcore/src/scene.rs:22-35), thin-lens ray direction (trace.rs:44-51) and
the per-pixel view-plane coordinates including the reference's ``img_h - row``
vertical flip quirk (trace.rs:75) — but generates a whole wavefront of rays
as one fused computation instead of one Ray per loop iteration
(trace.rs:71-80).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax.numpy as jnp
import jax.tree_util
import numpy as np

from .scene import CameraData, CameraSettings
from .vec import Vec3, normalize

__all__ = ["CameraBasis", "CameraArrays", "camera_arrays", "primary_rays"]


@dataclass(frozen=True)
class CameraBasis:
    """Orthonormal (u, v, w) view basis (scene.rs:22-35): w points from
    look_at toward the eye; u is right; v is up in view space."""

    u: np.ndarray
    v: np.ndarray
    w: np.ndarray

    @staticmethod
    def new(s: CameraSettings) -> "CameraBasis":
        eye = np.asarray(s.eye, np.float64)
        look_at = np.asarray(s.look_at, np.float64)
        up = np.asarray(s.up, np.float64)
        w = eye - look_at
        w = w / np.linalg.norm(w)
        u = np.cross(up, w)
        u = u / np.linalg.norm(u)
        v = np.cross(w, u)
        return CameraBasis(u=u, v=v, w=w)


@dataclass(frozen=True)
class CameraArrays:
    """Device-side camera constants (a pytree; one per compiled scene)."""

    eye: jnp.ndarray  # (3,)
    u: jnp.ndarray  # (3,)
    v: jnp.ndarray  # (3,)
    w: jnp.ndarray  # (3,)
    focal_distance: jnp.ndarray  # ()
    lens_radius: jnp.ndarray  # ()
    # focal_distance / view_plane_distance (trace.rs:45)
    vp_factor: jnp.ndarray  # ()
    # pixel_size / zoom_factor (trace.rs:60)
    adjusted_pixel_size: jnp.ndarray  # ()


jax.tree_util.register_dataclass(
    CameraArrays,
    data_fields=[f.name for f in dataclasses.fields(CameraArrays)],
    meta_fields=[],
)


def camera_arrays(
    settings: CameraSettings, data: CameraData, pixel_size: float
) -> CameraArrays:
    basis = CameraBasis.new(settings)
    f32 = lambda x: jnp.asarray(np.asarray(x, np.float32))
    return CameraArrays(
        eye=f32(settings.eye),
        u=f32(basis.u),
        v=f32(basis.v),
        w=f32(basis.w),
        focal_distance=f32(data.focal_distance),
        lens_radius=f32(data.lens_radius),
        vp_factor=f32(data.focal_distance / data.view_plane_distance),
        adjusted_pixel_size=f32(pixel_size / data.zoom_factor),
    )


def primary_rays(cam: CameraArrays, row, col, img_w: int, img_h: int, sx, sy, lx, ly):
    """Generate thin-lens primary rays for a wavefront (SoA lanes).

    ``row``/``col`` are integer arrays (any broadcastable shape), ``sx``/``sy``
    the unit-square anti-aliasing jitter, ``lx``/``ly`` the unit-disc lens
    sample. Returns ``(origin, direction)`` as :class:`flux_tpu.vec.Vec3`.

    View-plane coordinates match trace.rs:72-75 (including the ``img_h - row``
    convention — row 0 is the image top) and the thin-lens direction matches
    trace.rs:44-51: the pixel point is scaled to the focal plane and the ray
    leaves the perturbed lens point toward it.
    """
    half_w = np.float32(img_w * 0.5)
    half_h = np.float32(img_h * 0.5)
    px = cam.adjusted_pixel_size * (col.astype(jnp.float32) - half_w + sx)
    py = cam.adjusted_pixel_size * (
        (np.float32(img_h) - row.astype(jnp.float32)) - half_h + sy
    )

    lpx = lx * cam.lens_radius
    lpy = ly * cam.lens_radius

    dx = px * cam.vp_factor - lpx
    dy = py * cam.vp_factor - lpy

    u, v, w = Vec3.splat(cam.u), Vec3.splat(cam.v), Vec3.splat(cam.w)
    d = Vec3(
        dx * u.x + dy * v.x - cam.focal_distance * w.x,
        dx * u.y + dy * v.y - cam.focal_distance * w.y,
        dx * u.z + dy * v.z - cam.focal_distance * w.z,
    )
    d = normalize(d)
    o = Vec3(
        cam.eye[0] + lpx * u.x + lpy * v.x,
        cam.eye[1] + lpx * u.y + lpy * v.y,
        cam.eye[2] + lpx * u.z + lpy * v.z,
    )
    return o, d
