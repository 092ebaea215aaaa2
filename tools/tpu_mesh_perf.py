"""Measure the megakernel triangle fold's production throughput on TPU:
icosphere meshes at three sizes, 800x600, 16 spp, depth 5 — the triangle
analog of the spheres512/4096 scaling points (PERFORMANCE.md)."""
import time, numpy as np
import jax
print(jax.devices())
from flux_tpu.render import Renderer
from flux_tpu.scene import MaterialData, MaterialKind, PlaneData, SphereData, SceneData, OutputSettings, CameraSettings, CameraData
from flux_tpu.meshgen import icosphere, mesh_triangles

def make_scene(shapes, w, h):
    return SceneData(
        scene_name="meshperf", output_settings=OutputSettings(image_width=w, image_height=h, pixel_size=0.5),
        background=(0.05,0.07,0.1), shapes=tuple(shapes),
        camera_settings=CameraSettings(eye=(0.,1.,-9.), look_at=(0.,1.,0.), up=(0.,1.,0.)),
        camera_data=CameraData(zoom_factor=1.0, view_plane_distance=500.0, focal_distance=10.0, lens_radius=0.0),
    )

MATTE = MaterialData(kind=MaterialKind.MATTE, color=(0.7,0.3,0.3), param=1.0)
env = SphereData(center=(0.,0.,0.), radius=100.0, material=MaterialData(kind=MaterialKind.EMISSIVE, color=(1.,1.,1.), param=1.0), invert=True)
floor = PlaneData(point=(0.,-0.2,0.), normal=(0.,1.,0.), material=MaterialData(kind=MaterialKind.MATTE, color=(0.6,0.6,0.6), param=1.0))

W, H, ROOT, DEPTH = 800, 600, 4, 5
for subdiv in (2, 3, 4):
    v, f = icosphere(subdiv)
    tris = mesh_triangles(v, f, MATTE, scale=1.5, offset=(0.0, 1.3, 0.0))
    sd = make_scene([env, floor] + tris, W, H)
    for backend in ("pallas", "xla"):
        try:
            r = Renderer(sd, sample_root=ROOT, max_depth=DEPTH, seed=0, backend=backend)
            t0 = time.time()
            img = r.render_rows(0, H)  # includes device_get
            t_first = time.time() - t0
            t0 = time.time()
            img = r.render_rows(0, H)
            dt = time.time() - t0
            spp = ROOT * ROOT
            ms = W * H * spp / dt / 1e6
            print(f"tris={len(tris):6d} backend={backend:6s} warm={dt:7.3f}s "
                  f"(first {t_first:6.1f}s) {ms:8.1f} Msamples/s mean={img.mean():.4f}")
        except Exception as e:
            print(f"tris={len(tris):6d} backend={backend:6s} FAILED: {e}")
