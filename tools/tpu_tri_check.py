import time, numpy as np
import jax
print(jax.devices())
from flux_tpu.render import Renderer
from flux_tpu.scene import MaterialData, MaterialKind, PlaneData, SphereData, SceneData, OutputSettings, CameraSettings, CameraData
from flux_tpu.meshgen import icosphere, mesh_triangles

def make_scene(shapes, w, h):
    return SceneData(
        scene_name="t", output_settings=OutputSettings(image_width=w, image_height=h, pixel_size=0.5),
        background=(0.1,0.2,0.3), shapes=tuple(shapes),
        camera_settings=CameraSettings(eye=(0.,1.,-9.), look_at=(0.,1.,0.), up=(0.,1.,0.)),
        camera_data=CameraData(zoom_factor=1.0, view_plane_distance=500.0, focal_distance=10.0, lens_radius=0.0),
    )

MATTE_RED = MaterialData(kind=MaterialKind.MATTE, color=(0.7,0.3,0.3), param=1.0)
env = SphereData(center=(0.,0.,0.), radius=100.0, material=MaterialData(kind=MaterialKind.EMISSIVE, color=(1.,1.,1.), param=1.0), invert=True)
glossy = SphereData(center=(1.5,0.5,1.0), radius=0.5, material=MaterialData(kind=MaterialKind.GLOSSY, color=(0.9,1.0,0.9), param=0.9, exponent=50.0))
floor = PlaneData(point=(0.,0.,0.), normal=(0.,1.,0.), material=MATTE_RED)
v,f = icosphere(1)
tris = mesh_triangles(v, f, MATTE_RED, scale=1.0, offset=(0.0,1.0,0.0))
sd = make_scene([env, glossy, floor] + tris, 64, 48)

t0=time.time()
rp = Renderer(sd, sample_root=4, max_depth=3, seed=0, backend="pallas")
a = rp.render_rows(0, 48)
print("pallas compile+run:", round(time.time()-t0,1), "s; backend:", rp.backend)
t0=time.time()
rx = Renderer(sd, sample_root=4, max_depth=3, seed=0, backend="xla")
b = rx.render_rows(0, 48)
print("xla compile+run:", round(time.time()-t0,1), "s")
ai = a.view(np.int32).astype(np.int64); bi = b.view(np.int32).astype(np.int64)
ai = np.where(ai<0, np.int64(-0x80000000)-ai, ai); bi = np.where(bi<0, np.int64(-0x80000000)-bi, bi)
print("max ulp distance:", np.abs(ai-bi).max(), " max |diff|:", np.abs(a-b).max(), " n diff:", (a!=b).sum(), "/", a.size)
