"""Subprocess body for test_distributed: one of two hosts cooperatively
rendering a frame over a global jax.distributed CPU mesh (the DCN analog
of a multi-host TPU slice; SURVEY.md §5 distributed backend)."""
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flux_tpu.parallel.distributed import init_multihost

init_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)

import numpy as np

from flux_tpu.parallel import MeshRenderer, make_mesh
from flux_tpu.render import Renderer
from flux_tpu.scene import load_scene

sd = load_scene(os.path.join(os.path.dirname(__file__), "..", "scenes", "demo1.yml"))
from dataclasses import replace

from flux_tpu.scene import OutputSettings

sd = replace(
    sd, output_settings=OutputSettings(image_width=24, image_height=12, pixel_size=20.0)
)

H = sd.output_settings.image_height
# rows_shards=1: the output is replicated across the spp axis, so every
# process can device_get the full frame.
mr = MeshRenderer(
    sd, sample_root=2, max_depth=2, seed=3,
    mesh=make_mesh(jax.devices(), rows_shards=1), target_lanes=1 << 16,
)
img = mr.render_rows(0, H)
single = Renderer(
    sd, sample_root=2, max_depth=2, seed=3, target_lanes=1 << 16
).render_rows(0, H)
np.testing.assert_allclose(img, single, rtol=2e-5, atol=2e-5)
print(f"proc{pid} DIST-RENDER-OK", flush=True)
