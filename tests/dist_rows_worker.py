"""Subprocess body for the rows-sharded multi-host test: one of two hosts
rendering a rows_shards=2 frame over a global jax.distributed mesh, then
persisting ONLY its addressable row shard for the master (the pytest
process) to assemble — the DCN analog of flux-node row bands
(workers.rs:105-243)."""
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flux_tpu.parallel.distributed import init_multihost

init_multihost(f"127.0.0.1:{port}", num_processes=2, process_id=pid)

import numpy as np

from flux_tpu.parallel import MeshRenderer, make_mesh
from flux_tpu.scene import load_scene

sd = load_scene(os.path.join(os.path.dirname(__file__), "..", "scenes", "demo1.yml"))
from dataclasses import replace

from flux_tpu.scene import OutputSettings

sd = replace(
    sd, output_settings=OutputSettings(image_width=24, image_height=13, pixel_size=20.0)
)
H = sd.output_settings.image_height

# Global mesh: 2 processes x 2 local devices = (rows=2, spp=2). Each
# process owns one rows shard; its devices replicate that shard over spp.
mr = MeshRenderer(
    sd, sample_root=2, max_depth=2, seed=3,
    mesh=make_mesh(jax.devices(), rows_shards=2, spp_shards=2),
    target_lanes=1 << 16,
)
rows_idx, pixels = mr.render_rows_local(0, H)
assert len(rows_idx) > 0, "each process must own a rows shard"
np.savez(out_path, rows=rows_idx, pixels=pixels)
print(f"proc{pid} DIST-ROWS-OK n={len(rows_idx)}", flush=True)
