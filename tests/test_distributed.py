"""Multi-host (jax.distributed) smoke test on CPU: two OS processes join a
global 4-device mesh and cooperatively render one frame — the DCN analog of
multi-host TPU slices, exercising flux_tpu.parallel.distributed end-to-end
(loopback, the same pattern as the reference's flux-node-on-one-machine
testing; SURVEY.md §4 item 4)."""

import os
import socket
import subprocess
import sys

import pytest


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_render():
    worker = os.path.join(os.path.dirname(__file__), "dist_render_worker.py")
    port = str(free_port())
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed render timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        assert f"proc{pid} DIST-RENDER-OK" in out


def test_two_process_rows_sharded_render(tmp_path):
    """rows_shards=2 across two processes: each host device_gets ONLY its
    row shard (render_rows_local) and the master assembles the frame —
    matching the single-device render exactly. Round 1 pinned rows=1
    (every host held the full frame); this is the real flux-node row-band
    analog over DCN."""
    worker = os.path.join(os.path.dirname(__file__), "dist_rows_worker.py")
    port = str(free_port())
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    outs_paths = [str(tmp_path / f"shard{pid}.npz") for pid in (0, 1)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), port, outs_paths[pid]],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("rows-sharded distributed render timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-3000:]}"
        assert f"proc{pid} DIST-ROWS-OK" in out

    import numpy as np

    # Master assembly: stitch both shards into the frame.
    frame = np.full((13, 24, 3), np.nan, np.float32)
    all_rows = []
    for path in outs_paths:
        z = np.load(path)
        frame[z["rows"]] = z["pixels"]
        all_rows.extend(z["rows"].tolist())
    assert sorted(all_rows) == list(range(13))  # disjoint, complete cover
    assert np.isfinite(frame).all()

    # Equals the single-device render (CPU, same counters).
    import subprocess as sp

    check = sp.run(
        [sys.executable, "-c", """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %r)
import numpy as np
from dataclasses import replace
from flux_tpu.render import Renderer
from flux_tpu.scene import OutputSettings, load_scene
sd = load_scene(os.path.join(%r, "..", "scenes", "demo1.yml"))
sd = replace(sd, output_settings=OutputSettings(image_width=24, image_height=13, pixel_size=20.0))
img = Renderer(sd, 2, 2, seed=3, target_lanes=1 << 16).render_image()
np.save(%r, img)
""" % (os.path.dirname(os.path.dirname(__file__)), os.path.dirname(__file__),
       str(tmp_path / "single.npy"))],
        capture_output=True, text=True, env=env, timeout=480,
    )
    assert check.returncode == 0, check.stdout + check.stderr
    single = np.load(str(tmp_path / "single.npy"))
    np.testing.assert_allclose(frame, single, rtol=2e-5, atol=2e-5)
