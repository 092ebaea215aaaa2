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
