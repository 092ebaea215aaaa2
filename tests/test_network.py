"""Loopback master↔node tests — the multi-node-on-one-machine pattern the
reference supports implicitly (flux-node binds 0.0.0.0, flux connects to
localhost; SURVEY.md §4 item 4), made into an actual test."""

import queue
import socket
import threading

import numpy as np
import pytest

from flux_tpu import wire
from flux_tpu.image import Image
from flux_tpu.job import JobConfiguration
from flux_tpu.manager import ImageBuilder, RenderManager, RowsReady
from flux_tpu.node import serve
from flux_tpu.render import Renderer
from flux_tpu.workers import LocalWorker, NetworkWorker
from tests.test_manager import tiny_factory
from tests.test_render import env_sphere, make_scene

ENV_HALF = 0.5 * np.array([1.0, 0.9686, 0.8588], np.float32)


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture
def node_endpoint(monkeypatch):
    """Run a flux-node daemon in-process on a free loopback port."""
    import flux_tpu.workers as workers_mod

    # The node's LocalWorker must use the tiny test renderer factory.
    monkeypatch.setattr(workers_mod, "default_renderer_factory", tiny_factory)
    port = free_port()
    ready = threading.Event()
    t = threading.Thread(
        target=serve,
        kwargs=dict(host="127.0.0.1", port=port, max_connections=1, ready_event=ready),
        daemon=True,
    )
    t.start()
    assert ready.wait(timeout=10)
    return f"127.0.0.1:{port}"


def test_wire_roundtrip():
    a, b = socket.socketpair()
    rows = np.arange(2 * 3 * 3, dtype=np.float32).reshape(2, 3, 3)
    wire.send_msg(a, wire.encode_rows(7, rows))
    msg = wire.recv_msg(b)
    assert msg["type"] == "rows_ready" and msg["row_start"] == 7
    np.testing.assert_array_equal(wire.decode_rows(msg), rows)
    a.close()
    b.close()


def test_network_render_matches_local(node_endpoint, tmp_path):
    """A job distributed to a remote node produces the exact local image
    (determinism across processes — the reference cannot do this)."""
    sd = make_scene([env_sphere(0.5)], w=16, h=12)
    cfg = JobConfiguration(sample_root=2, max_trace_depth=3, rows_per_work_unit=3, seed=4)

    net = NetworkWorker(node_endpoint)
    assert net.info().num_devices >= 1
    manager = RenderManager([net.handle()])
    builder = ImageBuilder(output_dir=str(tmp_path))
    handle = manager.schedule_job(sd, cfg, builder.sender())
    assert handle.wait(timeout=180)
    assert builder.wait_finished(timeout=60)
    got = builder.get_image()
    assert got.complete()

    local = Renderer(sd, 2, 3, seed=4, target_lanes=1 << 16).render_image()
    np.testing.assert_array_equal(got.pixels, local)

    manager.stop()
    net.stop()
    builder.stop()


def test_mixed_local_and_network_workers(node_endpoint, tmp_path):
    """Local + remote worker pulling from one queue — the reference's
    default topology (flux/src/main.rs:42-66)."""
    sd = make_scene([env_sphere(0.5)], w=16, h=24)
    cfg = JobConfiguration(sample_root=2, max_trace_depth=2, rows_per_work_unit=2, seed=4)

    local = LocalWorker(renderer_factory=tiny_factory)
    net = NetworkWorker(node_endpoint)
    manager = RenderManager([local.handle(), net.handle()])
    builder = ImageBuilder(output_dir=str(tmp_path))
    handle = manager.schedule_job(sd, cfg, builder.sender())
    assert handle.wait(timeout=180)
    assert builder.wait_finished(timeout=60)
    img = builder.get_image()
    assert img.complete()
    expect = np.broadcast_to(ENV_HALF, img.pixels.shape)
    np.testing.assert_allclose(img.pixels, expect, atol=1e-5)
    manager.stop()
    local.stop()
    net.stop()
    builder.stop()


def test_connect_failure_raises():
    with pytest.raises(OSError):
        NetworkWorker("127.0.0.1:1", connect_timeout=0.5)


def test_node_honors_device_limit(tmp_path):
    """serve(devices=1) must build its renderer over one device (the
    flux-node -t analog, previously parsed but silently ignored)."""
    import socket
    import threading

    from flux_tpu import wire
    from flux_tpu.node import serve

    ready = threading.Event()
    t = threading.Thread(
        target=serve,
        kwargs=dict(host="127.0.0.1", port=0x5EED, max_connections=1,
                    ready_event=ready, devices=1),
        daemon=True,
    )
    t.start()
    assert ready.wait(30)
    conn = socket.create_connection(("127.0.0.1", 0x5EED), timeout=10)
    hello = wire.recv_msg(conn)
    assert hello["type"] == "worker_info"
    wire.send_msg(conn, {"type": "shutdown"})
    conn.close()
    t.join(30)


def test_node_survives_malformed_client():
    """A client sending work_unit before set_job must not kill the daemon."""
    import socket
    import threading

    from flux_tpu import wire
    from flux_tpu.node import serve

    ready = threading.Event()
    t = threading.Thread(
        target=serve,
        kwargs=dict(host="127.0.0.1", port=0x5EEE, max_connections=2,
                    ready_event=ready),
        daemon=True,
    )
    t.start()
    assert ready.wait(30)
    # Bad client: work_unit with no job.
    c1 = socket.create_connection(("127.0.0.1", 0x5EEE), timeout=10)
    wire.recv_msg(c1)
    wire.send_msg(c1, {"type": "work_unit", "row_start": 0, "row_end": 3})
    c1.close()
    # The daemon must still accept and serve a second client.
    c2 = socket.create_connection(("127.0.0.1", 0x5EEE), timeout=10)
    assert wire.recv_msg(c2)["type"] == "worker_info"
    wire.send_msg(c2, {"type": "shutdown"})
    c2.close()
    t.join(30)


def test_cancellation_through_network_path(monkeypatch):
    """Cancel a job mid-render on a network node: the manager's barrier must
    release, the results so far must be delivered, and the SAME connection
    must serve a follow-up job. (The reference hangs its WaitGroup on any
    mid-render network hiccup, SURVEY.md §5 failure-detection.)"""
    import time

    import flux_tpu.workers as workers_mod
    from flux_tpu.job import JobConfiguration
    from flux_tpu.manager import ImageBuilder, RenderManager

    def slow_factory(job):
        time.sleep(0.4)  # keep the job alive long enough to cancel
        return tiny_factory(job)

    monkeypatch.setattr(workers_mod, "default_renderer_factory", slow_factory)
    port = free_port()
    ready = threading.Event()
    t = threading.Thread(
        target=serve,
        kwargs=dict(host="127.0.0.1", port=port, max_connections=1, ready_event=ready),
        daemon=True,
    )
    t.start()
    assert ready.wait(timeout=10)

    net = NetworkWorker(f"127.0.0.1:{port}")
    manager = RenderManager([net.handle()])
    sd = make_scene([env_sphere(0.5)], w=16, h=12)
    cfg = JobConfiguration(sample_root=2, max_trace_depth=2, rows_per_work_unit=2)

    b1 = ImageBuilder(output_dir="/tmp")
    job = manager.schedule_job(sd, cfg, b1.sender())
    time.sleep(0.1)
    job.cancel()
    assert job.wait(timeout=60), "cancelled job must release the barrier"

    # The same node connection must serve a complete follow-up job.
    b2 = ImageBuilder(output_dir="/tmp")
    job2 = manager.schedule_job(sd, cfg, b2.sender())
    assert job2.wait(timeout=120)
    assert b2.wait_finished(timeout=60)
    img = b2.get_image()
    assert img is not None and img.filled_rows.all()

    b1.stop()
    b2.stop()
    net.stop()
    manager.stop()


def test_node_render_failure_reported_not_hung(monkeypatch):
    """A node whose renderer blows up must not hang the master: the node
    sends a job_error frame, the barrier releases, and the job reports the
    failure (the reference's WaitGroup would wait forever)."""
    import time

    import flux_tpu.workers as workers_mod
    from flux_tpu.job import JobConfiguration
    from flux_tpu.manager import ImageBuilder, RenderManager

    def exploding_factory(job):
        raise RuntimeError("injected node failure")

    monkeypatch.setattr(workers_mod, "default_renderer_factory", exploding_factory)
    port = free_port()
    ready = threading.Event()
    t = threading.Thread(
        target=serve,
        kwargs=dict(host="127.0.0.1", port=port, max_connections=1, ready_event=ready),
        daemon=True,
    )
    t.start()
    assert ready.wait(timeout=10)

    net = NetworkWorker(f"127.0.0.1:{port}")
    manager = RenderManager([net.handle()])
    sd = make_scene([env_sphere(0.5)], w=16, h=12)
    cfg = JobConfiguration(sample_root=2, max_trace_depth=2, rows_per_work_unit=4)
    b = ImageBuilder(output_dir="/tmp")
    job = manager.schedule_job(sd, cfg, b.sender())
    assert job.wait(timeout=60), "job must complete instead of hanging"
    assert job.error and "lost after retry" in job.error
    assert not job.ok
    b.stop()
    net.stop()
    manager.stop()


def test_wire_rows_compression_roundtrip():
    """Smooth radiance rows ride the wire zlib-deflated; incompressible
    noise falls back to raw bytes. Both decode bit-exactly."""
    smooth = np.full((4, 64, 3), 0.25, dtype=np.float32)
    msg = wire.encode_rows(0, smooth)
    assert msg.get("enc") == "zlib"
    assert len(msg["data"]) < smooth.nbytes
    np.testing.assert_array_equal(wire.decode_rows(msg), smooth)

    rng = np.random.default_rng(0)
    noise = rng.random((4, 64, 3), dtype=np.float32)
    msg2 = wire.encode_rows(0, noise)
    np.testing.assert_array_equal(wire.decode_rows(msg2), noise)


def test_node_death_mid_render_survivor_completes(tmp_path):
    """A node that DIES mid-job (connection dropped, not a clean job_error
    frame) must not sink the job: the master marks the worker dead, the
    local survivor finishes the frame, and the retry round re-renders the
    units the dead node had pulled. The reference's master would panic
    (manager.rs:158-161) or block forever on the socket."""
    import time as _time

    from flux_tpu.job import Job

    sd = make_scene([env_sphere(0.5)], w=16, h=24)
    cfg = JobConfiguration(
        sample_root=2, max_trace_depth=2, rows_per_work_unit=2, seed=4
    )

    port = free_port()
    ready = threading.Event()

    def fake_node():
        """Speaks the wire protocol: handshake, one rendered unit, then
        drops the connection with a second unit in flight."""
        srv = socket.socket()
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", port))
        srv.listen(1)
        ready.set()
        conn, _ = srv.accept()
        wire.send_msg(
            conn, {"type": "worker_info", "num_devices": 1, "platform": "cpu"}
        )
        job = Job.from_dict(wire.recv_msg(conn)["job"])
        r = tiny_factory(job)
        u = wire.recv_msg(conn)  # first primed unit
        rows = r.render_rows(u["row_start"], u["row_end"] - u["row_start"] + 1)
        wire.send_msg(conn, wire.encode_rows(u["row_start"], rows))
        wire.recv_msg(conn)  # second unit arrives ...
        conn.close()  # ... and the node dies without answering
        srv.close()

    threading.Thread(target=fake_node, daemon=True).start()
    assert ready.wait(timeout=10)

    class Slow:
        def __init__(self, inner):
            self._inner = inner

        def render_rows(self, row0, n_rows):
            _time.sleep(0.02)
            return self._inner.render_rows(row0, n_rows)

    net = NetworkWorker(f"127.0.0.1:{port}")
    local = LocalWorker(renderer_factory=lambda job: Slow(tiny_factory(job)))
    manager = RenderManager([net.handle(), local.handle()])
    builder = ImageBuilder(output_dir=str(tmp_path))
    handle = manager.schedule_job(sd, cfg, builder.sender())
    assert handle.wait(timeout=180)
    assert handle.ok, handle.error
    assert builder.wait_finished(timeout=60)
    img = builder.get_image()
    assert img.complete()
    ref = Renderer(sd, 2, 2, seed=4, target_lanes=1 << 16).render_image()
    np.testing.assert_array_equal(img.pixels, ref)
    assert not net.handle().alive  # the dead link was retired

    manager.stop()
    local.stop()


def test_short_result_block_is_retried_not_a_hole(tmp_path):
    """A node that returns FEWER rows than the unit asked for (buggy or
    dying mid-serialization) must not punch a silent hole in a job that
    reports success: the completion ledger only counts full blocks, so the
    unit lands in the retry round and the survivor re-renders it."""
    import time as _time

    from flux_tpu.job import Job

    sd = make_scene([env_sphere(0.5)], w=16, h=24)
    cfg = JobConfiguration(
        sample_root=2, max_trace_depth=2, rows_per_work_unit=2, seed=4
    )

    port = free_port()
    ready = threading.Event()

    def short_node():
        srv = socket.socket()
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", port))
        srv.listen(1)
        ready.set()
        conn, _ = srv.accept()
        wire.send_msg(
            conn, {"type": "worker_info", "num_devices": 1, "platform": "cpu"}
        )
        job = Job.from_dict(wire.recv_msg(conn)["job"])
        r = tiny_factory(job)
        u = wire.recv_msg(conn)
        # Render only HALF the band, then die with a unit in flight.
        rows = r.render_rows(u["row_start"], 1)
        wire.send_msg(conn, wire.encode_rows(u["row_start"], rows))
        wire.recv_msg(conn)
        conn.close()
        srv.close()

    threading.Thread(target=short_node, daemon=True).start()
    assert ready.wait(timeout=10)

    class Slow:
        def __init__(self, inner):
            self._inner = inner

        def render_rows(self, row0, n_rows):
            _time.sleep(0.02)
            return self._inner.render_rows(row0, n_rows)

    net = NetworkWorker(f"127.0.0.1:{port}")
    local = LocalWorker(renderer_factory=lambda job: Slow(tiny_factory(job)))
    manager = RenderManager([net.handle(), local.handle()])
    builder = ImageBuilder(output_dir=str(tmp_path))
    handle = manager.schedule_job(sd, cfg, builder.sender())
    assert handle.wait(timeout=180)
    assert handle.ok, handle.error
    assert builder.wait_finished(timeout=60)
    img = builder.get_image()
    assert img.complete()
    ref = Renderer(sd, 2, 2, seed=4, target_lanes=1 << 16).render_image()
    np.testing.assert_array_equal(img.pixels, ref)

    manager.stop()
    local.stop()


def test_node_compresses_only_with_capability(monkeypatch):
    """A master that does NOT advertise zlib-rows (an older build) must get
    raw f32 frames; the capability in set_job switches deflate on."""
    import flux_tpu.workers as workers_mod

    from flux_tpu.job import Job, JobConfiguration, JobIDAllocator

    monkeypatch.setattr(workers_mod, "default_renderer_factory", tiny_factory)
    port = free_port()
    ready = threading.Event()
    t = threading.Thread(
        target=serve,
        kwargs=dict(host="127.0.0.1", port=port, max_connections=2, ready_event=ready),
        daemon=True,
    )
    t.start()
    assert ready.wait(timeout=10)
    endpoint = f"127.0.0.1:{port}"

    sd = make_scene([env_sphere(0.5)], w=16, h=64)
    cfg = JobConfiguration(sample_root=1, max_trace_depth=1, rows_per_work_unit=64, seed=0)
    job = Job(id=JobIDAllocator().next_id(), scene_data=sd, config=cfg)

    def run_once(caps):
        host, _, port = endpoint.partition(":")
        conn = socket.create_connection((host, int(port)), timeout=10)
        hello = wire.recv_msg(conn)
        assert hello["type"] == "worker_info"
        msg = {"type": "set_job", "job": job.to_dict()}
        if caps is not None:
            msg["caps"] = caps
        wire.send_msg(conn, msg)
        wire.send_msg(conn, {"type": "work_unit", "row_start": 0, "row_end": 63})
        frame = wire.recv_msg(conn)
        wire.send_msg(conn, {"type": "done"})
        conn.close()
        assert frame["type"] == "rows_ready"
        return frame

    old_master = run_once(caps=None)
    assert "enc" not in old_master  # raw f32, decodable by any version
    np.testing.assert_equal(
        np.frombuffer(old_master["data"], np.float32).size, 64 * 16 * 3
    )
    new_master = run_once(caps=["zlib-rows"])
    # A constant env-sphere render is highly compressible.
    assert new_master.get("enc") == "zlib"
    np.testing.assert_array_equal(
        wire.decode_rows(new_master), wire.decode_rows(old_master)
    )


def test_malformed_width_frame_rejected_and_retried(tmp_path):
    """A node that returns rows with the WRONG WIDTH (malformed frame, not
    just short) must end in a clean job error on that worker and a retried
    unit — never a corrupted image or a dead ImageBuilder thread."""
    import time as _time

    from flux_tpu.job import Job

    sd = make_scene([env_sphere(0.5)], w=16, h=24)
    cfg = JobConfiguration(
        sample_root=2, max_trace_depth=2, rows_per_work_unit=2, seed=4
    )

    port = free_port()
    ready = threading.Event()

    def bad_width_node():
        srv = socket.socket()
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", port))
        srv.listen(1)
        ready.set()
        conn, _ = srv.accept()
        wire.send_msg(
            conn, {"type": "worker_info", "num_devices": 1, "platform": "cpu"}
        )
        job = Job.from_dict(wire.recv_msg(conn)["job"])
        r = tiny_factory(job)
        u = wire.recv_msg(conn)
        rows = r.render_rows(u["row_start"], u["row_end"] - u["row_start"] + 1)
        # Truncate the WIDTH: full row count, wrong shape.
        wire.send_msg(conn, wire.encode_rows(u["row_start"], rows[:, :7]))
        # The master answers with a clean done (the frame decoded, so the
        # stream is synchronized); drain until the connection closes.
        try:
            while True:
                if wire.recv_msg(conn).get("type") == "done":
                    break
        except Exception:
            pass
        conn.close()
        srv.close()

    threading.Thread(target=bad_width_node, daemon=True).start()
    assert ready.wait(timeout=10)

    class Slow:
        def __init__(self, inner):
            self._inner = inner

        def render_rows(self, row0, n_rows):
            _time.sleep(0.02)
            return self._inner.render_rows(row0, n_rows)

    net = NetworkWorker(f"127.0.0.1:{port}")
    local = LocalWorker(renderer_factory=lambda job: Slow(tiny_factory(job)))
    manager = RenderManager([net.handle(), local.handle()])
    builder = ImageBuilder(output_dir=str(tmp_path))
    handle = manager.schedule_job(sd, cfg, builder.sender())
    assert handle.wait(timeout=180)
    assert handle.ok, handle.error
    assert builder.wait_finished(timeout=60)
    img = builder.get_image()
    assert img.complete()
    ref = Renderer(sd, 2, 2, seed=4, target_lanes=1 << 16).render_image()
    np.testing.assert_array_equal(img.pixels, ref)

    manager.stop()
    local.stop()


def test_two_masters_one_node_concurrently(tmp_path):
    """Two masters against ONE node at the same time: the reference's node
    would leave the second hanging in connect until the first master
    finished (serial accept, flux-node/src/main.rs:96-111); this node
    accepts both, reports busy/queued status in the handshake, and renders
    both jobs correctly (serialized on the shared worker)."""
    port = free_port()
    ready = threading.Event()
    t = threading.Thread(
        target=serve,
        kwargs=dict(host="127.0.0.1", port=port, max_connections=2, ready_event=ready),
        daemon=True,
    )
    import flux_tpu.workers as workers_mod

    orig_factory = workers_mod.default_renderer_factory
    workers_mod.default_renderer_factory = tiny_factory
    try:
        t.start()
        assert ready.wait(timeout=10)
        endpoint = f"127.0.0.1:{port}"

        sd_a = make_scene([env_sphere(0.5)], w=16, h=12)
        sd_b = make_scene([env_sphere(0.25)], w=16, h=8)
        cfg = JobConfiguration(
            sample_root=2, max_trace_depth=2, rows_per_work_unit=3, seed=4
        )

        # Both masters connect up front — the second must NOT block.
        net_a = NetworkWorker(endpoint)
        net_b = NetworkWorker(endpoint)

        man_a = RenderManager([net_a.handle()])
        man_b = RenderManager([net_b.handle()])
        ba = ImageBuilder(output_dir=str(tmp_path), filename="a.ppm")
        bb = ImageBuilder(output_dir=str(tmp_path), filename="b.ppm")
        ja = man_a.schedule_job(sd_a, cfg, ba.sender())
        jb = man_b.schedule_job(sd_b, cfg, bb.sender())
        assert ja.wait(timeout=180) and jb.wait(timeout=180)
        assert ja.ok and jb.ok
        assert ba.wait_finished(timeout=60) and bb.wait_finished(timeout=60)
        img_a, img_b = ba.get_image(), bb.get_image()
        assert img_a.complete() and img_b.complete()
        ref_a = Renderer(sd_a, 2, 2, seed=4, target_lanes=1 << 16).render_image()
        ref_b = Renderer(sd_b, 2, 2, seed=4, target_lanes=1 << 16).render_image()
        np.testing.assert_array_equal(img_a.pixels, ref_a)
        np.testing.assert_array_equal(img_b.pixels, ref_b)

        man_a.stop()
        man_b.stop()
        net_a.stop()
        net_b.stop()
        ba.stop()
        bb.stop()
        t.join(30)
    finally:
        workers_mod.default_renderer_factory = orig_factory
