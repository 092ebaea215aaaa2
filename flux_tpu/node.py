"""Render-node daemon: serves local TPU devices to a remote master.

Rebuild of flux-node (flux-node/src/main.rs): listens on 0.0.0.0:2000 by
default and keeps one LocalWorker for the process lifetime (main.rs:160).
Per connection: send the WorkerInfo handshake (main.rs:26-31), then dispatch
``set_job`` / ``work_unit`` / ``done`` frames into the worker while a
forwarder thread streams RowsReady results back (main.rs:41-55).

Deviation from the reference, on purpose: the reference accepts ONE master
at a time (serial accept loop, main.rs:96-111) — a second master hangs in
``connect`` until the first finishes. Here every master is accepted
immediately on its own thread; the handshake carries ``busy``/``queued``
status so the newcomer knows it is waiting, and its job queues behind the
active one on the shared LocalWorker (whose request queue serializes jobs).
An idle TPU box refusing work because a long render is already attached was
a poorer trade here than for the reference's CPU boxes.

This is the cross-DCN fallback path — hosts that don't share a JAX mesh.
Hosts in one slice should prefer :mod:`flux_tpu.parallel` collectives over
ICI, which replace this wire entirely.
"""

from __future__ import annotations

import queue
import socket
import threading

from .constants import DEFAULT_PORT
from .debug import d_println
from .job import Job, WorkUnit
from .manager import JobFailed, RowsReady, WaitGroup
from .workers import LocalWorker
from . import wire

__all__ = ["serve", "handle_client"]


def handle_client(conn: socket.socket, worker: LocalWorker) -> None:
    """Serve one master connection (flux-node/src/main.rs:20-91)."""
    info = worker.info()
    wire.send_msg(
        conn,
        {
            "type": "worker_info",
            "num_devices": info.num_devices,
            "platform": info.platform,
            # Concurrent-master status: a second master connects fine but
            # its jobs queue behind the active one (see module docstring).
            "busy": worker.busy,
            "queued": worker.queued_jobs,
        },
    )

    unit_queue = None
    sink = None
    forwarder = None
    wg = None

    def forward_events(q: "queue.Queue", allow_compress: bool) -> None:
        while True:
            ev = q.get()
            if ev is None:
                return
            try:
                if isinstance(ev, RowsReady):
                    wire.send_msg(
                        conn,
                        wire.encode_rows(
                            ev.result.work_unit.row_start, ev.result.rows,
                            allow_compress=allow_compress,
                        ),
                    )
                elif isinstance(ev, JobFailed):
                    wire.send_msg(conn, {"type": "job_error", "reason": ev.reason})
            except OSError:
                return

    def finish_job():
        nonlocal unit_queue, sink, forwarder, wg
        if unit_queue is not None:
            unit_queue.put(None)
            if wg is not None:
                wg.wait(timeout=600)
            if sink is not None:
                sink.put(None)
            if forwarder is not None:
                forwarder.join(timeout=30)
        unit_queue = sink = forwarder = wg = None

    try:
        while True:
            try:
                msg = wire.recv_msg(conn)
            except (ConnectionError, OSError):
                break
            kind = msg.get("type")
            if kind == "set_job":
                finish_job()
                job = Job.from_dict(msg["job"])
                d_println(f"node: set_job {job.id}")
                # Capability gate: only deflate row blocks when THIS master
                # advertised support (older masters read raw f32 bytes).
                allow_compress = "zlib-rows" in msg.get("caps", [])
                unit_queue = queue.Queue()
                sink = queue.Queue()
                wg = WaitGroup()
                wg.add(1)
                forwarder = threading.Thread(
                    target=forward_events, args=(sink, allow_compress), daemon=True
                )
                forwarder.start()
                worker.handle().send(job, unit_queue, sink, wg)
            elif kind == "work_unit":
                if unit_queue is None:
                    # Malformed client; drop the connection, keep serving.
                    d_println("node: work_unit before set_job")
                    break
                unit_queue.put(
                    WorkUnit(
                        row_start=int(msg["row_start"]),
                        row_end=int(msg["row_end"]),
                        job_id=None,
                    )
                )
            elif kind == "done":
                d_println("node: job done")
                finish_job()
            elif kind == "shutdown":
                break
            else:
                d_println(f"node: unexpected message {kind!r}")
                break
    finally:
        finish_job()
        conn.close()


def serve(host: str = "0.0.0.0", port: int = DEFAULT_PORT, *, max_connections=None,
          ready_event: threading.Event = None, devices: int = None) -> None:
    """Accept loop — one thread per master (contrast: the reference serves
    serially, flux-node/src/main.rs:96-111,141-152).

    ``devices`` limits how many local chips the node's renderer drives
    (the flux-node ``-t`` threads analog); default all.
    ``max_connections`` bounds how many connections are ACCEPTED in total
    (tests use it to bound the daemon's life); the daemon exits once they
    all complete."""
    factory = None
    if devices is not None:
        from . import workers as workers_mod

        def factory(job):
            return workers_mod.default_renderer_factory(job, devices=devices)

    worker = LocalWorker(renderer_factory=factory, name="node")
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(8)
    print(f"flux-node-tpu: listening on {host}:{port}")
    if ready_event is not None:
        ready_event.set()
    accepted = 0
    threads = []
    try:
        while max_connections is None or accepted < max_connections:
            conn, addr = srv.accept()
            accepted += 1
            d_println(f"node: connection from {addr}")
            # One thread per master; jobs serialize on the shared worker.
            t = threading.Thread(
                target=handle_client, args=(conn, worker),
                name=f"node-client[{addr}]", daemon=True,
            )
            t.start()
            # Prune finished threads so a long-lived daemon (the
            # max_connections=None default, where the join loop below is
            # unreachable) doesn't accumulate one Thread object per master.
            threads = [x for x in threads if x.is_alive()]
            threads.append(t)
        for t in threads:
            t.join()
    finally:
        srv.close()
        worker.stop()


def main(argv=None) -> int:
    """flux-node CLI (flux-node/src/main.rs:119-152): ``-H/--host``,
    ``-p/--port``, ``-t/--devices`` (how many local chips to serve)."""
    import argparse

    import jax

    p = argparse.ArgumentParser(prog="flux-node-tpu", description="Render node daemon")
    p.add_argument("-H", "--host", default="0.0.0.0")
    p.add_argument("-p", "--port", type=int, default=DEFAULT_PORT)
    def _positive(v):
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError("must be >= 1")
        return n

    p.add_argument(
        "-t", "--devices", type=_positive, default=None,
        help="local devices to serve (default: all)",
    )
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)
    if args.verbose:
        from .debug import set_debug

        set_debug(True)
    n = len(jax.devices())
    print(f"flux-node-tpu: serving {min(args.devices or n, n)} of {n} local devices")
    serve(host=args.host, port=args.port, devices=args.devices)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
