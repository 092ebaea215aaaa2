"""flux-tpu master CLI — the ``flux`` binary equivalent.

Flag surface mirrors flux/src/main.rs:126-205: positional scene file,
``-n/--node`` (repeatable), ``-d/--depth`` (default 5), ``-R/--rows``
(default 50), ``-L/--no-local``, ``-g/--preview``, ``-r/--root`` (default
1).  The reference's ``-t/--threads`` becomes ``-t/--devices``: how many
local chips to drive (default: all).  Added flags without a reference
analog: ``--seed`` (deterministic renders — the reference has none),
``--rows-shards`` (tile-sharding axis of the device mesh), ``--png``,
``--output-dir``.

The live preview (``-g``) replaces the reference's SDL window
(flux/src/main.rs:216-323) with an IN-TERMINAL live view (kitty graphics
or ANSI half-blocks, flux_tpu/termview.py) drawn in place as work units
land, plus a progressive ``<scene>-preview.png`` for non-TTY use — both
suited to zero-display TPU hosts.

Run: ``python -m flux_tpu.cli scenes/demo2.yml -r 128 -d 5``
"""

from __future__ import annotations

import argparse
import sys
import time

from .debug import d_println, set_debug
from .job import JobConfiguration
from .manager import ImageBuilder, MultiSink, RenderManager
from .scene import load_scene

DEFAULT_SAMPLE_ROOT = 1
DEFAULT_DEPTH = 5
DEFAULT_ROWS_PER_UNIT = 50


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="flux-tpu", description="TPU-native distributed Monte Carlo path tracer"
    )
    p.add_argument("scene_file", help="YAML scene file")
    p.add_argument(
        "-n",
        "--node",
        action="append",
        default=[],
        metavar="ADDR[:PORT]",
        help="render node to connect to (repeatable)",
    )
    p.add_argument("-d", "--depth", type=int, default=DEFAULT_DEPTH, help="maximum trace depth")
    p.add_argument(
        "-R", "--rows", type=int, default=DEFAULT_ROWS_PER_UNIT, help="rows per work unit"
    )
    p.add_argument(
        "-L", "--no-local", action="store_true", help="do not use a local render worker"
    )
    p.add_argument("-g", "--preview", action="store_true", help="write a live preview PNG")
    p.add_argument(
        "-t",
        "--devices",
        type=int,
        default=None,
        help="number of local devices to use (default: all)",
    )
    p.add_argument("-r", "--root", type=int, default=DEFAULT_SAMPLE_ROOT, help="sample root")
    p.add_argument("--seed", type=int, default=0, help="RNG seed (renders are deterministic)")
    p.add_argument(
        "--rows-shards",
        type=int,
        default=None,
        help="tile-sharding factor of the local device mesh; the rest goes "
        "to sample sharding (default: auto — sample-only at demo scale, "
        "row sharding engages on memory-bound tall frames)",
    )
    p.add_argument(
        "--accel",
        choices=("sweep", "scan"),
        default=None,
        help="intersection strategy (default: auto — unrolled sweep at demo "
        "scale, blocked scan above 64 spheres; per-lane BVH traversal was "
        "measured off the table on TPU — see PERFORMANCE.md)",
    )
    p.add_argument(
        "--nee",
        action="store_true",
        help="next-event estimation: sample area lights directly with shadow "
        "rays at diffuse vertices (massively lower noise on small lights; "
        "the reference finds lights only by random walk)",
    )
    p.add_argument(
        "--physical",
        action="store_true",
        help="physically-correct transport: cosine-weighted Lambertian matte "
        "(the reference's matte estimator drops cosine foreshortening — "
        "uniform-hemisphere samples weighted by a cosine pdf) and "
        "normalized-Phong glossy with cosine. With --nee this upgrades to "
        "multiple importance sampling at matte AND glossy vertices (the "
        "glossy-firefly fix); the default reproduces the reference for "
        "parity",
    )
    p.add_argument("--output-dir", default=".", help="directory for output images")
    p.add_argument("--png", action="store_true", help="also write a PNG next to the PPM")
    p.add_argument("--verbose", action="store_true", help="enable debug tracing")
    def _pos_int(v):
        n = int(v)
        if n < 1:
            raise argparse.ArgumentTypeError("must be >= 1")
        return n

    p.add_argument(
        "--progressive",
        type=_pos_int,
        metavar="SPP",
        default=0,
        help="render progressively in passes of SPP samples (local devices "
        "only); refreshes the preview PNG after every pass",
    )
    p.add_argument(
        "--checkpoint",
        metavar="PATH",
        default=None,
        help="with --progressive: save a resumable checkpoint after each pass",
    )
    p.add_argument(
        "--adaptive",
        type=float,
        metavar="TOL",
        default=0.0,
        help="with --progressive: stop early once the p99 relative standard "
        "error of the pixel means drops below TOL (e.g. 0.02), instead of "
        "always spending the full root^2 samples",
    )
    p.add_argument(
        "--resume",
        action="store_true",
        help="with --checkpoint: resume from the checkpoint if it exists",
    )
    p.add_argument(
        "--profile-dir",
        default=None,
        help="capture a jax.profiler trace of the render into this directory",
    )
    return p


def run_progressive(args, scene) -> int:
    """Progressive render path (--progressive): single-device, or the whole
    local device mesh when -t/--rows-shards ask for it — every pass runs
    cooperatively across the mesh and the accumulated sums are identical
    either way (counter-based sampling), so checkpoints/adaptive decisions
    are device-count-independent."""
    import os

    import jax

    from .checkpoint import ProgressiveRenderer
    from .image import write_png, write_ppm

    devices = jax.devices()
    if args.devices is not None:
        devices = devices[: max(1, args.devices)]
    if len(devices) > 1:
        from .parallel import MeshRenderer, make_mesh

        # Progressive defaults to ROWS-ONLY sharding: every pixel's sample
        # reduction stays on one device, which makes the accumulated sums —
        # and therefore checkpoints and adaptive-stop decisions —
        # bit-identical to a single-device run (an spp split would psum
        # across devices and drift by the last ulp). An explicit
        # --rows-shards still buys an spp axis for whoever wants it.
        rows_shards = args.rows_shards
        if rows_shards is None:
            rows_shards, spp_shards = len(devices), 1
        else:
            spp_shards = None
        renderer = MeshRenderer(
            scene,
            sample_root=args.root,
            max_depth=args.depth,
            seed=args.seed,
            mesh=make_mesh(devices, rows_shards=rows_shards, spp_shards=spp_shards),
            accel=args.accel,
            nee=args.nee,
            physical=args.physical,
        )
    else:
        from .render import Renderer

        renderer = Renderer(
            scene,
            sample_root=args.root,
            max_depth=args.depth,
            seed=args.seed,
            accel=args.accel,
            nee=args.nee,
            physical=args.physical,
        )
    pr = ProgressiveRenderer.from_renderer(renderer)
    if args.resume and args.checkpoint and os.path.exists(args.checkpoint):
        pr.resume(args.checkpoint)
        print(f"resumed at {pr.samples_done}/{pr.spp} spp from {args.checkpoint}")

    from .termview import TermPreview

    preview_path = os.path.join(args.output_dir, f"{scene.scene_name}-preview.png")
    term = TermPreview() if args.preview else None
    t0 = time.time()
    while not pr.complete:
        n = pr.render_pass(args.progressive)
        done = pr.samples_done
        rate = done * pr.width * pr.height / max(time.time() - t0, 1e-9) / 1e6
        err = pr.max_rel_stderr()
        err_s = f", p99 rel stderr {err:.4f}" if err is not None else ""
        status = f"pass done: {done}/{pr.spp} spp ({rate:.1f} Msamples/s{err_s})"
        live_art = args.preview and term.mode is not None
        if args.preview:
            peek = pr.peek()
            write_png(preview_path, peek)
            # The status rides the redraw: a bare print() between updates
            # would break the cursor-up rewind accounting and smear the art.
            term.update(peek, status=status)
        if not live_art:
            print(status)
        if args.checkpoint:
            pr.save(args.checkpoint)
        if args.adaptive > 0 and err is not None and err < args.adaptive:
            print(
                f"adaptive stop: noise target {args.adaptive} reached at "
                f"{done}/{pr.spp} spp"
            )
            break
    img = pr.peek()
    out = os.path.join(args.output_dir, f"{scene.scene_name}.ppm")
    write_ppm(out, img)
    print(f"Wrote {out}")
    if args.png:
        write_png(out.rsplit(".", 1)[0] + ".png", img)
    return 0


def make_local_worker(args, scene):
    import jax

    from .workers import LocalWorker

    devices = jax.devices()
    if args.devices is not None:
        devices = devices[: max(1, args.devices)]

    if len(devices) > 1:
        from .parallel import MeshRenderer, make_mesh

        out = scene.output_settings
        mesh = make_mesh(
            devices,
            rows_shards=args.rows_shards,
            n_rows_hint=out.image_height,
            n_cols_hint=out.image_width,
        )

        def factory(job):
            return MeshRenderer(
                job.scene_data,
                sample_root=job.config.sample_root,
                max_depth=job.config.max_trace_depth,
                seed=job.config.seed,
                mesh=mesh,
                accel=args.accel,
                nee=job.config.nee,
                physical=job.config.physical,
            )

    else:
        from .render import Renderer

        def factory(job):
            return Renderer(
                job.scene_data,
                sample_root=job.config.sample_root,
                max_depth=job.config.max_trace_depth,
                seed=job.config.seed,
                accel=args.accel,
                nee=job.config.nee,
                physical=job.config.physical,
            )

    return LocalWorker(renderer_factory=factory)


def _preview_loop(args, scene, manager, builder, job, jobcfg) -> None:
    """Progressive preview with the reference's interactive controls
    (flux/src/main.rs:288-316): on a TTY, ``+``/``-`` re-submit the job at
    sample_root ± 1 and ``q`` cancels; headless it just streams progress.
    The preview itself is a PNG refreshed as rows land, replacing the SDL
    window (main.rs:216-283)."""
    import os
    import select

    from dataclasses import replace as dc_replace

    from .image import write_png

    from .termview import TermPreview

    preview_path = os.path.join(args.output_dir, f"{scene.scene_name}-preview.png")
    interactive = sys.stdin.isatty()
    if interactive:
        print("preview controls: '+' more samples, '-' fewer, 'q' cancel")
    # Rows appear incrementally IN the terminal (kitty graphics or ANSI
    # half-blocks) — the headless stand-in for the reference's SDL window
    # (flux/src/main.rs:249-322); the PNG file still refreshes alongside.
    term = TermPreview()
    last = -1.0
    while True:
        if job.wait(timeout=0.5):
            break
        img = builder.get_image()
        if img is not None:
            done = float(img.filled_rows.mean())
            if done != last:
                write_png(preview_path, img)
                term.update(img.pixels)
                if term.mode is None:
                    print(f"preview: {done * 100:.0f}% rows done -> {preview_path}")
                last = done
        if interactive:
            ready, _, _ = select.select([sys.stdin], [], [], 0)
            if not ready:
                continue
            key = sys.stdin.readline().strip()
            if key == "q":
                print("cancelling")
                job.cancel()
                job.wait(timeout=60)
                break
            if key in ("+", "-"):
                new_root = jobcfg.sample_root + (1 if key == "+" else -1)
                if new_root < 1:
                    continue
                print(f"re-rendering at sample root {new_root}")
                job.cancel()
                job.wait(timeout=60)
                jobcfg = dc_replace(jobcfg, sample_root=new_root)
                job = manager.schedule_job(scene, jobcfg, builder.sender())
                last = -1.0
    # Final preview write: a job that completes inside the first 0.5 s
    # wait (tiny warm-cache renders) breaks the loop before any in-loop
    # refresh fired, and even otherwise the last in-loop snapshot may
    # predate the final rows — always leave the finished frame behind.
    img = builder.get_image()
    if img is not None:
        write_png(preview_path, img)
        term.update(img.pixels)
    return job


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.verbose:
        set_debug(True)

    scene = load_scene(args.scene_file)

    if args.profile_dir:
        from .metrics import profile_trace

        with profile_trace(args.profile_dir):
            return _run_job_path(args, scene)
    return _run_job_path(args, scene)


def _run_job_path(args, scene) -> int:
    if args.progressive:
        return run_progressive(args, scene)

    if args.no_local and not args.node:
        print("No workers specified, exiting")
        return 0

    workers = []
    handles = []
    if not args.no_local:
        w = make_local_worker(args, scene)
        info = w.info()
        print(f"Local worker ready, info:\nDevices: {info.num_devices} ({info.platform})")
        workers.append(w)
        handles.append(w.handle())

    from .workers import NetworkWorker

    for endpoint in args.node:
        print(f"Connecting to {endpoint}")
        try:
            w = NetworkWorker(endpoint)
        except OSError as e:
            print(f"Could not connect network node '{endpoint}': {e}")
            return 1
        info = w.info()
        print(f"Network worker ready, info:\nDevices: {info.num_devices} ({info.platform})")
        workers.append(w)
        handles.append(w.handle())

    print("Starting rendering manager")
    manager = RenderManager(handles)
    jobcfg = JobConfiguration(
        sample_root=args.root,
        max_trace_depth=args.depth,
        rows_per_work_unit=args.rows,
        seed=args.seed,
        nee=args.nee,
        physical=args.physical,
    )

    builder = ImageBuilder(output_dir=args.output_dir, write_png_too=args.png)
    print("Sending job to rendering manager")
    job = manager.schedule_job(scene, jobcfg, builder.sender())

    if args.preview:
        # The loop may have re-submitted the job (+/- re-render); status
        # must come from the handle that actually finished.
        job = _preview_loop(args, scene, manager, builder, job, jobcfg)
    else:
        job.wait()

    if job.error:
        print(f"render failed: {job.error}", file=sys.stderr)

    builder.wait_finished(timeout=60)
    if builder.last_path:
        print(f"Wrote {builder.last_path}")

    print("Shutting down")
    builder.stop()
    for w in workers:
        w.stop()
    manager.stop()
    return 1 if job.error else 0


if __name__ == "__main__":
    sys.exit(main())
