"""End-to-end scheduler tests: manager + local worker + sinks + cancellation.

This is the pipeline the reference exercises only manually via its CLI
(SURVEY.md §4); here every stage is asserted: event ordering, image
assembly, multi-worker pull balancing, job cancellation, and sequential
jobs reusing one manager (the preview's +/- path, flux/src/main.rs:296-316).
"""

import os
import queue
import threading
import time

import numpy as np
import pytest

from flux_tpu.image import read_ppm
from flux_tpu.job import JobConfiguration
from flux_tpu.manager import (
    ConsoleResultReporter,
    ImageBuilder,
    ImageInfo,
    MultiSink,
    RenderManager,
    RenderingFinished,
    RenderingStarted,
    RowsReady,
)
from flux_tpu.render import Renderer
from flux_tpu.workers import LocalWorker
from tests.test_render import env_sphere, make_scene


def tiny_factory(job):
    return Renderer(
        job.scene_data,
        sample_root=job.config.sample_root,
        max_depth=job.config.max_trace_depth,
        seed=job.config.seed,
        target_lanes=1 << 16,
    )


@pytest.fixture
def scene16():
    return make_scene([env_sphere(0.5)], w=16, h=12)


def drain(q):
    events = []
    while True:
        try:
            events.append(q.get_nowait())
        except queue.Empty:
            return events


def test_render_job_end_to_end(scene16, tmp_path):
    worker = LocalWorker(renderer_factory=tiny_factory)
    manager = RenderManager([worker.handle()])
    builder = ImageBuilder(output_dir=str(tmp_path))
    events = queue.Queue()
    sink = MultiSink([builder.sender(), events])

    cfg = JobConfiguration(sample_root=2, max_trace_depth=3, rows_per_work_unit=5, seed=1)
    handle = manager.schedule_job(scene16, cfg, sink)
    assert handle.wait(timeout=120)
    assert builder.wait_finished(timeout=60)

    # Event ordering: ImageInfo, Started, RowsReady x3 (12 rows / 5), Finished.
    evs = drain(events)
    kinds = [type(e).__name__ for e in evs]
    assert kinds[0] == "ImageInfo"
    assert kinds[1] == "RenderingStarted"
    assert kinds[-1] == "RenderingFinished"
    assert kinds.count("RowsReady") == 3  # ceil(12/5) = 3 units

    img = builder.get_image()
    assert img.complete()
    # Whole image is the env emissive value 0.5 * ENV.
    expect = np.broadcast_to(0.5 * np.array([1.0, 0.9686, 0.8588], np.float32), img.pixels.shape)
    np.testing.assert_allclose(img.pixels, expect, atol=1e-5)
    # PPM written and re-readable.
    ppm = read_ppm(os.path.join(str(tmp_path), "test.ppm"))
    np.testing.assert_allclose(ppm, img.pixels, atol=1e-4)

    manager.stop()
    worker.stop()
    builder.stop()


def test_multiple_workers_share_queue(scene16, tmp_path):
    """Two local workers pull from the shared queue; all rows arrive once."""
    w1 = LocalWorker(renderer_factory=tiny_factory, name="a")
    w2 = LocalWorker(renderer_factory=tiny_factory, name="b")
    manager = RenderManager([w1.handle(), w2.handle()])
    builder = ImageBuilder(output_dir=str(tmp_path))
    cfg = JobConfiguration(sample_root=2, max_trace_depth=2, rows_per_work_unit=2, seed=1)
    handle = manager.schedule_job(scene16, cfg, builder.sender())
    assert handle.wait(timeout=120)
    assert builder.wait_finished(timeout=60)
    assert builder.get_image().complete()
    manager.stop()
    w1.stop()
    w2.stop()
    builder.stop()


def test_sequential_jobs_one_manager(scene16, tmp_path):
    """Resubmission with a different sample root (the +/- preview path)."""
    worker = LocalWorker(renderer_factory=tiny_factory)
    manager = RenderManager([worker.handle()])
    builder = ImageBuilder(output_dir=str(tmp_path))
    for root in (1, 2):
        cfg = JobConfiguration(
            sample_root=root, max_trace_depth=2, rows_per_work_unit=6, seed=1
        )
        handle = manager.schedule_job(scene16, cfg, builder.sender())
        assert handle.wait(timeout=120)
        assert builder.wait_finished(timeout=60)
        assert builder.get_image().complete()
    manager.stop()
    worker.stop()
    builder.stop()


def test_cancellation_stops_early():
    """Cancel mid-job: remaining units are dropped, the barrier releases,
    and the manager stays usable (manager.rs:365-393 semantics)."""
    sd = make_scene([env_sphere(0.5)], w=16, h=64)

    gate = threading.Event()
    slow_calls = []

    class SlowRenderer:
        def __init__(self, job):
            self._r = tiny_factory(job)

        def render_rows(self, row0, n_rows):
            slow_calls.append(row0)
            gate.wait(timeout=30)  # hold the first unit until cancelled
            return self._r.render_rows(row0, n_rows)

    worker = LocalWorker(renderer_factory=SlowRenderer)
    manager = RenderManager([worker.handle()])
    events = queue.Queue()
    cfg = JobConfiguration(sample_root=1, max_trace_depth=1, rows_per_work_unit=1, seed=1)
    handle = manager.schedule_job(sd, cfg, events)

    # Wait for the first unit to start, then cancel and release the gate.
    deadline = time.time() + 30
    while not slow_calls and time.time() < deadline:
        time.sleep(0.01)
    assert slow_calls
    handle.cancel()
    gate.set()
    assert handle.wait(timeout=120)

    evs = drain(events)
    n_rows_done = sum(1 for e in evs if isinstance(e, RowsReady))
    assert n_rows_done < 64  # far fewer than all 64 one-row units
    assert isinstance(evs[-1], RenderingFinished)
    manager.stop()
    worker.stop()


def test_console_reporter_smoke(scene16, capsys):
    rep = ConsoleResultReporter()
    worker = LocalWorker(renderer_factory=tiny_factory)
    manager = RenderManager([worker.handle()])
    cfg = JobConfiguration(sample_root=1, max_trace_depth=1, rows_per_work_unit=12, seed=0)
    handle = manager.schedule_job(scene16, cfg, rep.sender())
    assert handle.wait(timeout=120)
    rep.stop()
    manager.stop()
    worker.stop()
    out = capsys.readouterr().out
    assert "scene: test" in out
    assert "image 16 x 12 pixels" in out


class TestLostUnitRetry:
    """Fault tolerance the reference lacks (it panics on a dead worker,
    manager.rs:158-161): units lost to a failing worker are re-rendered by
    the survivors, and a failing worker must never STEAL units — it stops
    pulling instead of draining the shared round."""

    class _FlakyRenderer:
        """Renders the first `ok_units` units, then raises forever."""

        def __init__(self, inner, ok_units):
            self._inner = inner
            self._left = ok_units

        def render_rows(self, row0, n_rows):
            if self._left <= 0:
                raise RuntimeError("injected worker failure")
            self._left -= 1
            return self._inner.render_rows(row0, n_rows)

    def _run(self, scene, workers, cfg=None):
        from flux_tpu.manager import JobFailed

        cfg = cfg or JobConfiguration(
            sample_root=2, max_trace_depth=2, rows_per_work_unit=2, seed=7
        )
        manager = RenderManager([w.handle() for w in workers])
        sink = queue.Queue()
        builder = ImageBuilder(output_dir="/tmp", filename="retrytest.ppm")
        job = manager.schedule_job(scene, cfg, MultiSink([sink, builder.sender()]))
        assert job.wait(timeout=180)
        builder.wait_finished(timeout=30)
        img = builder.get_image()
        events = drain(sink)
        manager.stop()
        builder.stop()
        for w in workers:
            w.stop()
        return job, img, events

    class _SlowRenderer:
        """Delays each unit so the other (flaky) worker deterministically
        participates in every dispatch round instead of racing to zero."""

        def __init__(self, inner, delay=0.02):
            self._inner = inner
            self._delay = delay

        def render_rows(self, row0, n_rows):
            time.sleep(self._delay)
            return self._inner.render_rows(row0, n_rows)

    def test_survivors_rerender_lost_units(self, scene16):
        from flux_tpu.manager import JobFailed

        def flaky_factory(job, self=self):
            # Fails at the SECOND unit of every job it gets — so it poisons
            # both the first round and any retry round it joins.
            return self._FlakyRenderer(tiny_factory(job), ok_units=1)

        def slow_factory(job, self=self):
            return self._SlowRenderer(tiny_factory(job))

        flaky = LocalWorker(renderer_factory=flaky_factory, name="flaky")
        good = LocalWorker(renderer_factory=slow_factory, name="good")
        cfg = JobConfiguration(
            sample_root=2, max_trace_depth=2, rows_per_work_unit=1, seed=7
        )
        job, img, events = self._run(scene16, [flaky, good], cfg=cfg)
        assert job.ok, job.error
        # The image must be complete and exactly equal a clean render.
        ref = Renderer(scene16, sample_root=2, max_depth=2, seed=7).render_image()
        assert img.complete()
        np.testing.assert_array_equal(img.pixels, ref)
        # The failure was reported into the event stream, not swallowed.
        assert any(isinstance(e, JobFailed) for e in events)

    def test_factory_failure_worker_plus_good_worker(self, scene16):
        def broken_factory(job):
            raise RuntimeError("cannot build renderer at all")

        broken = LocalWorker(renderer_factory=broken_factory, name="broken")
        good = LocalWorker(renderer_factory=tiny_factory, name="good")
        job, img, _ = self._run(scene16, [broken, good])
        assert job.ok, job.error
        ref = Renderer(scene16, sample_root=2, max_depth=2, seed=7).render_image()
        assert img.complete()
        np.testing.assert_array_equal(img.pixels, ref)

    def test_all_workers_failing_fails_the_job(self, scene16):
        def broken_factory(job):
            raise RuntimeError("cannot build renderer at all")

        w1 = LocalWorker(renderer_factory=broken_factory, name="b1")
        w2 = LocalWorker(renderer_factory=broken_factory, name="b2")
        job, img, _ = self._run(scene16, [w1, w2])
        assert not job.ok
        assert "lost" in (job.error or "")


class TestTransientFailureRecovery:
    """Retry rounds tolerate a bounded number of no-progress rounds before
    giving up: a transiently-failing worker (e.g. a device hiccup) clears on
    a later attempt instead of failing an otherwise recoverable render."""

    class _EventuallyOkRenderer:
        """Each unit fails its first `fails` attempts, then succeeds.
        ``attempts`` is shared across instances because the worker rebuilds
        its renderer every dispatch round — the transient failure must
        persist across rounds, not reset with each retry."""

        def __init__(self, inner, attempts, fails=2):
            self._inner = inner
            self._fails = fails
            self._attempts = attempts

        def render_rows(self, row0, n_rows):
            n = self._attempts.get(row0, 0) + 1
            self._attempts[row0] = n
            if n <= self._fails:
                raise RuntimeError(f"transient failure for unit {row0}")
            return self._inner.render_rows(row0, n_rows)

    def test_transient_failures_recover_within_stall_allowance(self, scene16):
        cfg = JobConfiguration(
            sample_root=2, max_trace_depth=2, rows_per_work_unit=6, seed=7
        )
        attempts = {}
        worker = LocalWorker(
            renderer_factory=lambda job: self._EventuallyOkRenderer(
                tiny_factory(job), attempts, fails=2
            ),
            name="transient",
        )
        manager = RenderManager([worker.handle()])
        builder = ImageBuilder(output_dir="/tmp", filename="transienttest.ppm")
        job = manager.schedule_job(scene16, cfg, builder.sender())
        assert job.wait(timeout=180)
        # Two no-progress rounds (attempts 1 and 2 of the first unit) are
        # within the allowance; attempt 3 succeeds and progress resumes.
        assert job.ok, job.error
        builder.wait_finished(timeout=30)
        img = builder.get_image()
        assert img.complete()
        ref = Renderer(scene16, sample_root=2, max_depth=2, seed=7).render_image()
        np.testing.assert_array_equal(img.pixels, ref)
        manager.stop()
        worker.stop()
        builder.stop()

    def test_persistent_failure_still_terminates(self, scene16):
        """A worker that never succeeds must exhaust the stall allowance and
        fail the job (termination guarantee)."""

        def always_broken(job):
            raise RuntimeError("permanent failure")

        worker = LocalWorker(renderer_factory=always_broken, name="perma")
        manager = RenderManager([worker.handle()])
        sink = queue.Queue()
        cfg = JobConfiguration(
            sample_root=1, max_trace_depth=1, rows_per_work_unit=6, seed=0
        )
        job = manager.schedule_job(scene16, cfg, sink)
        assert job.wait(timeout=120)
        assert not job.ok
        assert "lost after retry" in (job.error or "")
        manager.stop()
        worker.stop()


def test_worker_uid_distinguishes_same_name_workers(scene16):
    """Two workers sharing a display name must not share failure
    attribution: only the actually-failed worker is routed around in retry
    rounds, so the healthy namesake still completes the job."""
    from flux_tpu.manager import WorkerHandle

    def broken_factory(job):
        raise RuntimeError("injected failure")

    a = LocalWorker(renderer_factory=broken_factory, name="twin")
    b = LocalWorker(renderer_factory=tiny_factory, name="twin")
    assert a.handle().uid != b.handle().uid
    assert a.handle().name == b.handle().name == "twin"

    manager = RenderManager([a.handle(), b.handle()])
    builder = ImageBuilder(output_dir="/tmp", filename="twintest.ppm")
    cfg = JobConfiguration(sample_root=2, max_trace_depth=2, rows_per_work_unit=2, seed=7)
    job = manager.schedule_job(scene16, cfg, builder.sender())
    assert job.wait(timeout=180)
    assert job.ok, job.error
    builder.wait_finished(timeout=30)
    img = builder.get_image()
    assert img.complete()
    ref = Renderer(scene16, sample_root=2, max_depth=2, seed=7).render_image()
    np.testing.assert_array_equal(img.pixels, ref)
    manager.stop()
    a.stop()
    b.stop()
    builder.stop()
