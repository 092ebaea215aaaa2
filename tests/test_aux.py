"""Auxiliary subsystems: metrics, checkpoint/resume, fault tolerance.

All three are capabilities the reference lacks outright (SURVEY.md §5) but
that its design implies; these tests pin their contracts.
"""

import queue
import threading
import time

import numpy as np
import pytest

from flux_tpu.checkpoint import ProgressiveRenderer, load_checkpoint
from flux_tpu.job import JobConfiguration
from flux_tpu.manager import ImageBuilder, RenderManager, RowsReady
from flux_tpu.metrics import ProgressReporter
from flux_tpu.render import Renderer
from flux_tpu.workers import LocalWorker
from tests.test_manager import tiny_factory
from tests.test_render import env_sphere, make_scene
from flux_tpu.scene import MaterialData, MaterialKind, PlaneData


def scene(w=16, h=12):
    floor = PlaneData(
        point=(0.0, 0.0, 0.0),
        normal=(0.0, 1.0, 0.0),
        material=MaterialData(kind=MaterialKind.MATTE, color=(0.5, 0.5, 0.5), param=1.0),
    )
    return make_scene([env_sphere(1.0), floor], w=w, h=h)


# ---------------------------------------------------------------------------
# Progressive rendering + checkpoint/resume


def test_progressive_matches_oneshot():
    sd = scene()
    pr = ProgressiveRenderer(sd, sample_root=4, max_depth=3, seed=6, target_lanes=1 << 16)
    while not pr.complete:
        pr.render_pass(5)  # ragged passes: 5+5+5+1
    full = Renderer(sd, 4, 3, seed=6, target_lanes=1 << 16).render_image()
    np.testing.assert_allclose(pr.peek(), full, atol=1e-5)


def test_checkpoint_resume_exact(tmp_path):
    sd = scene()
    a = ProgressiveRenderer(sd, sample_root=4, max_depth=3, seed=6, target_lanes=1 << 16)
    a.render_pass(7)
    ckpt = str(tmp_path / "render.ckpt.npz")
    a.save(ckpt)
    a.render_pass(16)  # finish
    assert a.complete

    b = ProgressiveRenderer(sd, sample_root=4, max_depth=3, seed=6, target_lanes=1 << 16)
    b.resume(ckpt)
    assert b.samples_done == 7
    b.render_pass(16)
    assert b.complete
    np.testing.assert_array_equal(a.acc, b.acc)  # bit-identical resume


def test_checkpoint_rejects_other_config(tmp_path):
    sd = scene()
    a = ProgressiveRenderer(sd, sample_root=4, max_depth=3, seed=6, target_lanes=1 << 16)
    a.render_pass(4)
    ckpt = str(tmp_path / "c.npz")
    a.save(ckpt)
    b = ProgressiveRenderer(sd, sample_root=4, max_depth=3, seed=7, target_lanes=1 << 16)
    with pytest.raises(ValueError, match="different"):
        b.resume(ckpt)


def test_checkpoint_file_roundtrip(tmp_path):
    sd = scene()
    a = ProgressiveRenderer(sd, sample_root=2, max_depth=2, seed=1, target_lanes=1 << 16)
    a.render_pass(2)
    p = str(tmp_path / "x.npz")
    a.save(p)
    acc, done, fp = load_checkpoint(p)
    assert done == 2 and fp == a.fingerprint
    np.testing.assert_array_equal(acc, a.acc)


# ---------------------------------------------------------------------------
# Metrics


def test_progress_reporter_stats():
    sd = scene(w=16, h=12)
    rep = ProgressReporter(sample_root=2)
    worker = LocalWorker(renderer_factory=tiny_factory)
    manager = RenderManager([worker.handle()])
    cfg = JobConfiguration(sample_root=2, max_trace_depth=2, rows_per_work_unit=4, seed=1)
    handle = manager.schedule_job(sd, cfg, rep.sender())
    assert handle.wait(timeout=120)
    deadline = time.time() + 10
    while time.time() < deadline:
        s = rep.snapshot()
        if s.end_monotonic is not None:
            break
        time.sleep(0.05)
    s = rep.snapshot()
    assert s.scene_name == "test"
    assert s.rows_done == 12 and s.units_done == 3
    assert s.fraction_done == 1.0
    assert s.duration is not None and s.duration >= 0
    assert s.samples_per_sec() > 0
    rep.stop()
    manager.stop()
    worker.stop()


# ---------------------------------------------------------------------------
# Fault tolerance


def test_lost_units_are_retried():
    """A worker that dies mid-job loses its pulled units; the manager
    re-dispatches them to the survivor and the image completes."""
    sd = scene(w=16, h=24)

    calls = {"n": 0}

    class FlakyOnce:
        """Renderer that hard-fails its first unit (once, in one worker)."""

        def __init__(self, job):
            self._r = tiny_factory(job)

        def render_rows(self, row0, n_rows):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("injected failure")
            return self._r.render_rows(row0, n_rows)

    flaky = LocalWorker(renderer_factory=FlakyOnce, name="flaky")
    manager = RenderManager([flaky.handle()])
    builder = ImageBuilder(output_dir="/tmp")
    cfg = JobConfiguration(sample_root=1, max_trace_depth=1, rows_per_work_unit=4, seed=1)
    handle = manager.schedule_job(sd, cfg, builder.sender())
    assert handle.wait(timeout=120)
    assert builder.wait_finished(timeout=60)
    # LocalWorker abandons the job on failure but survives; the retry round
    # must cover every row, including the failed first unit.
    assert builder.get_image().complete()
    manager.stop()
    flaky.stop()
    builder.stop()


def test_dead_worker_does_not_hang_manager():
    """All workers dead → the job errors out but wait() still returns and
    the manager accepts the next job (no reference-style panic)."""
    sd = scene(w=8, h=8)
    worker = LocalWorker(renderer_factory=tiny_factory)
    manager = RenderManager([worker.handle()])
    worker.stop()  # kill before dispatch
    cfg = JobConfiguration(sample_root=1, max_trace_depth=1, rows_per_work_unit=4, seed=1)
    sink = queue.Queue()
    handle = manager.schedule_job(sd, cfg, sink)
    assert handle.wait(timeout=60)
    manager.stop()
