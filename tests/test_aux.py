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
    acc, done, fp, lum_sq, stats_valid = load_checkpoint(p)
    assert done == 2 and fp == a.fingerprint and stats_valid
    np.testing.assert_array_equal(acc, a.acc)
    np.testing.assert_array_equal(lum_sq, a.lum_sq)


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


class TestAdaptiveSampling:
    """Adaptive-stop statistics on the progressive renderer (a capability
    the reference lacks entirely; SURVEY.md §5 checkpoint/observability)."""

    def _pr(self, sd, root=8, **kw):
        return ProgressiveRenderer(
            sd, sample_root=root, max_depth=3, seed=0, target_lanes=1 << 16, **kw
        )

    def test_stderr_none_until_two_samples(self):
        pr = self._pr(scene())
        assert pr.max_rel_stderr() is None
        pr.render_pass(1)
        assert pr.max_rel_stderr() is None
        pr.render_pass(7)
        assert pr.max_rel_stderr() is not None

    def test_stderr_decreases_with_passes(self):
        # A glossy/matte sphere field is noisy enough for a meaningful
        # stderr trend (the env+floor scene is nearly noiseless). The
        # pixel size is scaled up so a 24x16 frame keeps the 800x600
        # field of view instead of staring at a constant speck of env.
        from dataclasses import replace

        from flux_tpu.genscene import sphere_field

        sd = sphere_field(12, 3, width=24, height=16)
        sd = replace(sd, output_settings=replace(sd.output_settings, pixel_size=33.0))
        pr = self._pr(sd, root=8)
        errs = []
        for _ in range(8):
            pr.render_pass(8)
            e = pr.max_rel_stderr(percentile=100.0)  # the noisiest pixel
            if e is not None:
                errs.append(e)
        # Monte-Carlo stderr shrinks ~1/sqrt(n).
        assert errs[0] > 0
        assert errs[-1] < 0.7 * errs[0]

    def test_constant_scene_has_zero_noise(self):
        from flux_tpu.scene import (
            CameraData,
            CameraSettings,
            OutputSettings,
            SceneData,
            SphereData,
        )

        # Only an inverted emissive env sphere: every path terminates on it
        # with the same radiance -> pass means identical -> stderr 0.
        sd = SceneData(
            scene_name="const",
            output_settings=OutputSettings(image_width=16, image_height=12, pixel_size=1.0),
            background=(0.0, 0.0, 0.0),
            shapes=(
                SphereData(
                    center=(0.0, 0.0, 0.0),
                    radius=1000.0,
                    invert=True,
                    material=MaterialData(kind=MaterialKind.EMISSIVE, color=(1.0, 1.0, 1.0), param=1.0),
                ),
            ),
            camera_settings=CameraSettings(eye=(0, 1, 5), look_at=(0, 0, 0), up=(0, 1, 0)),
            camera_data=CameraData(zoom_factor=1.0, view_plane_distance=300.0, focal_distance=5.0, lens_radius=0.0),
        )
        pr = self._pr(sd, root=4)
        pr.render_pass(4)
        pr.render_pass(4)
        assert pr.max_rel_stderr() < 1e-3

    def test_unequal_passes_keep_statistics(self):
        # Moments are per-sample, so any pass sizes are fine.
        pr = self._pr(scene())
        pr.render_pass(8)
        pr.render_pass(4)
        assert pr.max_rel_stderr() is not None

    def test_progressive_respects_accel(self):
        # render_pass must route through the renderer's configured accel
        # (regression: it used to call the sweep unconditionally).
        pr_sweep = self._pr(scene(), root=4, accel="sweep")
        pr_scan = self._pr(scene(), root=4, accel="scan")
        pr_sweep.render_pass(16)
        pr_scan.render_pass(16)
        # Chunk sizing differs between accels, so summation order (and the
        # last ulp) may differ; the samples themselves are identical.
        np.testing.assert_allclose(pr_sweep.acc, pr_scan.acc, rtol=1e-5, atol=1e-5)


def test_resume_without_moments_disables_adaptive_stats(tmp_path):
    # A checkpoint carrying no real luminance moments (legacy format-1 or a
    # caller that saved without them) must disable the adaptive stop signal
    # rather than fake near-zero noise and stop a resumed render early.
    from flux_tpu.checkpoint import save_checkpoint

    sd = scene()
    a = ProgressiveRenderer(sd, sample_root=4, max_depth=2, seed=1, target_lanes=1 << 16)
    a.render_pass(4)
    p = str(tmp_path / "legacy.npz")
    save_checkpoint(p, a.acc, a.samples_done, a.fingerprint)  # no lum_sq
    b = ProgressiveRenderer(sd, sample_root=4, max_depth=2, seed=1, target_lanes=1 << 16)
    b.resume(p)
    b.render_pass(4)
    assert b.max_rel_stderr() is None  # stays disabled for this render


def test_total_worker_failure_reports_error():
    """If every work unit is lost even after the retry round, the job must
    report failure instead of silently presenting a black image."""
    from flux_tpu.job import JobConfiguration
    from flux_tpu.manager import ImageBuilder, RenderManager
    from flux_tpu.workers import LocalWorker

    def always_fails(job):
        raise RuntimeError("boom")

    w = LocalWorker(renderer_factory=always_fails)
    manager = RenderManager([w.handle()])
    b = ImageBuilder(output_dir="/tmp")
    sd = scene()
    job = manager.schedule_job(
        sd, JobConfiguration(sample_root=2, max_trace_depth=2, rows_per_work_unit=4),
        b.sender(),
    )
    assert job.wait(timeout=60)
    assert job.error and not job.ok
    b.stop()
    w.stop()
    manager.stop()


def test_progress_reporter_ignores_short_blocks():
    """A short (to-be-retried) block must not bump rows_done OR units_done —
    counting it would overreport once the retried full block lands."""
    import queue as _queue

    from flux_tpu.manager import (
        ImageInfo,
        RenderingStarted,
        RowsReady,
        WorkUnitResult,
    )
    from flux_tpu.job import WorkUnit, JobID

    rep = ProgressReporter(sample_root=1, print_progress=False)
    q = rep.sender()
    q.put(ImageInfo(scene_name="t", width=4, height=8))
    q.put(RenderingStarted(job_id=JobID(0, 0), start_time=0.0, monotonic=0.0))
    unit = WorkUnit(row_start=0, row_end=3, job_id=JobID(0, 0))
    short = np.zeros((2, 4, 3), np.float32)  # 2 rows for a 4-row unit
    q.put(RowsReady(WorkUnitResult(work_unit=unit, rows=short)))
    full = np.zeros((4, 4, 3), np.float32)
    q.put(RowsReady(WorkUnitResult(work_unit=unit, rows=full)))
    deadline = time.time() + 5
    while time.time() < deadline:
        s = rep.snapshot()
        if s.units_done:
            break
        time.sleep(0.02)
    s = rep.snapshot()
    assert s.rows_done == 4 and s.units_done == 1
    rep.stop()
