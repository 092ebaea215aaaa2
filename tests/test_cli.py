"""CLI surface tests (flag parity with flux/src/main.rs:126-205)."""

import os

import numpy as np
import pytest

from flux_tpu import cli
from flux_tpu.image import read_ppm


def test_parser_defaults():
    args = cli.build_parser().parse_args(["scene.yml"])
    assert args.root == 1
    assert args.depth == 5
    assert args.rows == 50
    assert not args.no_local
    assert not args.preview
    assert args.node == []


def test_parser_flags():
    args = cli.build_parser().parse_args(
        ["s.yml", "-n", "a:1234", "-n", "b", "-r", "8", "-d", "3", "-R", "10", "-L", "-g"]
    )
    assert args.node == ["a:1234", "b"]
    assert args.root == 8 and args.depth == 3 and args.rows == 10
    assert args.no_local and args.preview


def test_no_workers_exits_cleanly(tmp_path, capsys):
    scene = tmp_path / "s.yml"
    scene.write_text(open("scenes/demo1.yml").read())
    rc = cli.main([str(scene), "-L"])
    assert rc == 0
    assert "No workers specified" in capsys.readouterr().out


def test_render_demo1_tiny(tmp_path, monkeypatch):
    """Full CLI path on a shrunken demo1 (single virtual device)."""
    import yaml

    with open("scenes/demo1.yml") as f:
        doc = yaml.safe_load(f)
    doc["output_settings"]["image_width"] = 16
    doc["output_settings"]["image_height"] = 12
    doc["output_settings"]["pixel_size"] = 25.0  # keep the original FOV
    scene = tmp_path / "demo1-small.yml"
    scene.write_text(yaml.safe_dump(doc))

    rc = cli.main(
        [
            str(scene),
            "-r",
            "2",
            "-d",
            "3",
            "-R",
            "4",
            "-t",
            "1",
            "--output-dir",
            str(tmp_path),
            "--png",
            "--seed",
            "7",
        ]
    )
    assert rc == 0
    ppm = read_ppm(os.path.join(str(tmp_path), "demo1.ppm"))
    assert ppm.shape == (12, 16, 3)
    assert ppm.max() > 0.1  # the env light is visible
    assert os.path.exists(os.path.join(str(tmp_path), "demo1.png"))


def test_render_preview_mode(tmp_path):
    import yaml

    with open("scenes/demo1.yml") as f:
        doc = yaml.safe_load(f)
    doc["output_settings"]["image_width"] = 8
    doc["output_settings"]["image_height"] = 8
    scene = tmp_path / "s.yml"
    scene.write_text(yaml.safe_dump(doc))
    rc = cli.main(
        [str(scene), "-r", "1", "-d", "1", "-R", "4", "-t", "1", "-g",
         "--output-dir", str(tmp_path)]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(str(tmp_path), "demo1-preview.png"))


def test_sampler_debug_cli(tmp_path):
    from flux_tpu import sampler_debug

    rc = sampler_debug.main(["-r", "4", "--output-dir", str(tmp_path)])
    assert rc == 0
    for base in ("r", "j", "mj", "cmj"):
        for suffix in ("", "-hemi"):
            p = os.path.join(str(tmp_path), f"sampler-debug-{base}{suffix}.ppm")
            assert os.path.exists(p), p
    img = read_ppm(os.path.join(str(tmp_path), "sampler-debug-cmj.ppm"))
    assert img.shape == (100, 100, 3)
    assert (img[..., 0] > 0.9).sum() >= 14  # ~16 dots (some may overlap)


class TestInteractivePreview:
    """The reference's +/- interactive quality re-render (flux/src/main.rs:
    296-316): '+' cancels the running job and resubmits at sample_root+1,
    'q' cancels. Driven through _preview_loop with a real pipe as stdin."""

    def test_plus_resubmits_then_q_cancels(self, tmp_path, monkeypatch):
        import os
        import sys
        import time

        from flux_tpu.cli import _preview_loop
        from flux_tpu.job import JobConfiguration
        from flux_tpu.manager import ImageBuilder, RenderManager
        from flux_tpu.workers import LocalWorker
        from tests.test_manager import make_scene, env_sphere, tiny_factory

        roots_seen = []

        def factory(job):
            roots_seen.append(job.config.sample_root)
            time.sleep(1.5)  # keep the job alive long enough to interact
            return tiny_factory(job)

        sd = make_scene([env_sphere(0.5)], w=16, h=12)
        w = LocalWorker(renderer_factory=factory)
        manager = RenderManager([w.handle()])
        builder = ImageBuilder(output_dir=str(tmp_path))
        jobcfg = JobConfiguration(
            sample_root=2, max_trace_depth=2, rows_per_work_unit=6
        )
        job = manager.schedule_job(sd, jobcfg, builder.sender())

        r_fd, w_fd = os.pipe()
        # Both keys written up front (one readline per select round): '+'
        # resubmits at root+1, 'q' then cancels. No feeder thread — a
        # delayed os.write to a closed-and-reused fd number can corrupt an
        # unrelated socket of a later test.
        os.write(w_fd, b"+\n")
        os.write(w_fd, b"q\n")

        class Args:
            output_dir = str(tmp_path)

        raw = os.fdopen(r_fd, "r")

        class TtyPipe:
            """select()-able stdin stand-in that claims to be a TTY."""

            def fileno(self):
                return r_fd

            def isatty(self):
                return True

            def readline(self):
                return raw.readline()

        monkeypatch.setattr(sys, "stdin", TtyPipe())

        _preview_loop(Args(), sd, manager, builder, job, jobcfg)

        w.stop()
        manager.stop()
        builder.stop()
        raw.close()
        os.close(w_fd)

        # '+' resubmitted at root 3 after the initial root-2 job.
        assert roots_seen[0] == 2
        assert 3 in roots_seen
