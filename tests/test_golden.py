"""Golden-image regression tests.

The reference's only render QA is eyeballing demo.png (SURVEY.md §4); here
deterministic seeds make exact golden comparisons possible on one platform
and tight statistical ones across platforms.  Goldens are 80×60 renders of
the demo scenes at root=4 / seed=42 with the field of view preserved
(pixel_size scaled by 10 to offset the 10× resolution drop), generated on
the CPU backend by this very code (``python -m tests.test_golden`` to
regenerate after an intentional change).

Separately, bench.py's full-scale run is compared offline against the
reference's committed demo.png: mean |diff| 0.0071, p99 0.059 at 16384 spp
— MC-noise-level agreement (see BENCH notes in README.md).
"""

import os
from dataclasses import replace

import numpy as np
import pytest

from flux_tpu.render import Renderer
from flux_tpu.scene import load_scene

HERE = os.path.dirname(os.path.abspath(__file__))


def _render(name):
    sd = load_scene(os.path.join(HERE, "..", "scenes", f"{name}.yml"))
    sd = replace(
        sd,
        output_settings=replace(
            sd.output_settings,
            image_width=80,
            image_height=60,
            pixel_size=sd.output_settings.pixel_size * 10,
        ),
    )
    r = Renderer(sd, sample_root=4, max_depth=5, seed=42, target_lanes=1 << 20)
    return r.render_image()


@pytest.mark.parametrize("name", ["demo1", "demo2"])
def test_golden(name):
    img = _render(name)
    golden = np.load(os.path.join(HERE, f"golden_{name}_80x60_r4_s42.npy"))
    assert img.shape == golden.shape
    # Exact on the platform that generated the goldens (CPU); fused TPU
    # codegen may differ in the last ulps, so allow a tiny tolerance.
    np.testing.assert_allclose(img, golden, atol=5e-3)
    assert abs(float(img.mean()) - float(golden.mean())) < 1e-3


def _render_field():
    """Procedural 96-sphere scene through the blocked-scan path."""
    from flux_tpu.genscene import sphere_field

    sd = sphere_field(96, seed=7, width=80, height=60)
    sd = replace(
        sd,
        output_settings=replace(sd.output_settings, pixel_size=10.0),
    )
    r = Renderer(sd, sample_root=4, max_depth=5, seed=42, target_lanes=1 << 20)
    assert r.accel == "scan"
    return r.render_image()


def test_golden_sphere_field_scan():
    img = _render_field()
    golden = np.load(os.path.join(HERE, "golden_field96_80x60_r4_s42.npy"))
    np.testing.assert_allclose(img, golden, atol=5e-3)


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")  # goldens are CPU-generated
    for name in ("demo1", "demo2"):
        img = _render(name)
        np.save(os.path.join(HERE, f"golden_{name}_80x60_r4_s42.npy"), img)
        print(f"regenerated golden_{name}: mean={img.mean():.6f}")
    np.save(os.path.join(HERE, "golden_field96_80x60_r4_s42.npy"), _render_field())
