"""Progressive / adaptive / checkpoint rendering on the multi-chip mesh.

Round 1 left the quality-of-life features (progressive passes, adaptive
stop, checkpoint/resume) single-device only; these tests pin the round-2
contract: every pass runs cooperatively over the mesh via
``MeshRenderer.render_rows_sum_range(..., with_stats=True)``.

Bit-exactness contract (and why the mesh shape matters): with ROWS-only
sharding every pixel's sample reduction happens on exactly one device over
the same sample-index range as a single-device run, so accumulators,
adaptive-stop statistics, and checkpoints are bit-identical across device
counts — 1-device and 8-device runs stop at the same pass and resume each
other's checkpoints exactly.  spp-sharding combines per-device partial sums
with a psum whose association differs from the single-device reduction, so
it is pinned statistically (last-ulp tolerance), not bit-equal.

The reference has no analog of any of this (SURVEY.md §5
checkpoint/resume: none).
"""

import numpy as np
import pytest

import jax

from flux_tpu.checkpoint import ProgressiveRenderer
from flux_tpu.parallel import MeshRenderer, make_mesh
from flux_tpu.render import Renderer
from tests.test_render import env_sphere, make_scene
from flux_tpu.scene import MaterialData, MaterialKind, PlaneData, SphereData


def scene():
    floor = PlaneData(
        point=(0.0, 0.0, 0.0),
        normal=(0.0, 1.0, 0.0),
        material=MaterialData(kind=MaterialKind.MATTE, color=(0.5, 0.5, 0.5), param=1.0),
    )
    ball = SphereData(
        center=(0.0, 1.0, 0.0),
        radius=1.0,
        material=MaterialData(
            kind=MaterialKind.GLOSSY, color=(0.9, 1.0, 0.9), param=0.9, exponent=100.0
        ),
    )
    return make_scene([env_sphere(1.0), floor, ball], w=32, h=16)


def single(sd, **kw):
    return Renderer(sd, sample_root=4, max_depth=3, seed=11, target_lanes=1 << 16, **kw)


def mesh_rows(sd, devices8, rows_shards=8, **kw):
    """Rows-only mesh over ``rows_shards`` devices (the bit-exact shape)."""
    return MeshRenderer(
        sd,
        sample_root=4,
        max_depth=3,
        seed=11,
        mesh=make_mesh(devices8[:rows_shards], rows_shards=rows_shards, spp_shards=1),
        target_lanes=1 << 16,
        **kw,
    )


@pytest.mark.parametrize("rows_shards", [8, 2])
def test_mesh_range_with_stats_bit_identical_rows_sharded(devices8, rows_shards):
    """The sharded (s0, n_samples, with_stats) surface is bit-identical to
    the single-device one on rows-only meshes — radiance AND the luminance
    second moment, for aligned and unaligned sample ranges."""
    sd = scene()
    r1 = single(sd)
    rm = mesh_rows(sd, devices8, rows_shards=rows_shards)
    for s0, n in [(0, 5), (5, 11), (0, 16), (13, 3)]:
        a = np.asarray(r1.render_rows_sum_range(0, 16, s0, n, with_stats=True))
        b = np.asarray(rm.render_rows_sum_range(0, 16, s0, n, with_stats=True))
        np.testing.assert_array_equal(a, b, err_msg=f"range ({s0}, {n})")


@pytest.mark.parametrize("rows_shards,spp_shards", [(1, 8), (2, 4)])
def test_mesh_range_with_stats_spp_sharded_statistical(
    devices8, rows_shards, spp_shards
):
    """spp-sharded ranges agree to float32 associativity (psum combines the
    per-device partials in a different order than one device's reduce)."""
    sd = scene()
    r1 = single(sd)
    rm = MeshRenderer(
        sd, 4, 3, seed=11,
        mesh=make_mesh(devices8, rows_shards=rows_shards, spp_shards=spp_shards),
        target_lanes=1 << 16,
    )
    for s0, n in [(0, 5), (5, 11)]:
        a = np.asarray(r1.render_rows_sum_range(0, 16, s0, n, with_stats=True))
        b = np.asarray(rm.render_rows_sum_range(0, 16, s0, n, with_stats=True))
        np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-6)


def test_progressive_on_mesh_matches_single_device(devices8):
    """Full progressive runs (acc, moments, adaptive signal, final image)
    agree bit-for-bit between device counts on the rows-sharded mesh — so
    an --adaptive run stops at the same pass everywhere."""
    sd = scene()
    p1 = ProgressiveRenderer.from_renderer(single(sd))
    pm = ProgressiveRenderer.from_renderer(mesh_rows(sd, devices8))
    assert p1.fingerprint == pm.fingerprint
    while not p1.complete:
        n1 = p1.render_pass(5)
        nm = pm.render_pass(5)
        assert n1 == nm
        np.testing.assert_array_equal(p1.acc, pm.acc)
        np.testing.assert_array_equal(p1.lum_sq, pm.lum_sq)
        e1, em = p1.max_rel_stderr(), pm.max_rel_stderr()
        assert (e1 is None) == (em is None)
        if e1 is not None:
            assert e1 == em  # identical adaptive-stop decisions
    assert pm.complete
    np.testing.assert_array_equal(p1.peek(), pm.peek())
    # The completed accumulator equals the one-shot full render up to f32
    # associativity (pass-chunked host accumulation vs one device launch —
    # this tolerance is about pass structure, not about the mesh).
    ref = single(sd).render_image()
    np.testing.assert_allclose(p1.peek(), ref, rtol=2e-6, atol=2e-6)


def test_checkpoint_interchangeable_between_mesh_and_single(devices8, tmp_path):
    """A checkpoint written mid-render on the rows-sharded mesh resumes
    bit-identically on a single device (and vice versa) — the fingerprint
    covers the estimator, not the device topology."""
    sd = scene()
    ck = str(tmp_path / "mesh.ckpt")

    pm = ProgressiveRenderer.from_renderer(mesh_rows(sd, devices8))
    pm.render_pass(6)
    pm.save(ck)

    p1 = ProgressiveRenderer.from_renderer(single(sd))
    p1.resume(ck)
    assert p1.samples_done == 6
    while not p1.complete:
        p1.render_pass(6)

    # Reference: an UNINTERRUPTED single-device run with the same pass
    # structure (host accumulation order is part of the result's bit
    # pattern, so the contrast holds pass sizes fixed).
    ref = ProgressiveRenderer.from_renderer(single(sd))
    while not ref.complete:
        ref.render_pass(6)
    np.testing.assert_array_equal(p1.acc, ref.acc)
    np.testing.assert_array_equal(p1.lum_sq, ref.lum_sq)
    np.testing.assert_array_equal(p1.peek(), ref.peek())

    # Reverse direction: single-device checkpoint finished on the mesh.
    ck2 = str(tmp_path / "single.ckpt")
    pa = ProgressiveRenderer.from_renderer(single(sd))
    pa.render_pass(6)
    pa.save(ck2)
    pb = ProgressiveRenderer.from_renderer(mesh_rows(sd, devices8))
    pb.resume(ck2)
    while not pb.complete:
        pb.render_pass(6)
    np.testing.assert_array_equal(pb.acc, ref.acc)
    np.testing.assert_array_equal(pb.peek(), ref.peek())


def test_mesh_progressive_with_nee(devices8):
    """The stats channel coexists with NEE on the mesh (lights ride the
    same replicated spec) and stays bit-exact on the rows-only shape."""
    sd = make_scene(
        [
            env_sphere(0.2),
            PlaneData(
                point=(0.0, 0.0, 0.0),
                normal=(0.0, 1.0, 0.0),
                material=MaterialData(
                    kind=MaterialKind.MATTE, color=(0.7, 0.7, 0.7), param=1.0
                ),
            ),
            SphereData(
                center=(0.0, 3.0, 0.0),
                radius=0.5,
                material=MaterialData(
                    kind=MaterialKind.EMISSIVE, color=(1.0, 1.0, 1.0), param=40.0
                ),
            ),
        ],
        w=16,
        h=8,
    )
    r1 = Renderer(sd, 2, 3, seed=5, target_lanes=1 << 16, nee=True)
    rm = MeshRenderer(
        sd, 2, 3, seed=5,
        mesh=make_mesh(jax.devices()[:8], rows_shards=8, spp_shards=1),
        target_lanes=1 << 16, nee=True,
    )
    a = np.asarray(r1.render_rows_sum_range(0, 8, 0, 3, with_stats=True))
    b = np.asarray(rm.render_rows_sum_range(0, 8, 0, 3, with_stats=True))
    np.testing.assert_array_equal(a, b)
