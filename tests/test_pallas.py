"""Pallas megakernel parity tests (interpret mode on CPU).

The kernel must produce bit-identical radiance sums to the XLA path — both
consume the same counter-based sample streams and SoA ops, differing only
in scheduling (ops/pallas_kernel.py)."""

import os

import numpy as np
import pytest

from flux_tpu.camera import camera_arrays
from flux_tpu.ops.pallas_kernel import render_block_pallas
from flux_tpu.render import render_block
from flux_tpu.scene import compile_scene, load_scene
from tests.test_render import env_sphere, make_scene
from flux_tpu.scene import MaterialData, MaterialKind, PlaneData, SphereData


def _pair(sd, **kw):
    scene = compile_scene(sd)
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    a = render_block(scene, cam, np.int32(kw.pop("row0", 0)), np.uint32(kw.pop("s0", 0)),
                     np.uint32(kw.pop("seed", 3)), **kw)
    b = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3), interpret=True, **kw
    )
    return np.asarray(a), np.asarray(b)


def test_demo_scene_parity():
    sd = load_scene("scenes/demo2.yml")
    kw = dict(img_w=800, img_h=600, n_rows=3, n_samples=5, root=4, max_depth=5)
    a, b = _pair(sd, **kw)
    np.testing.assert_array_equal(a, b)


def test_sphere_only_scene_parity():
    sd = make_scene([env_sphere(1.0)], w=20, h=6)
    kw = dict(img_w=20, img_h=6, n_rows=6, n_samples=4, root=2, max_depth=3)
    a, b = _pair(sd, **kw)
    np.testing.assert_array_equal(a, b)


def test_plane_only_scene_parity():
    """Zero spheres exercises the unhittable-padding path."""
    floor = PlaneData(
        point=(0.0, 0.0, 0.0),
        normal=(0.0, 1.0, 0.0),
        material=MaterialData(kind=MaterialKind.MATTE, color=(0.5, 0.5, 0.5), param=1.0),
    )
    sd = make_scene([floor], w=16, h=4, background=(0.2, 0.4, 0.6))
    kw = dict(img_w=16, img_h=4, n_rows=4, n_samples=3, root=2, max_depth=2)
    a, b = _pair(sd, **kw)
    np.testing.assert_array_equal(a, b)


def test_no_planes_scene_parity():
    ball = SphereData(
        center=(0.0, 1.0, 0.0),
        radius=1.0,
        material=MaterialData(
            kind=MaterialKind.GLOSSY, color=(0.9, 1.0, 0.9), param=0.9, exponent=100.0
        ),
    )
    sd = make_scene([env_sphere(1.0), ball], w=16, h=8)
    kw = dict(img_w=16, img_h=8, n_rows=8, n_samples=4, root=2, max_depth=4)
    a, b = _pair(sd, **kw)
    np.testing.assert_array_equal(a, b)


def test_sample_chunk_offsets():
    """Non-zero s0 and ragged n_samples vs S_BLK padding."""
    sd = load_scene("scenes/demo1.yml")
    scene = compile_scene(sd)
    cam = camera_arrays(sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size)
    kw = dict(img_w=800, img_h=600, n_rows=2, root=3, max_depth=3)
    a = render_block(scene, cam, np.int32(5), np.uint32(4), np.uint32(7), n_samples=5, **kw)
    b = render_block_pallas(
        scene, cam, np.int32(5), np.uint32(4), np.uint32(7), n_samples=5,
        interpret=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_early_exit_matches_straightline():
    """The whole-tile early exit (VMEM scratch state + pl.when) must be a
    pure scheduling change: bit-identical to the straight-line bounce loop,
    including on a scene where most tiles die at depth 1 (env sphere)."""
    sd = load_scene("scenes/demo2.yml")
    scene = compile_scene(sd)
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    kw = dict(img_w=800, img_h=600, n_rows=2, n_samples=4, root=4, max_depth=5,
              interpret=True)
    a = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3), early_exit=True, **kw
    )
    b = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3), early_exit=False, **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_early_exit_matches_straightline_nee():
    from flux_tpu.ops.nee import extract_lights
    from tests.test_nee import light_scene

    sd = light_scene()
    scene = compile_scene(sd)
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    lights = extract_lights(sd)
    kw = dict(img_w=32, img_h=24, n_rows=8, n_samples=4, root=2, max_depth=3,
              lights=lights, physical=True, interpret=True)
    a = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(0), early_exit=True, **kw
    )
    b = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(0), early_exit=False, **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_early_exit_cond_matches_straightline():
    """The register-carried early exit (``early_exit="cond"`` — path state
    in vector registers, each bounce under a value-yielding lax.cond with
    bools crossing as f32) must also be a pure scheduling change. Small
    scene/depth on purpose: interpret-mode XLA:CPU compile time of nested
    value-yielding conditionals over the full bounce body is superlinear
    and minutes-scale at demo shapes. Real-chip (Mosaic) parity of the
    cond form at full demo2/NEE/scan/tri-light shapes was verified
    bit-exact on v5e (NOTES.md round 4); this pins the logic in CI."""
    ball = SphereData(
        center=(0.0, 1.0, 0.0),
        radius=1.0,
        material=MaterialData(
            kind=MaterialKind.MATTE, color=(0.8, 0.5, 0.4), param=1.0
        ),
    )
    sd = make_scene([env_sphere(1.0), ball], w=16, h=8)
    scene = compile_scene(sd)
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    kw = dict(img_w=16, img_h=8, n_rows=8, n_samples=4, root=2, max_depth=3,
              interpret=True)
    a = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3),
        early_exit="cond", **kw
    )
    b = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3),
        early_exit=False, **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_early_exit_cond_scan_skip_parity():
    """The register-carried early exit must refresh the alive row the scan
    skip's need mask reads (alive_ref stands in for st_ref[12]); a stale or
    missing mask would let the skip fold blocks for dead/padded lanes or —
    worse — skip blocks live lanes need. Pin bit-parity against the
    straight-line unskipped fold on a scan scene (small shapes: see the
    compile-time note on test_early_exit_cond_matches_straightline)."""
    from flux_tpu.genscene import sphere_field

    sd = sphere_field(70, 4, width=24, height=8)
    scene = compile_scene(sd)
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    kw = dict(img_w=24, img_h=8, n_rows=8, n_samples=2, root=2, max_depth=2,
              accel="scan", interpret=True)
    a = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3),
        early_exit="cond", scan_skip=True, **kw
    )
    b = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3),
        early_exit=False, scan_skip=False, **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_skip_matches_unskipped():
    """The per-block AABB skip must be a pure scheduling change: skipped
    blocks are exactly those no live lane's ray enters, so the winner fold
    is untouched — bit-identical output with the skip on or off."""
    from flux_tpu.genscene import sphere_field

    sd = sphere_field(70, 4, width=40, height=24)
    scene = compile_scene(sd)
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    kw = dict(img_w=40, img_h=24, n_rows=24, n_samples=4, root=2, max_depth=3,
              accel="scan", interpret=True)
    a = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3), scan_skip=True, **kw
    )
    b = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3), scan_skip=False, **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_skip_nee_matches_unskipped():
    from flux_tpu.ops.nee import extract_lights
    from flux_tpu.genscene import sphere_field

    sd = sphere_field(70, 4, width=32, height=16)
    scene = compile_scene(sd)
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    lights = extract_lights(sd)
    if lights is None:
        import pytest

        pytest.skip("generated field has no lights")
    kw = dict(img_w=32, img_h=16, n_rows=16, n_samples=4, root=2, max_depth=3,
              accel="scan", lights=lights, interpret=True)
    a = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(1), scan_skip=True, **kw
    )
    b = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(1), scan_skip=False, **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_two_level_scan_skip_parity():
    """560 spheres = 18 blocks >= SUPER_ENGAGE: the superblock (two-level)
    AABB skip engages, pads the block table to a SCAN_SUPER multiple, and
    must remain a pure scheduling change — bit-identical to the unskipped
    fold. (Cross-backend kernel-vs-XLA-scan parity is pinned separately by
    test_triangle_scan_accel_parity; real-chip A/B checksums matched at
    4096 spheres, NOTES.md round 3.)"""
    from flux_tpu.genscene import sphere_field
    from flux_tpu.ops.intersect import SCAN_BLOCK
    from flux_tpu.ops.pallas_kernel import SUPER_ENGAGE

    sd = sphere_field(560, 4, width=24, height=8)
    scene = compile_scene(sd)
    assert -(-scene.num_spheres // SCAN_BLOCK) >= SUPER_ENGAGE
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    # early_exit off: without the scratch state machine the skip's need
    # mask is simply None (every lane tested) — the two-level containment
    # argument is unchanged, and the interpret-mode compile halves.
    kw = dict(img_w=24, img_h=8, n_rows=8, n_samples=2, root=2, max_depth=2,
              accel="scan", interpret=True, early_exit=False)
    a = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3), scan_skip=True, **kw
    )
    b = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3), scan_skip=False, **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_two_level_tri_skip_parity():
    """320 triangles = 20 blocks >= SUPER_ENGAGE: the triangle superblock
    skip engages; bit-identical to the unskipped triangle fold."""
    from flux_tpu.ops.intersect import TRI_SCAN_BLOCK
    from flux_tpu.ops.pallas_kernel import SUPER_ENGAGE

    sd = _tri_scene(w=16, h=8, subdiv=2)
    scene = compile_scene(sd)
    assert -(-scene.num_triangles // TRI_SCAN_BLOCK) >= SUPER_ENGAGE
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    kw = dict(img_w=16, img_h=8, n_rows=4, n_samples=2, root=2, max_depth=2,
              interpret=True)
    a = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3), tri_skip=True, **kw
    )
    b = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3), tri_skip=False, **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_sphere_free_scene_kernel():
    """Plane-only scene through the megakernel's scan path (regression:
    the sorted layout must tolerate num_spheres == 0)."""
    sd = make_scene(
        [PlaneData(point=(0.0, -1.0, 0.0), normal=(0.0, 1.0, 0.0),
                   material=MaterialData(kind=MaterialKind.MATTE,
                                         color=(0.5, 0.5, 0.5), param=1.0))],
        w=16, h=8,
    )
    scene = compile_scene(sd)
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    kw = dict(img_w=16, img_h=8, n_rows=8, n_samples=2, root=2, max_depth=2)
    a = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(0), accel="scan",
        interpret=True, **kw
    )
    b = render_block(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(0), **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Triangle fold (the megakernel's blocked Morton triangle scan)


def _tri_scene(extra=(), w=24, h=16, subdiv=0):
    """Icosphere mesh (20 triangles at subdiv 0 — two TRI_SCAN_BLOCKs, so
    the kernel fold iterates blocks and sees NaN padding; the XLA blocked
    form past TRI_UNROLL_MAX is exercised by test_trimesh) + glossy sphere
    + matte floor + env light. Kept small: each interpret-mode kernel
    variant is a multi-minute compile at 80 triangles."""
    from flux_tpu.meshgen import icosphere, mesh_triangles

    matte = MaterialData(kind=MaterialKind.MATTE, color=(0.7, 0.3, 0.3), param=1.0)
    glossy = SphereData(
        center=(1.5, 0.5, 1.0), radius=0.5,
        material=MaterialData(
            kind=MaterialKind.GLOSSY, color=(0.9, 1.0, 0.9), param=0.9, exponent=50.0
        ),
    )
    floor = PlaneData(
        point=(0.0, 0.0, 0.0), normal=(0.0, 1.0, 0.0),
        material=MaterialData(kind=MaterialKind.MATTE, color=(0.6, 0.6, 0.6), param=1.0),
    )
    v, f = icosphere(subdiv)
    tris = mesh_triangles(v, f, matte, scale=1.0, offset=(0.0, 1.0, 0.0))
    return make_scene(
        [env_sphere(1.0), glossy, floor] + tris + list(extra), w=w, h=h
    )




def _assert_ulp_equal(a, b, max_ulp=1):
    """Equal to within ``max_ulp`` representable floats, elementwise.

    Cross-backend triangle parity is 1-ulp, not bit-exact: the fold/merge
    semantics are bit-identical (pinned by a pure-JAX replication of the
    kernel's intersect structure against the XLA fold), but XLA CPU fuses
    the surrounding arithmetic differently in the two compiled programs
    (FMA contraction), shifting a handful of lanes by one ulp — the same
    compiler-scheduling fragility NOTES.md documents for cross-backend
    comparisons. Within-kernel invariances (skip on/off, early exit
    on/off) remain bit-exact and are asserted with array_equal."""
    a = np.asarray(a); b = np.asarray(b)
    ai = a.view(np.int32).astype(np.int64)
    bi = b.view(np.int32).astype(np.int64)
    ai = np.where(ai < 0, np.int64(-0x80000000) - ai, ai)
    bi = np.where(bi < 0, np.int64(-0x80000000) - bi, bi)
    d = np.abs(ai - bi)
    assert d.max() <= max_ulp, f"max ulp distance {d.max()} at {np.argwhere(d > max_ulp)[:5]}"


def test_triangle_scene_parity():
    """Megakernel triangle fold vs the XLA path: 1-ulp radiance parity\n    (see _assert_ulp_equal for why not bit-exact)."""
    sd = _tri_scene()
    kw = dict(img_w=24, img_h=16, n_rows=6, n_samples=3, root=2, max_depth=3)
    a, b = _pair(sd, **kw)
    _assert_ulp_equal(a, b)


def test_triangle_scan_accel_parity():
    """Triangles + the sphere scan path (both strategies blocked in-kernel)
    vs the XLA scan (which shares the carried winner fold semantics)."""
    from flux_tpu.ops.intersect import Intersector, scan_layout

    sd = _tri_scene()
    scene = compile_scene(sd)
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    kw = dict(img_w=24, img_h=16, n_rows=6, n_samples=3, root=2, max_depth=3)
    isect = Intersector(mode="scan", layout=scan_layout(scene))
    a = render_block(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3), isect=isect, **kw
    )
    b = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3), accel="scan",
        interpret=True, **kw
    )
    _assert_ulp_equal(np.asarray(a), np.asarray(b))


def test_triangle_nee_parity():
    """NEE shadow rays must fold triangles in-kernel too (occlusion), and
    an emissive triangle must emit facing-only — bit parity with XLA."""
    from flux_tpu.ops.nee import extract_lights
    from flux_tpu.scene import TriangleData

    light = SphereData(
        center=(0.0, 4.0, 0.0), radius=0.5,
        material=MaterialData(
            kind=MaterialKind.EMISSIVE, color=(1.0, 0.95, 0.9), param=30.0
        ),
    )
    glow = TriangleData(  # emissive triangle: BSDF-found emission only
        v0=(-2.5, 0.2, 1.0), v1=(-1.5, 0.2, 1.0), v2=(-2.0, 1.2, 1.0),
        material=MaterialData(kind=MaterialKind.EMISSIVE, color=(0.2, 0.9, 1.0), param=4.0),
    )
    sd = _tri_scene(extra=[light, glow])
    scene = compile_scene(sd)
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    lights = extract_lights(sd)
    assert lights is not None
    # One transport mode (physical=True is the superset: MIS reverse
    # density + suppression + shadow folds all carry weight), depth 2,
    # and early_exit off — the state machine is pinned as a pure
    # scheduling change elsewhere, and since round 3 this light set has
    # triangle rows, making the kernel program an interpret-mode compile
    # monster (compile time is superlinear in the unrolled bounces).
    # Reference-mode depth-3 parity on this same scene is covered by the
    # env-gated test_triangle_nee_parity_reference_depth3 below (run on
    # the real chip / under FLUX_TPU_SLOW_TESTS=1), where Mosaic compiles
    # the deep program in seconds instead of interpret-mode minutes.
    kw = dict(img_w=24, img_h=16, n_rows=6, n_samples=3, root=2,
              max_depth=2, lights=lights, physical=True)
    a = render_block(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(5), **kw
    )
    b = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(5),
        interpret=True, early_exit=False, **kw
    )
    _assert_ulp_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(
    not os.environ.get("FLUX_TPU_SLOW_TESTS"),
    reason="interpret-mode depth-3 NEE kernel compile is superlinear-slow; "
    "set FLUX_TPU_SLOW_TESTS=1 (or run on a real chip) to include it",
)
def test_triangle_nee_parity_reference_depth3():
    """Reference-mode (physical=False) sphere+tri mixed NEE parity at
    depth 3 — the exact coverage test_triangle_nee_parity dropped when it
    went depth 2 / physical-only (ADVICE r3). Tiny band and sample count
    keep the unrolled program as small as the estimator allows; still
    env-gated because interpret-mode XLA:CPU compile time of the depth-3
    NEE+tri kernel is minutes even at these shapes."""
    from flux_tpu.ops.nee import extract_lights
    from flux_tpu.scene import TriangleData

    light = SphereData(
        center=(0.0, 4.0, 0.0), radius=0.5,
        material=MaterialData(
            kind=MaterialKind.EMISSIVE, color=(1.0, 0.95, 0.9), param=30.0
        ),
    )
    glow = TriangleData(
        v0=(-2.5, 0.2, 1.0), v1=(-1.5, 0.2, 1.0), v2=(-2.0, 1.2, 1.0),
        material=MaterialData(
            kind=MaterialKind.EMISSIVE, color=(0.2, 0.9, 1.0), param=4.0
        ),
    )
    sd = _tri_scene(extra=[light, glow])
    scene = compile_scene(sd)
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    lights = extract_lights(sd)
    assert lights is not None and lights.has_tris
    kw = dict(img_w=16, img_h=12, n_rows=4, n_samples=2, root=1,
              max_depth=3, lights=lights, physical=False)
    a = render_block(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(5), **kw
    )
    b = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(5),
        interpret=True, early_exit=False, **kw
    )
    _assert_ulp_equal(np.asarray(a), np.asarray(b))


def test_triangle_light_nee_parity():
    """Triangle lights sampled IN-KERNEL (uniform-area NEE): the quad light
    actually illuminates the floor here (unlike test_triangle_nee_parity's
    side-facing glow), so the tri-light direct term, shadow rays with
    tri_t, emission suppression, and the MIS reverse density all carry
    weight — 1-ulp parity with the XLA path in both transport modes."""
    from flux_tpu.ops.nee import extract_lights
    from tests.test_nee import tri_light_scene

    sd = tri_light_scene(sphere_light=True)
    scene = compile_scene(sd)
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    lights = extract_lights(sd)
    assert lights is not None and lights.has_tris
    # Physical (MIS) mode exercises the superset: the tri-light forward
    # density, the reverse density at BSDF hits, glossy NEE, plus the
    # shadow/suppression machinery. Reference-mode tri NEE parity is
    # pinned by test_triangle_light_nee_remap_padded_base below.
    # early_exit=False and depth 2 (camera → NEE vertex → MIS-weighted
    # light hit — the full estimator in two bounces): interpret-mode XLA
    # compile time is superlinear in the unrolled program, and each extra
    # bounce inlines the whole intersect+NEE machinery again.
    kw = dict(img_w=32, img_h=24, n_rows=8, n_samples=4, root=2,
              max_depth=2, lights=lights, physical=True)
    a = render_block(
        scene, cam, np.int32(8), np.uint32(0), np.uint32(11), **kw
    )
    b = render_block_pallas(
        scene, cam, np.int32(8), np.uint32(0), np.uint32(11),
        interpret=True, early_exit=False, **kw
    )
    aa, bb = np.asarray(a), np.asarray(b)
    assert aa.max() > 0.0, "tri light must actually illuminate the band"
    _assert_ulp_equal(aa, bb)


def test_triangle_light_nee_remap_padded_base():
    """Tri-light shape indices must be remapped to the kernel's rebuilt
    numbering whenever the kernel pads the sphere table (the padded
    sphere+plane base shifts every triangle index): emission suppression
    and shadow self-exclusion would silently misfire otherwise. A
    SPHERE-FREE scene forces the shift on the cheap sweep path (the
    kernel inserts one fake sphere, so base moves 2 → 3; the scan path's
    SCAN_BLOCK padding shifts by 30 through the identical code — covered
    on the real chip, NOTES.md round 3). A wrong shift self-occludes the
    quad's own shadow rays, so parity here is a sharp detector."""
    from flux_tpu.ops.nee import extract_lights
    from tests.test_nee import tri_light_scene

    base_sd = tri_light_scene()
    sd = base_sd.__class__(
        scene_name=base_sd.scene_name,
        output_settings=base_sd.output_settings,
        background=base_sd.background,
        shapes=tuple(s for s in base_sd.shapes if not hasattr(s, "radius")),
        camera_settings=base_sd.camera_settings,
        camera_data=base_sd.camera_data,
    )
    scene = compile_scene(sd)
    assert scene.num_spheres == 0 and scene.num_triangles == 2
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    lights = extract_lights(sd)
    assert lights is not None and lights.has_tris
    kw = dict(img_w=32, img_h=24, n_rows=8, n_samples=4, root=2,
              max_depth=2, lights=lights)
    a = render_block(
        scene, cam, np.int32(8), np.uint32(0), np.uint32(11), **kw
    )
    b = render_block_pallas(
        scene, cam, np.int32(8), np.uint32(0), np.uint32(11),
        interpret=True, early_exit=False, **kw
    )
    aa = np.asarray(a)
    assert aa.max() > 0.0, "quad light must illuminate the floor band"
    # 4-ulp bound, not 1: reference-mode NEE runs the partial-cone
    # clipping trig chain (frame build → arc arccos polynomial → angle
    # addition), whose longer dependency chains let XLA CPU's differing
    # FMA contraction drift a couple of ulps across the two programs
    # (observed max 2). A remap misfire self-occludes whole shadow terms
    # — off by factors, far beyond any ulp bound.
    _assert_ulp_equal(aa, np.asarray(b), max_ulp=4)


def test_triangle_early_exit_matches_straightline():
    """The tri fold must be invariant to the whole-tile early exit (its
    alive-mask only makes the AABB skip more aggressive, never changes a
    winner). The register-carried form's triangle interplay (alive_ref
    feeding the tri skip) is pinned on the real chip (NOTES.md round 4);
    interpret-mode conds over the tri fold are compile-prohibitive."""
    sd = _tri_scene()
    scene = compile_scene(sd)
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    kw = dict(img_w=24, img_h=16, n_rows=6, n_samples=3, root=2, max_depth=3,
              interpret=True)
    a = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3), early_exit=True, **kw
    )
    b = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3), early_exit=False, **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_triangle_skip_matches_unskipped():
    """The per-block triangle AABB skip must be a pure scheduling change:
    bit-identical output with the skip on or off (same rule as the sphere
    scan skip)."""
    sd = _tri_scene()
    scene = compile_scene(sd)
    cam = camera_arrays(
        sd.camera_settings, sd.camera_data, sd.output_settings.pixel_size
    )
    kw = dict(img_w=24, img_h=16, n_rows=6, n_samples=3, root=2, max_depth=3,
              interpret=True)
    a = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3), tri_skip=True, **kw
    )
    b = render_block_pallas(
        scene, cam, np.int32(0), np.uint32(0), np.uint32(3), tri_skip=False, **kw
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tri_layout_covers_all_triangles():
    """The Morton layout is a permutation: every original triangle appears
    exactly once; padding is NaN-v0 with index -1; per-block AABBs contain
    their block's real vertices."""
    from flux_tpu.ops.intersect import TRI_SCAN_BLOCK, tri_layout

    sd = _tri_scene()
    scene = compile_scene(sd)
    L = tri_layout(scene)
    nt = scene.num_triangles
    idx = np.asarray(L.idx).reshape(-1)
    real = idx >= 0
    assert sorted(idx[real].tolist()) == list(range(nt))
    assert np.isnan(np.asarray(L.v0).reshape(-1, 3)[~real]).all()
    v0 = np.asarray(L.v0)
    e1 = np.asarray(L.e1)
    e2 = np.asarray(L.e2)
    bmin = np.asarray(L.bmin)
    bmax = np.asarray(L.bmax)
    realb = np.asarray(L.idx) >= 0
    for b in range(L.n_blocks):
        if not realb[b].any():
            assert np.isnan(bmin[b]).all() and np.isnan(bmax[b]).all()
            continue
        verts = np.stack(
            [v0[b][realb[b]], (v0[b] + e1[b])[realb[b]], (v0[b] + e2[b])[realb[b]]]
        ).reshape(-1, 3)
        assert (verts >= bmin[b] - 1e-6).all() and (verts <= bmax[b] + 1e-6).all()
