"""The wavefront renderer: megabatches of camera paths under ``lax.scan``.

This replaces the reference's entire hot path — the row×col×sample loop nest
with per-pixel recursion (fluxcore/src/trace.rs:53-97 + scene.rs:162-172) —
with a single fused computation per (row-band, sample-chunk) block:

* lane grid ``(samples, rows, cols)``; every lane's stratified samples are
  regenerated from counters (see flux_tpu.samplers) instead of the
  reference's precomputed ``MasterSampleSets`` tables (sampling.rs:12-33),
  which at root=128 cost ~1.6 GB per worker and a heap walk per lookup —
  on TPU a few dozen VPU integer ops per sample beat that memory traffic.
* primary rays from the thin-lens camera (camera.py), one fused pass
* ``max_trace_depth`` bounce iterations via ``lax.scan`` with alive-masking
  (the recursion inversion; scene.rs:164-165 depth cap semantics preserved)
* radiance summed over the sample axis into a row-band accumulator; the
  pixel average and ``max_to_one`` tone map (trace.rs:85-87) are applied by
  :func:`finalize` only after *all* chunks of a pixel have accumulated.

Sample-set semantics vs the reference: flux picks a shuffled sample *set* per
(row, column) and indexes precomputed CMJ/disc/hemisphere tables with the
sample index (trace.rs:64-69, materials.rs:21-23).  Here every (pixel,
purpose, depth) gets its own CMJ/MJ pattern id derived by hashing, giving the
same stratification properties with zero tables and per-pixel (rather than
per-width-modulo) decorrelation.  Determinism, which the reference lacks
entirely (thread_rng seeding, samplers/src/lib.rs:27-33), comes free: the
image is a pure function of (scene, config, seed).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .camera import CameraArrays, camera_arrays, primary_rays
from .color import luminance, max_to_one
from .ops.intersect import Intersector
from .ops.shade import PathState, bounce
from .samplers.hash import hash_combine
from .samplers.patterns import bounce_point, cmj_point
from .samplers.warps import to_poisson_disc
from .scene import SceneArrays, SceneData, compile_scene
from .vec import Vec3

__all__ = ["render_block", "finalize", "Renderer", "plan_chunks"]

# Sphere count above which Renderer auto-selects the blocked scan over the
# unrolled sweep (the sweep's XLA compile time explodes past ~150 spheres).
SCAN_AUTO_THRESHOLD = 64

# Purpose salts separating the independent sample streams of a pixel.
from .constants import SALT_AA, SALT_BOUNCE, SALT_LENS, SALT_NEE, SALT_NEEPICK  # noqa: E402


def render_block_impl(
    scene: SceneArrays,
    cam: CameraArrays,
    row0,
    s0,
    seed,
    *,
    img_w: int,
    img_h: int,
    n_rows: int,
    n_samples: int,
    root: int,
    max_depth: int,
    s_limit=None,
    pvary_axes=(),
    isect=None,
    with_stats=False,
    lights=None,
    physical=False,
    row_stride=1,
):
    """Radiance *sum* over sample indices [s0, s0+n_samples) for a row band.

    Returns ``(n_rows, img_w, 3)`` float32. ``row0``/``s0``/``seed`` are
    traced scalars, so one compilation serves every block of a job.
    ``s_limit`` (traced, optional) masks off lanes with global sample index
    >= s_limit — used by the sharded renderer when root² doesn't divide the
    device count evenly.  ``isect`` (an ops/intersect.py Intersector, built
    once at Renderer construction) selects the intersection strategy —
    unrolled sweep (default) or blocked scan.  This is
    the un-jitted core so it can be invoked inside ``shard_map``; use
    :func:`render_block` directly otherwise.
    """
    if isect is None:
        isect = Intersector(mode="sweep")
    s_idx = (jnp.uint32(s0) + jnp.arange(n_samples, dtype=jnp.uint32))[:, None, None]
    # row_stride > 1 renders every row_stride-th row starting at row0 — the
    # interleaved row assignment of the sharded renderer (parallel/shard.py),
    # which decorrelates per-row cost across 'rows' shards (sky rows are far
    # cheaper than geometry rows under the megakernel's early exit).
    row = (
        jnp.int32(row0)
        + jnp.arange(n_rows, dtype=jnp.int32) * np.int32(row_stride)
    )[None, :, None]
    col = jnp.arange(img_w, dtype=jnp.int32)[None, None, :]

    pixel_base = hash_combine(seed, row, col)  # (1, n_rows, img_w) uint32

    # Anti-aliasing jitter: CMJ per pixel (pixel_sets analog, sampling.rs:16).
    ax, ay = cmj_point(s_idx, root, hash_combine(pixel_base, SALT_AA))
    # Lens sample: CMJ warped to the unit disc (disc_sets analog, :19-21).
    ux, uy = cmj_point(s_idx, root, hash_combine(pixel_base, SALT_LENS))
    lx, ly = to_poisson_disc(ux, uy)

    o, d = primary_rays(cam, row, col, img_w, img_h, ax, ay, lx, ly)
    shape = (n_samples, n_rows, img_w)

    def full(vec):
        return Vec3(
            jnp.broadcast_to(vec.x, shape),
            jnp.broadcast_to(vec.y, shape),
            jnp.broadcast_to(vec.z, shape),
        )

    ones = jnp.ones(shape, jnp.float32)
    zeros = jnp.zeros(shape, jnp.float32)
    if s_limit is None:
        alive0 = jnp.ones(shape, jnp.bool_)
    else:
        alive0 = jnp.broadcast_to(s_idx < jnp.uint32(s_limit), shape)
    state = PathState(
        o=full(o),
        d=full(d),
        throughput=Vec3(ones, ones, ones),
        radiance=Vec3(zeros, zeros, zeros),
        alive=alive0,
        suppress=None if lights is None else jnp.zeros(shape, jnp.bool_),
        prev_pdf=None if lights is None else jnp.zeros(shape, jnp.float32),
        # Camera rays originate on no shape (−1 matches nothing); each
        # bounce then carries its hit shape forward for the exact
        # self-re-hit exclusion (ops/intersect.sphere_t ``on_self``).
        prev_shape=jnp.full(shape, -1, jnp.int32),
        # MIS only: previous vertex's normal for the clipped reverse light
        # density (camera lanes have prev_pdf 0, so the initial value is
        # never consulted).
        prev_normal=(
            Vec3(zeros, zeros, zeros) if (lights is not None and physical)
            else None
        ),
    )
    if pvary_axes:
        # Under shard_map the scan carry must be device-varying from the
        # start or the first bounce changes its type (jax >= 0.7 varying-
        # axes checking). Only promote leaves that aren't varying already.
        def _pvary(a):
            vma = getattr(jax.typeof(a), "vma", frozenset())
            missing = tuple(ax for ax in pvary_axes if ax not in vma)
            return jax.lax.pcast(a, missing, to="varying") if missing else a

        state = jax.tree.map(_pvary, state)

    def step(st, depth: int):
        # Fresh stratified sample per (pixel, sample, depth) — the
        # hemi_sets[set][depth-1][sample] analog (materials.rs:21-23).
        # ``depth`` is a static int so bounce_point can pick MJ at the
        # first bounce and the cheaper jittered pattern beyond.
        pat = hash_combine(pixel_base, SALT_BOUNCE, np.uint32(depth))
        bx, by = bounce_point(s_idx, root, pat, depth)
        nee_samples = None
        if lights is not None:
            from .samplers.hash import randfloat

            npat = hash_combine(pixel_base, SALT_NEE, np.uint32(depth))
            ux, uy = bounce_point(s_idx, root, npat, depth)
            upick = randfloat(
                s_idx, hash_combine(pixel_base, SALT_NEEPICK, np.uint32(depth))
            )
            nee_samples = (
                jnp.broadcast_to(ux, st.o.x.shape),
                jnp.broadcast_to(uy, st.o.x.shape),
                jnp.broadcast_to(upick, st.o.x.shape),
                # Final-depth gate: the BSDF walk collects this light at the
                # NEXT vertex, which a depth-capped walk would never reach.
                depth < max_depth,
            )
        return bounce(
            scene, st, bx, by, isect=isect,
            lights=lights, nee_samples=nee_samples, physical=physical,
            first_bounce=depth == 1,
        )

    # Static Python loop (the lax.scan this replaces was unroll=True anyway,
    # so the emitted computation is the same); static depths let the sampler
    # kind vary per bounce.
    for depth in range(1, max_depth + 1):
        state = step(state, depth)
    # Paths still alive after max_depth bounces contribute black
    # (scene.rs:164-165) — their radiance simply stays un-augmented.
    rad = state.radiance
    # Sum over the sample axis; stack to (..., 3) only at the output boundary.
    channels = [jnp.sum(rad.x, axis=0), jnp.sum(rad.y, axis=0), jnp.sum(rad.z, axis=0)]
    if with_stats:
        # Per-sample luminance second moment — the adaptive-sampling noise
        # signal (per-pixel sample variance = E[lum²] − E[lum]²).
        lum = luminance(rad)
        channels.append(jnp.sum(lum * lum, axis=0))
    return jnp.stack(channels, axis=-1)


render_block = jax.jit(
    render_block_impl,
    static_argnames=(
        "img_w",
        "img_h",
        "n_rows",
        "n_samples",
        "root",
        "max_depth",
        "pvary_axes",
        "with_stats",
        "physical",
        "row_stride",
    ),
)




@partial(jax.jit, static_argnames=("root",))
def finalize(acc: jnp.ndarray, *, root: int) -> jnp.ndarray:
    """Average the root² samples and tone-map (trace.rs:85-87)."""
    return max_to_one(acc * np.float32(1.0 / (root * root)))


def plan_chunks(total: int, chunk: int):
    """Split ``total`` samples into (s0, n) launches, at most two shapes."""
    chunk = max(1, min(chunk, total))
    out = []
    s = 0
    while s + chunk <= total:
        out.append((s, chunk))
        s += chunk
    if s < total:
        out.append((s, total - s))
    return out


class Renderer:
    """Single-host renderer: compiles a scene once, renders row-band work
    units at full sample depth (the ``Camera::render`` + ``LocalWorker``
    compute role, trace.rs:53-97 / workers.rs:46-74).

    ``target_lanes`` bounds the wavefront size per device launch; sample
    chunks are sized so ``n_samples × n_rows × width ≈ target_lanes``.
    """

    def __init__(
        self,
        scene_data: SceneData,
        sample_root: int,
        max_depth: int,
        seed: int = 0,
        target_lanes: int = 32 << 20,
        backend: Optional[str] = None,
        accel: Optional[str] = None,
        nee: bool = False,
        physical: bool = False,
        early_exit=True,  # megakernel only: True (scratch) | "cond" | False
    ):
        self.early_exit = early_exit
        self.scene_data = scene_data
        self.scene = compile_scene(scene_data)
        self.cam = camera_arrays(
            scene_data.camera_settings,
            scene_data.camera_data,
            scene_data.output_settings.pixel_size,
        )
        self.width = scene_data.output_settings.image_width
        self.height = scene_data.output_settings.image_height
        self.root = int(sample_root)
        self.max_depth = int(max_depth)
        self.seed = int(seed) & 0xFFFFFFFF
        self.target_lanes = int(target_lanes)
        # Intersection strategy. The unrolled sweep is fastest at demo scale
        # but its compile time explodes past ~150 spheres; the blocked scan
        # keeps the same gather-free VPU math at constant compile time and
        # is the large-scene default. (A per-lane BVH traversal is
        # deliberately ABSENT: TPU has no vector gather — the XLA
        # stackless-threaded traversal lost to the block-skip scan at every
        # measured N and faulted the TPU runtime at 16k spheres, and the
        # round-5 in-kernel tile-coherent block tree lost 10-30% to the
        # lane-packed linear skip at 16k/65k/262k; PERFORMANCE.md.)
        if accel is None:
            accel = "scan" if self.scene.num_spheres > SCAN_AUTO_THRESHOLD else "sweep"
        if accel not in ("sweep", "scan"):
            raise ValueError(f"unknown accel {accel!r}")
        self.accel = accel
        # The one intersection-strategy object everything downstream calls;
        # the scan modes carry their Morton block layout built ONCE here.
        layout = None
        if accel in ("scan", "scan_carry"):
            from .ops.intersect import scan_layout

            layout = scan_layout(self.scene)
        self.isect = Intersector(layout=layout, mode=accel)
        # Next-event estimation (opt-in; ops/nee.py): direct light sampling
        # at diffuse vertices.
        self.lights = None
        if nee:
            from .ops.nee import extract_lights

            self.lights = extract_lights(scene_data)
        self.nee = self.lights is not None
        # Physical Lambertian transport (cosine-weighted matte sampling +
        # cosine NEE weight) instead of the reference's cosine-free matte
        # estimator; see ops/brdf.py and ops/nee.py.
        self.physical = bool(physical)
        if backend is None:
            # The megakernel wins ~2-4x on TPU hardware; everywhere else
            # (CPU, GPU) its Mosaic TPU lowering cannot run, so only an
            # actual TPU backend selects it. It implements sweep, scan (as
            # the VMEM carry-style scan), the blocked triangle fold, and
            # NEE over sphere AND triangle lights.
            on_tpu = jax.default_backend() == "tpu"
            backend = "pallas" if on_tpu else "xla"
        if backend not in ("xla", "pallas"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        # Morton triangle block layout for the megakernel, built ONCE here
        # (the sphere scan layout's sibling; ops/intersect.tri_layout).
        self.tri_blocks = None
        if backend == "pallas" and self.scene.num_triangles > 0:
            from .ops.intersect import tri_layout

            self.tri_blocks = tri_layout(self.scene)
    def _chunk_size(self, n_rows: int) -> int:
        spp = self.root * self.root
        per_sample_lanes = n_rows * self.width
        budget = self.target_lanes
        if self.accel == "scan":
            # The sphere scan's carry keeps extra wavefront state live
            # across every (bounce, block) step; measured HBM headroom on
            # v5e needs ~4x smaller launches than the fully-fused sweep.
            budget //= 4
        return max(1, min(spp, budget // max(per_sample_lanes, 1)))

    def render_rows_sum(self, row0: int, n_rows: int):
        """Device-side radiance sum over all root² samples for a row band."""
        return self.render_rows_sum_range(row0, n_rows, 0, self.root * self.root)

    def render_rows_sum_range(
        self, row0: int, n_rows: int, s0: int, n_samples: int, with_stats: bool = False
    ):
        """Radiance sum over sample indices [s0, s0 + n_samples) for a row
        band, on whichever backend/accel this renderer is configured with —
        the primitive under both full renders and progressive passes.
        ``with_stats`` appends a fourth channel: the per-pixel sum of squared
        sample luminances (the adaptive-sampling noise signal)."""
        if self.backend == "pallas":
            # The megakernel never materializes per-lane state in HBM, so a
            # whole band at full sample depth is one launch.
            from .ops.pallas_kernel import default_s_blk, render_block_pallas

            return render_block_pallas(
                self.scene,
                self.cam,
                np.int32(row0),
                np.uint32(s0),
                np.uint32(self.seed),
                img_w=self.width,
                img_h=self.height,
                n_rows=n_rows,
                n_samples=n_samples,
                root=self.root,
                max_depth=self.max_depth,
                accel=self.accel,
                s_blk=default_s_blk(
                    self.accel, self.scene.num_spheres, self.scene.num_triangles
                ),
                with_stats=with_stats,
                lights=self.lights,
                physical=self.physical,
                early_exit=self.early_exit,
                scan_blocks=self.isect.layout,
                tri_blocks=self.tri_blocks,
            )
        acc = None
        chunk = self._chunk_size(n_rows)
        for off, n in plan_chunks(n_samples, chunk):
            part = render_block(
                self.scene,
                self.cam,
                np.int32(row0),
                np.uint32(s0 + off),
                np.uint32(self.seed),
                img_w=self.width,
                img_h=self.height,
                n_rows=n_rows,
                n_samples=n,
                root=self.root,
                max_depth=self.max_depth,
                isect=self.isect,
                with_stats=with_stats,
                lights=self.lights,
                physical=self.physical,
            )
            acc = part if acc is None else acc + part
        return acc

    def render_rows(self, row0: int, n_rows: int) -> np.ndarray:
        """Final (averaged, tone-mapped) pixels for rows [row0, row0+n_rows)."""
        acc = self.render_rows_sum(row0, n_rows)
        img = finalize(acc, root=self.root)
        return np.asarray(jax.device_get(img))

    def render_image(self, rows_per_band: Optional[int] = None) -> np.ndarray:
        """Render the full frame (convenience; jobs go through the manager)."""
        rows_per_band = rows_per_band or min(self.height, 64)
        out = np.zeros((self.height, self.width, 3), np.float32)
        r = 0
        while r < self.height:
            n = min(rows_per_band, self.height - r)
            out[r : r + n] = self.render_rows(r, n)
            r += n
        return out
