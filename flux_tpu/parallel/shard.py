"""Cooperative multi-chip rendering via ``shard_map`` — the flux-node
replacement for chips that share a mesh.

The reference distributes one frame across machines by streaming row-band
work units over TCP with a pull queue (manager.rs:100-162, workers.rs:
105-243).  Inside a TPU slice none of that machinery is needed: this module
jits ONE program over a ('rows', 'spp') mesh in which

* every chip renders its row shard over a disjoint stratified sample range
  (counter-based sampling makes the split free — device j takes global
  sample indices [j·per_dev, (j+1)·per_dev), still one sample per stratum
  globally because the strata are indexed by the same counters),
* a ``psum`` over the 'spp' axis rides ICI to combine partial sums,
* the 'rows' axis concatenates tile shards on the way out.

Static row/sample sharding is deliberately chosen over the reference's
dynamic queue: sample sharding is perfectly balanced by construction, so
the load-balancing problem the queue solved disappears (SURVEY.md §2).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..camera import camera_arrays
from ..ops.intersect import Intersector
from ..render import finalize, render_block_impl
from ..scene import SceneData, compile_scene
from .mesh import make_mesh

__all__ = ["MeshRenderer", "sharded_unit_fn"]


def sharded_unit_fn(
    mesh: Mesh,
    *,
    img_w: int,
    img_h: int,
    n_rows_local: int,
    root: int,
    max_depth: int,
    chunk: int,
    backend: str = "xla",
    interpret: bool = False,
    accel: str = "sweep",
    physical: bool = False,
    n_samples: Optional[int] = None,
    with_stats: bool = False,
):
    """Build the jitted SPMD program that renders one work unit on ``mesh``.

    Returns ``fn(scene, cam, lights, row0, s0, seed) -> (n_rows_local *
    rows_shards, img_w, C)`` radiance sums over the ``n_samples`` global
    sample indices starting at the traced ``s0`` (default: all root², i.e.
    ``s0=0``), in SHARD order — block ri holds shard ri's strided rows
    (row0 + ri + k·rows_shards); callers de-interleave (see
    ``MeshRenderer.render_rows_sum``).  ``with_stats`` appends a fourth
    channel (C=4): the per-pixel sum of squared sample luminances, the
    adaptive-sampling noise signal — summed over the 'spp' axis by the same
    psum as the radiance, which is what lets progressive/adaptive/checkpoint
    rendering run on the whole mesh.  ``backend`` selects the per-device
    compute: the XLA wavefront or the Pallas megakernel
    (ops/pallas_kernel.py) — collectives are identical either way.
    """
    spp = root * root
    if n_samples is None:
        n_samples = spp
    spp_shards = mesh.shape["spp"]
    per_dev = -(-n_samples // spp_shards)  # ceil: last device masks overhang
    chunk = max(1, min(chunk, per_dev))
    n_chunks = -(-per_dev // chunk)

    rows_shards = mesh.shape["rows"]

    def device_fn(scene, cam, lights_v, row0, s0, seed):
        ri = jax.lax.axis_index("rows")
        si = jax.lax.axis_index("spp")
        # INTERLEAVED row assignment: shard ri renders rows row0 + ri,
        # row0 + ri + R, ... (R = rows_shards) instead of a contiguous
        # band. Per-row cost varies a lot (sky rows exit at depth 1 under
        # the megakernel's early exit; geometry rows run all bounces), so
        # striding decorrelates cost across shards — the static answer to
        # the reference's dynamic pull queue (SURVEY.md §7 hard parts).
        # Pixel values are assignment-independent (counter-based RNG), so
        # this is invisible outside; the caller de-interleaves the output.
        my_row0 = jnp.int32(row0) + ri.astype(jnp.int32)
        base_s0 = jnp.uint32(s0) + si.astype(jnp.uint32) * np.uint32(per_dev)
        # Mask overhang lanes: beyond this device's range (when chunking
        # overshoots per_dev) or beyond the requested range entirely (when
        # spp_shards doesn't divide n_samples).
        s_limit = jnp.minimum(
            base_s0 + np.uint32(per_dev), jnp.uint32(s0) + np.uint32(n_samples)
        )

        if backend == "pallas":
            from ..ops.intersect import scan_layout, tri_layout
            from ..ops.pallas_kernel import default_s_blk, render_block_pallas

            blocks = scan_layout(scene) if accel == "scan" else None
            tri_blocks = tri_layout(scene) if scene.num_triangles else None
            acc = render_block_pallas(
                scene,
                cam,
                my_row0,
                base_s0,
                seed,
                img_w=img_w,
                img_h=img_h,
                n_rows=n_rows_local,
                n_samples=per_dev,
                root=root,
                max_depth=max_depth,
                s_limit=s_limit,
                interpret=interpret,
                accel=accel,
                s_blk=default_s_blk(accel, scene.num_spheres, scene.num_triangles),
                lights=lights_v,
                physical=physical,
                row_stride=rows_shards,
                scan_blocks=blocks,
                tri_blocks=tri_blocks,
                with_stats=with_stats,
            )
            return jax.lax.psum(acc, "spp")

        # Build the strategy once per unit render (the scan layout's sort +
        # gathers hoist out of the chunk loop).
        if accel in ("scan", "scan_carry"):
            from ..ops.intersect import scan_layout

            isect = Intersector(mode=accel, layout=scan_layout(scene))
        else:
            isect = Intersector(mode=accel)

        def body(i, acc):
            s0 = base_s0 + i.astype(jnp.uint32) * np.uint32(chunk)
            part = render_block_impl(
                scene,
                cam,
                my_row0,
                s0,
                seed,
                img_w=img_w,
                img_h=img_h,
                n_rows=n_rows_local,
                n_samples=chunk,
                root=root,
                max_depth=max_depth,
                pvary_axes=("rows", "spp"),
                s_limit=s_limit,
                isect=isect,
                lights=lights_v,
                physical=physical,
                row_stride=rows_shards,
                with_stats=with_stats,
            )
            return acc + part

        acc0 = jax.lax.pcast(
            jnp.zeros((n_rows_local, img_w, 4 if with_stats else 3), jnp.float32),
            ("rows", "spp"),
            to="varying",
        )
        acc = jax.lax.fori_loop(0, n_chunks, body, acc0)
        # Combine sample shards over ICI; 'rows' shards concatenate via the
        # out_spec.
        return jax.lax.psum(acc, "spp")

    fn = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=P("rows", None, None),
        # The varying-axes checker cannot yet see through pallas_call's
        # kernel trace (refs vs replicated index constants), so it is
        # disabled for the megakernel backend; correctness is pinned by the
        # sharding-parity tests instead.
        check_vma=(backend != "pallas"),
    )
    return jax.jit(fn)


class MeshRenderer:
    """Drop-in Renderer that shards one work unit across a device mesh.

    Work units keep the reference's row-band shape (job.rs:66-88); inside a
    unit the mesh renders cooperatively. Presents the same ``render_rows`` /
    ``render_rows_sum`` surface as :class:`flux_tpu.render.Renderer`, so
    workers and the manager don't care which one they drive.
    """

    def __init__(
        self,
        scene_data: SceneData,
        sample_root: int,
        max_depth: int,
        seed: int = 0,
        mesh: Optional[Mesh] = None,
        rows_shards: Optional[int] = None,
        target_lanes: int = 32 << 20,
        backend: Optional[str] = None,
        interpret: bool = False,
        accel: Optional[str] = None,
        nee: bool = False,
        physical: bool = False,
    ):
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
        # rows_shards=None auto-picks the mesh shape from the frame size
        # (spp-only at demo scale; 'rows' engages on memory-bound frames —
        # parallel/mesh.py pick_mesh_shape).
        self.mesh = (
            mesh
            if mesh is not None
            else make_mesh(
                rows_shards=rows_shards,
                n_rows_hint=self.height,
                n_cols_hint=self.width,
            )
        )
        self.target_lanes = int(target_lanes)
        if accel is None:
            from ..render import SCAN_AUTO_THRESHOLD

            accel = "scan" if self.scene.num_spheres > SCAN_AUTO_THRESHOLD else "sweep"
        if accel not in ("sweep", "scan"):
            raise ValueError(f"MeshRenderer supports accel 'sweep'/'scan', got {accel!r}")
        self.accel = accel
        self.lights = None
        if nee:
            from ..ops.nee import extract_lights

            self.lights = extract_lights(scene_data)
        self.nee = self.lights is not None
        self.physical = bool(physical)
        if backend is None:
            # Same auto-select as Renderer: the megakernel (which includes
            # the blocked triangle fold and NEE over sphere AND triangle
            # lights) on real TPU, XLA elsewhere.
            on_tpu = jax.default_backend() == "tpu"
            backend = "pallas" if on_tpu else "xla"
        self.backend = backend
        self.interpret = bool(interpret)
        self._fns = {}

    def _unit_fn(self, n_rows_total: int, n_samples: Optional[int] = None,
                 with_stats: bool = False):
        rows_shards = self.mesh.shape["rows"]
        n_local = -(-n_rows_total // rows_shards)
        if n_samples == self.root * self.root:
            n_samples = None  # same compiled program as the full render
        key = (n_local, n_samples, with_stats)
        if key not in self._fns:
            per_sample_lanes = n_local * self.width
            chunk = max(1, self.target_lanes // max(per_sample_lanes, 1))
            self._fns[key] = (
                sharded_unit_fn(
                    self.mesh,
                    img_w=self.width,
                    img_h=self.height,
                    n_rows_local=n_local,
                    root=self.root,
                    max_depth=self.max_depth,
                    chunk=chunk,
                    backend=self.backend,
                    interpret=self.interpret,
                    accel=self.accel,
                    physical=self.physical,
                    n_samples=n_samples,
                    with_stats=with_stats,
                ),
                n_local,
            )
        return self._fns[key]

    def render_rows_sum(self, row0: int, n_rows: int):
        return self._render_sharded(row0, n_rows, 0, None, False)

    def render_rows_sum_range(
        self, row0: int, n_rows: int, s0: int, n_samples: int, with_stats: bool = False
    ):
        """Radiance sum over global sample indices [s0, s0 + n_samples) for
        a row band, cooperatively across the whole mesh — the same surface
        as :meth:`flux_tpu.render.Renderer.render_rows_sum_range`, which is
        what lets :class:`~flux_tpu.checkpoint.ProgressiveRenderer` drive
        either renderer (progressive/adaptive/checkpoint on all chips)."""
        return self._render_sharded(row0, n_rows, s0, int(n_samples), with_stats)

    def _render_sharded(self, row0, n_rows, s0, n_samples, with_stats):
        fn, n_local = self._unit_fn(n_rows, n_samples, with_stats)
        out = fn(
            self.scene, self.cam, self.lights, np.int32(row0), np.uint32(s0),
            np.uint32(self.seed),
        )
        # De-interleave the strided row assignment: the out_spec stacks
        # shard blocks [ri, k] whose global row is row0 + ri + k·R; a
        # (R, n_local) transpose restores image order. Then crop the
        # padding rows from uneven 'rows' shards.
        R = self.mesh.shape["rows"]
        out = out.reshape(R, n_local, *out.shape[1:]).swapaxes(0, 1)
        out = out.reshape(R * n_local, *out.shape[2:])
        return out[:n_rows]

    def render_rows(self, row0: int, n_rows: int) -> np.ndarray:
        acc = self.render_rows_sum(row0, n_rows)
        img = finalize(acc, root=self.root)
        return np.asarray(jax.device_get(img))

    def render_rows_local(self, row0: int, n_rows: int):
        """Cooperative mesh render returning only THIS process's rows.

        The multi-host form of :meth:`render_rows`: under
        ``jax.distributed`` each process addresses only its own 'rows'
        shards, so ``device_get`` of the full frame is impossible on
        rows-sharded meshes. Returns ``(global_rows, pixels)`` — the
        global row indices this process rendered (interleaved stride =
        rows_shards) and their finalized pixels — for a master to
        assemble, which is the true DCN analog of flux-node streaming row
        bands back over TCP (workers.rs:105-243)."""
        fn, n_local = self._unit_fn(n_rows)
        out = fn(
            self.scene, self.cam, self.lights, np.int32(row0), np.uint32(0),
            np.uint32(self.seed),
        )
        R = self.mesh.shape["rows"]
        inv = np.float32(1.0 / (self.root * self.root))
        rows_idx = []
        pixels = []
        seen = set()
        for sh in out.addressable_shards:
            start = sh.index[0].start or 0
            ri = start // n_local
            if ri in seen:  # spp-axis replicas hold identical rows
                continue
            seen.add(ri)
            acc = np.asarray(sh.data)  # (n_local, W, 3) radiance sums
            # finalize() in numpy (identical elementwise IEEE ops): average
            # then max_to_one (trace.rs:85-87 / color.rs:35-44).
            img = acc * inv
            m = img.max(axis=-1, keepdims=True)
            # Reciprocal-multiply, NOT img/m: max_to_one (color.py:29-31)
            # computes img * (1/m), and f32 x/m vs x*(1/m) can differ by an
            # ulp — the interchange contract with finalize() is bit-exact.
            scale = np.where(m > 1.0, np.float32(1.0) / m, np.float32(1.0))
            img = (img * scale).astype(np.float32)
            grows = row0 + ri + np.arange(n_local, dtype=np.int64) * R
            keep = grows < row0 + n_rows  # crop uneven-shard padding rows
            rows_idx.append(grows[keep])
            pixels.append(img[keep])
        if not rows_idx:
            return np.zeros((0,), np.int64), np.zeros((0, self.width, 3), np.float32)
        return np.concatenate(rows_idx), np.concatenate(pixels)

    def render_image(self, rows_per_band: Optional[int] = None) -> np.ndarray:
        rows_per_band = rows_per_band or min(self.height, 64)
        out = np.zeros((self.height, self.width, 3), np.float32)
        r = 0
        while r < self.height:
            n = min(rows_per_band, self.height - r)
            out[r : r + n] = self.render_rows(r, n)
            r += n
        return out
