"""Pallas TPU megakernel: the entire render block in one kernel.

The XLA path (flux_tpu/render.py) scans over bounces, which round-trips the
~13-array path state through HBM between iterations.  This kernel runs the
whole pipeline — camera rays, counter-based sampling, every bounce, and the
per-pixel sample reduction — inside one ``pallas_call`` with all state
resident in VMEM/registers, so HBM sees only the scene constants in and one
radiance-sum block out.

Lane layout: pixels ride the 128-wide lane axis, samples the sublane axis;
each kernel instance owns a ``(S_BLK, 128)`` tile of (sample, pixel) lanes.
The grid is ``(pixel_tiles, sample_tiles)`` with the sample dimension
innermost so consecutive steps revisit the same output block and accumulate
in place (the standard Pallas accumulation pattern).  Pixel→(row, col)
mapping is precomputed host-side as tiny int arrays, avoiding in-kernel
integer division.

Everything inside reuses the same SoA ops as the XLA path —
``ops.shade.bounce``, ``samplers``, ``camera.primary_rays`` operate on
traced values of any shape — so the two backends produce *identical*
samples and differ only in scheduling.  Parity is pinned by
tests/test_pallas.py (interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..camera import CameraArrays, primary_rays
from ..constants import SALT_AA, SALT_BOUNCE, SALT_LENS, SALT_NEE, SALT_NEEPICK
from ..samplers.hash import hash_combine, randfloat
from ..samplers.patterns import bounce_point, cmj_point
from ..samplers.warps import to_poisson_disc
from ..scene import SceneArrays
from ..vec import Vec3
from .shade import PathState, bounce

__all__ = ["render_block_pallas"]

LANES = 128  # pixel axis
S_BLK = 64  # default samples per kernel instance (sublane axis)

# Two-level AABB skip: blocks per superblock, and the block count below
# which the second level cannot pay for its own tests. At N spheres the
# single-level skip spends N/SCAN_BLOCK AABB tests per fold even when
# almost everything is skipped; grouping SCAN_SUPER consecutive
# Morton-sorted blocks under one union AABB cuts that to
# N/(SCAN_SUPER·SCAN_BLOCK) + entered·SCAN_SUPER.
SCAN_SUPER = 8
TRI_SUPER = 8
SUPER_ENGAGE = 16  # min block count before the outer level engages

# Triangle block count below which the AABB skip is auto-DISABLED
# (tri_skip=None): with a handful of always-entered blocks (a closed
# Cornell box is the extreme — every interior ray enters every block) the
# skip's VMEM winner-carry round-trips and AABB tests are pure overhead.
# Measured on demo5 (36 tris, 3 blocks, 1024 spp): skip OFF is +20% with
# NEE (94.0 → 112.5 Msamples/s) and +7% on the pure walk; at 80+ blocks
# (mesh1280) the skip WINS (16.4 vs 12.1, round 2). Explicit True/False
# still overrides.
TRI_SKIP_ENGAGE = 8


def _superblock_pad_and_union(aabb, n_blocks, super_size):
    """((n_blocks_padded, 6) AABBs, (n_super, 6) union AABBs, pad_blocks).

    Pads the per-block AABB table to a ``super_size`` multiple with NaN
    boxes (= empty; _aabb_any_hit's scalar guard never enters them) and
    unions each group of ``super_size`` blocks nan-aware, so a group of
    only-pad blocks is itself an empty NaN box."""
    n_super = -(-n_blocks // super_size)
    padb = n_super * super_size - n_blocks
    if padb:
        aabb = jnp.concatenate(
            [aabb, jnp.full((padb, 6), np.nan, jnp.float32)]
        )
    g = aabb.reshape(n_super, super_size, 6)
    sup = jnp.concatenate(
        [jnp.nanmin(g[:, :, :3], axis=1), jnp.nanmax(g[:, :, 3:], axis=1)],
        axis=1,
    )
    return aabb, sup, padb


class _PackedCols:
    """[k, c] / [k]-indexable view over lane-packed tile segments.

    The fold functions consume per-entry SCALARS (``ctr[k, 0]``,
    ``rad[k]`` — k static in the unrolled block loop), so nothing needs
    the (BLOCK, 3) array shape; this view resolves each access to ONE
    static-lane element extract from the loaded (3, 128) tile, instead of
    first materializing stacked (BLOCK, 3) arrays (a cross-lane data
    movement Mosaic pays real shuffles for — measured ~7% on the
    512-sphere scan)."""

    def __init__(self, blk, segs, dtype=None):
        self._blk = blk
        self._segs = segs  # (row, lane_offset) per column
        self._dtype = dtype  # int fields ride packed as f32; cast per access

    def __getitem__(self, idx):
        if isinstance(idx, tuple):
            k, c = idx
        else:
            k, c = idx, 0
        r, off = self._segs[c]
        v = self._blk[r, off + k]
        return v if self._dtype is None else v.astype(self._dtype)


def default_s_blk(accel: str, num_spheres: int, num_triangles: int = 0) -> int:
    """Samples-per-tile heuristic. Smaller tiles buy nothing on the fused
    sweep (measured: 32/64/128 within noise on demo2) but make the blocked
    skips much finer-grained — fewer lanes per any-reduce means more
    whole-block skips. Measured optima: 512 spheres → 32, 4096 → 16;
    triangle folds → 16 (a triangle test costs ~3× a sphere test, so the
    finer skip pays sooner: 16.4 vs 12.1 Msamples/s at 1280 triangles,
    with 8 already over the small-tile overhead cliff at 13.5).
    Tiny meshes (< 256 triangles) keep the full tile — too few blocks for
    the skip to pay for the smaller-tile overhead."""
    cands = [S_BLK]
    if accel == "scan":
        cands.append(32 if num_spheres <= 2048 else 16)
    if num_triangles >= 256:
        cands.append(16)
    return min(cands)


def _kernel(
    # SMEM scalars
    scalars_ref,  # (1, 4) int32: row0 (unused in-kernel), s0, seed, s_limit
    cam_scalars_ref,  # (1, 4) f32: focal, lens_radius, vp_factor, adj_pixel
    # VMEM blocks
    rowcol_ref,  # (2, LANES) int32 block: absolute row / col per pixel lane
    sphere_c_ref,  # (Ns, 3) f32
    sphere_r_ref,  # (Ns, 1) f32
    sphere_i_ref,  # (Ns, 1) f32
    plane_p_ref,  # (Np, 3) f32
    plane_n_ref,  # (Np, 3) f32
    mat_kind_ref,  # (N, 1) int32
    mat_color_ref,  # (N, 3) f32
    mat_param_ref,  # (N, 1) f32
    mat_exp_ref,  # (N, 1) f32
    bg_ref,  # (1, 3) f32
    cam_vecs_ref,  # (4, 3) f32: eye, u, v, w
    light_c_ref,  # (L, 3) f32 NEE light centers (dummy (1,3) when nee off)
    light_r_ref,  # (L, 1) f32 radii
    light_e_ref,  # (L, 3) f32 emission (color x power)
    light_i_ref,  # (L, 1) i32 sphere shape index
    light_p_ref,  # (L, 1) f32 power-proportional pick probability
    light_cdf_ref,  # (L, 1) f32 exclusive prefix sum of pick
    light_it_ref,  # (L, 1) f32 0/1: row is a triangle light (dummy w/o tris)
    light_tv0_ref,  # (L, 3) f32 triangle-light v0 (zeros on sphere rows)
    light_te1_ref,  # (L, 3) f32 v1 - v0
    light_te2_ref,  # (L, 3) f32 v2 - v0
    light_tn_ref,  # (L, 3) f32 unit authored normal
    light_ta_ref,  # (L, 1) f32 triangle area
    sphere_tbl_ref,  # (n_blocks, 3, 128) f32 LANE-PACKED scan blocks (see
    #   _pack_scan_blocks: VMEM pads the last axis of every ref to 128
    #   lanes, so per-sphere (N, 1)/(N, 3) refs cost 128×/43× their true
    #   bytes — the hidden VMEM ceiling that OOM'd at 65k spheres. The
    #   packed rows cost exactly their data.)  Dummy (1, 3, 128) in sweep.
    aabb_ref,  # (n_blocks·6,) f32 SMEM per-block AABBs, flat (scan mode)
    super_aabb_ref,  # (n_super·6,) f32 SMEM per-SUPERBLOCK unions, flat
    tri_tbl_ref,  # (n_tri_blocks, 3, 128) f32 lane-packed triangle blocks
    #   (_pack_tri_blocks); dummy (1, 3, 128) for triangle-free scenes.
    tri_aabb_ref,  # (n_tri_blocks·6,) f32 SMEM per-block AABBs, flat
    tri_super_aabb_ref,  # (n_tri_super·6,) f32 SMEM per-superblock unions
    out_ref,  # (8, LANES) f32 block; rows 0..2 = rgb sums
    *scratch,  # [st_ref if early_exit True | alive_ref if "cond"+skip][scan_ref][tri_ref]
    img_w: int,
    img_h: int,
    root: int,
    max_depth: int,
    s_blk: int,
    accel: str,
    with_stats: bool,
    nee: bool,
    physical: bool,
    early_exit,  # True (scratch form) | "cond" (register form) | False
    scan_skip: bool,
    tri: bool,
    tri_skip: bool,
    unit_d: bool,
    light_kinds: tuple,
    scan_super: bool,
    tri_super: bool,
    ns_base,  # scan mode: shape-numbering sphere count (refs hold dummies)
    mat_row0,  # scan mode: material row where plane rows start (= 1)
    tri_base: int,  # triangle shape-index base (ns_base|Ns + planes)
):
    j = pl.program_id(1)
    si = 0
    st_ref = None
    alive_ref = None
    if early_exit is True:
        st_ref = scratch[si]
        si += 1
    elif early_exit == "cond" and (scan_skip or (tri and tri_skip)):
        # Register-carried early exit still needs the alive mask visible to
        # the block-skip folds (they only see (scene, o, d)); one VMEM row,
        # refreshed at the top of every bounce, stands in for st_ref[12].
        alive_ref = scratch[si]
        si += 1
    scan_ref = None
    if scan_skip:
        scan_ref = scratch[si]
        si += 1
    tri_ref = scratch[si] if (tri and tri_skip) else None

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    s0 = scalars_ref[0, 1].astype(jnp.uint32)
    seed = scalars_ref[0, 2].astype(jnp.uint32)
    s_limit = scalars_ref[0, 3].astype(jnp.uint32)

    # Rebuild the pytree views the shared ops expect (loads are tiny).
    scene = SceneArrays(
        unit_d=unit_d,
        sphere_center=sphere_c_ref[...],
        sphere_radius=sphere_r_ref[:, 0],
        sphere_invert=sphere_i_ref[:, 0],
        plane_point=plane_p_ref[...],
        plane_normal=plane_n_ref[...],
        mat_kind=mat_kind_ref[:, 0],
        mat_color=mat_color_ref[...],
        mat_param=mat_param_ref[:, 0],
        mat_exp=mat_exp_ref[:, 0],
        background=bg_ref[0, :],
    )
    cam = CameraArrays(
        eye=cam_vecs_ref[0, :],
        u=cam_vecs_ref[1, :],
        v=cam_vecs_ref[2, :],
        w=cam_vecs_ref[3, :],
        focal_distance=cam_scalars_ref[0, 0],
        lens_radius=cam_scalars_ref[0, 1],
        vp_factor=cam_scalars_ref[0, 2],
        adjusted_pixel_size=cam_scalars_ref[0, 3],
    )

    # Lane coordinates. Pixel-only values stay (1, LANES): Mosaic pads the
    # sublane axis of a (1, 128) op to one (8, 128) vreg, so hashing the
    # per-pixel pattern ids at this shape costs s_blk/8 times less than at
    # full tile shape — they broadcast up only where a sample-dependent
    # value enters (inside randfloat/permute).
    row = rowcol_ref[0, :][None, :]
    col = rowcol_ref[1, :][None, :]
    s_idx = (
        s0
        + j.astype(jnp.uint32) * np.uint32(s_blk)
        + jax.lax.broadcasted_iota(jnp.uint32, (s_blk, LANES), 0)
    )

    pixel_base = hash_combine(seed, row, col)
    ax, ay = cmj_point(s_idx, root, hash_combine(pixel_base, SALT_AA))
    ux, uy = cmj_point(s_idx, root, hash_combine(pixel_base, SALT_LENS))
    lx, ly = to_poisson_disc(ux, uy)

    o, d = primary_rays(cam, row, col, img_w, img_h, ax, ay, lx, ly)
    shape = (s_blk, LANES)
    ones = jnp.ones(shape, jnp.float32)
    zeros = jnp.zeros(shape, jnp.float32)
    state = PathState(
        o=o,
        d=d,
        throughput=Vec3(ones, ones, ones),
        radiance=Vec3(zeros, zeros, zeros),
        alive=s_idx < s_limit,
        suppress=jnp.zeros(shape, jnp.bool_) if nee else None,
        prev_pdf=jnp.zeros(shape, jnp.float32) if nee else None,
        # −1: camera rays originate on no shape (exact self-re-hit
        # exclusion; see ops/intersect.sphere_t ``on_self``).
        prev_shape=jnp.full(shape, -1, jnp.int32),
        # MIS only: previous vertex's normal for the clipped reverse
        # light density (ops/shade.py PathState.prev_normal).
        prev_normal=(
            Vec3(zeros, zeros, zeros) if (nee and physical) else None
        ),
    )

    lights_v = None
    if nee:
        from .nee import LightArrays

        lights_v = LightArrays(
            center=light_c_ref[...],
            radius=light_r_ref[:, 0],
            emit=light_e_ref[...],
            shape_idx=light_i_ref[:, 0],
            pick=light_p_ref[:, 0],
            cdf=light_cdf_ref[:, 0],
        )
        if "tri" in light_kinds:
            # Triangle lights: same sample_light_dirs / nee_pdf_toward code
            # as the XLA path (static per-light select loops — no gathers,
            # Mosaic-clean). Their shape indices arrive pre-remapped to the
            # kernel's rebuilt numbering (see render_block_pallas).
            import dataclasses as _dc

            lights_v = _dc.replace(
                lights_v,
                is_tri=light_it_ref[:, 0],
                tri_v0=light_tv0_ref[...],
                tri_e1=light_te1_ref[...],
                tri_e2=light_te2_ref[...],
                tri_n=light_tn_ref[...],
                tri_area=light_ta_ref[:, 0],
                kinds=light_kinds,
            )

    from .intersect import Intersector, _T_MIN

    def _alive_mask():
        # Lanes alive entering the current bounce (early-exit scratch
        # holds the pre-bounce state; it is written before depth 1). The
        # register-carried ("cond") form refreshes alive_ref instead.
        if st_ref is not None:
            return st_ref[12, :, :] > 0.0
        if alive_ref is not None:
            return alive_ref[0, :, :] > 0.0
        return None

    def _aabb_any_hit(box_ref, i, o, inv_dx, inv_dy, inv_dz, need, t_cap=None,
                      cap_strict=False):
        """True iff any needed lane's ray enters box_ref[i]'s AABB (slab
        test, IEEE inf/NaN semantics as in ops/aabb.py). Shared by the
        sphere scan skip and the triangle fold skip.

        ``t_cap`` (per-lane, optional) adds front-to-back pruning: any
        candidate inside the box has t >= t0 (the slab entry), so a block
        whose t0 exceeds the lane's current winner t (or a shadow ray's
        t_max) cannot change that lane — the lane drops out of the
        any-reduce. Nearest folds pass cap_strict=False (t0 <= cap keeps
        equal-t lowest-index tie candidates); occlusion folds pass
        cap_strict=True (only t < t_max occludes).

        ``box_ref`` is a FLAT 1-D SMEM array of 6-word records: SMEM pads
        the last axis of a 2-D window to 512 bytes per row, so an (M, 6)
        table would cost M·512 B of the ~1 MB SMEM (measured OOM at 16k
        spheres); flat layout costs the true M·24 B."""
        # Same slab recipe as ops/aabb.py aabb_hit (inf/NaN handled by
        # IEEE min/max), but with t0 <= t1 (conservative for degenerate
        # flat boxes) and a hoisted per-call inverse direction.
        base = i * 6
        lox, loy, loz = box_ref[base], box_ref[base + 1], box_ref[base + 2]
        hix, hiy, hiz = box_ref[base + 3], box_ref[base + 4], box_ref[base + 5]
        tx0 = (lox - o.x) * inv_dx
        tx1 = (hix - o.x) * inv_dx
        ty0 = (loy - o.y) * inv_dy
        ty1 = (hiy - o.y) * inv_dy
        tz0 = (loz - o.z) * inv_dz
        tz1 = (hiz - o.z) * inv_dz
        t0 = jnp.maximum(
            jnp.minimum(tx0, tx1),
            jnp.maximum(jnp.minimum(ty0, ty1), jnp.minimum(tz0, tz1)),
        )
        t1 = jnp.minimum(
            jnp.maximum(tx0, tx1),
            jnp.minimum(jnp.maximum(ty0, ty1), jnp.maximum(tz0, tz1)),
        )
        # 0·inf NaN guard (origin exactly on a slab plane of an axis the
        # ray is parallel to): jnp.minimum/maximum propagate NaN, which
        # would read as a MISS here — and a false miss in the skip test
        # drops real intersections for the whole tile. Treat NaN as hit
        # so the skip stays strictly conservative.
        nan = jnp.isnan(t0) | jnp.isnan(t1)
        enter = (t0 <= t1) & (t1 > _T_MIN)
        if t_cap is not None:
            enter &= (t0 < t_cap) if cap_strict else (t0 <= t_cap)
        hit = nan | enter
        if need is not None:
            hit &= need
        # EMPTY boxes are tagged NaN by the layout builders (all-pad blocks,
        # superblock-alignment padding): a NaN box turns every lane's t0/t1
        # NaN, which the lane-NaN guard above would read as "hit". One
        # scalar test on the box itself distinguishes the two cases so
        # empty blocks are truly skipped.
        return jnp.any(hit) & jnp.logical_not(jnp.isnan(lox))

    def _skip_loop(n_blocks, box_ref, sbox_ref, super_size, o, inv_d,
                   need_fn, cap_fn, cap_strict, fold):
        """fori_loop over blocks, folding only those whose AABB some needed
        lane's ray enters. With ``sbox_ref`` (per-SUPERBLOCK union AABBs over
        ``super_size`` consecutive blocks), an outer loop skips whole groups
        first — the two-level skip that keeps AABB-test cost O(N/(S·B))
        instead of O(N/B) on large scenes. Bit-exact vs the single level:
        the super box contains its blocks' boxes and the t_cap/need only
        tighten over time, so any block a lane would enter lies in an
        entered superblock. ``need_fn``/``cap_fn`` are re-read at every test
        so occlusion masks and front-to-back caps stay current."""
        inv_dx, inv_dy, inv_dz = inv_d

        def blk(i):
            @pl.when(
                _aabb_any_hit(
                    box_ref, i, o, inv_dx, inv_dy, inv_dz, need_fn(),
                    t_cap=cap_fn(), cap_strict=cap_strict,
                )
            )
            def _f():
                fold(i)

        if sbox_ref is None:
            def body(i, carry):
                blk(i)
                return carry

            jax.lax.fori_loop(0, n_blocks, body, jnp.int32(0))
            return

        n_super = -(-n_blocks // super_size)

        def sbody(s, carry):
            @pl.when(
                _aabb_any_hit(
                    sbox_ref, s, o, inv_dx, inv_dy, inv_dz, need_fn(),
                    t_cap=cap_fn(), cap_strict=cap_strict,
                )
            )
            def _desc():
                def body(i, c2):
                    blk(s * super_size + i)
                    return c2

                jax.lax.fori_loop(0, super_size, body, jnp.int32(0))

            return carry

        jax.lax.fori_loop(0, n_super, sbody, jnp.int32(0))

    intersect_fn = Intersector(mode="sweep")
    if accel == "scan":
        # Blocked-scan intersection, in-kernel form: a fori_loop whose body
        # slices each SCAN_BLOCK of spheres straight out of the VMEM refs
        # (Mosaic's lax.scan can't carry extensive inputs, and dynamic
        # slicing is a ref operation). The packed table holds the
        # SPATIALLY-SORTED layout (ops/intersect.scan_layout): row 1 lane
        # segment 3 carries each entry's ORIGINAL sphere index (hit.shape /
        # NEE light matching), the invert/radius rides PRE-DIVIDED, mat
        # rows are pre-multiplied color×param with param 1, and aabb_ref
        # holds per-block bounds. With ``scan_skip``
        # the winner carry lives in a VMEM scratch mutated under
        # ``pl.when``: a block whose AABB no live lane's ray enters is
        # skipped entirely — the gather-free, Mosaic-friendly stand-in for
        # a BVH (tiles are 128 contiguous pixels, so rays are coherent).
        from ..ops.intersect import (
            SCAN_BLOCK,
            _T_MIN,
            _plane_occluded,
            finish_scan_carry,
            fold_occluded_block,
            fold_sphere_block,
            quad_a,
            scan_carry_init,
        )

        n_blocks = sphere_tbl_ref.shape[0]

        B = SCAN_BLOCK

        def _slice_block(i):
            """Unpack lane-packed block ``i``: ``sphere_tbl_ref[i]`` is one
            (3, 128) tile — dynamic index on the untiled leading axis, then
            scalar views over static lane segments (_PackedCols: the folds
            consume scalars, so no (BLOCK, 3) restack ever materializes).
            ints ride as f32 (exact below 2^24) straight into the folds'
            compares/selects."""
            blk = sphere_tbl_ref[i]
            ctr = _PackedCols(blk, ((0, 0), (0, B), (0, 2 * B)))
            rad = _PackedCols(blk, ((0, 3 * B),))
            inv_r_b = _PackedCols(blk, ((1, 0),))
            kind = _PackedCols(blk, ((1, B),), jnp.int32)
            exp = _PackedCols(blk, ((1, 2 * B),))
            idx = _PackedCols(blk, ((1, 3 * B),), jnp.int32)
            alb = _PackedCols(blk, ((2, 0), (2, B), (2, 2 * B)))
            return ctr, rad, inv_r_b, kind, exp, alb, idx

        def _write_carry(c):
            best_t, best_i, kind, exp, alb, ctr, inv_r = c
            vals = [
                best_t, best_i.astype(jnp.float32), kind.astype(jnp.float32),
                exp, alb.x, alb.y, alb.z, ctr.x, ctr.y, ctr.z, inv_r,
            ]
            for k, v in enumerate(vals):
                scan_ref[k, :, :] = v

        def _read_carry():
            g = lambda k: scan_ref[k, :, :]
            return (
                g(0), g(1).astype(jnp.int32), g(2).astype(jnp.int32), g(3),
                Vec3(g(4), g(5), g(6)), Vec3(g(7), g(8), g(9)), g(10),
            )

        def intersect_fn(scene_v, o, d, prev=None):
            a, inv_a = quad_a(scene_v, d)

            if scan_skip:
                need = _alive_mask()
                _write_carry(scan_carry_init(o.x))

                def _fold(i):
                    ctr, rad, inv_r_b, kind, exp, alb, idx = _slice_block(i)
                    _write_carry(
                        fold_sphere_block(
                            o, d, a, inv_a, _read_carry(),
                            ctr, rad, inv_r_b, kind, exp, alb, idx, prev=prev,
                        )
                    )

                # Front-to-back prune: scan_ref[0] is the running winner t,
                # monotonically decreasing as blocks fold.
                _skip_loop(
                    n_blocks, aabb_ref,
                    super_aabb_ref if scan_super else None, SCAN_SUPER,
                    o, (1.0 / d.x, 1.0 / d.y, 1.0 / d.z),
                    lambda: need, lambda: scan_ref[0, :, :], False, _fold,
                )
                return finish_scan_carry(
                    scene_v, o, d, _read_carry(), prev=prev,
                    ns_base=ns_base, mat_row0=mat_row0,
                )

            def body(i, carry):
                ctr, rad, inv_r_b, kind, exp, alb, idx = _slice_block(i)
                return fold_sphere_block(
                    o, d, a, inv_a, carry, ctr, rad, inv_r_b, kind, exp, alb,
                    idx, prev=prev,
                )

            carry = jax.lax.fori_loop(0, n_blocks, body, scan_carry_init(o.x))
            return finish_scan_carry(
                scene_v, o, d, carry, prev=prev, ns_base=ns_base,
                mat_row0=mat_row0,
            )

        def _occluded_fn(scene_v, o, d, t_max, exclude_idx, origin_idx=None):
            # Any-hit shadow test, in-kernel blocked form (see
            # intersect.occluded_scan — same fold, ref slices for blocks).
            # The AABB skip additionally drops blocks no not-yet-occluded
            # lane's shadow ray enters (occ carried in row 11 of the
            # scratch as f32 0/1).
            a, inv_a = quad_a(scene_v, d)

            def occ_slice(i):
                blk = sphere_tbl_ref[i]
                ctr = _PackedCols(blk, ((0, 0), (0, B), (0, 2 * B)))
                rad = _PackedCols(blk, ((0, 3 * B),))
                idx = _PackedCols(blk, ((1, 3 * B),), jnp.int32)
                return ctr, rad, idx

            if scan_skip:
                alive = _alive_mask()
                scan_ref[11, :, :] = jnp.zeros((s_blk, LANES), jnp.float32)

                def _need():
                    occ_now = scan_ref[11, :, :] > 0.0
                    return ~occ_now if alive is None else (alive & ~occ_now)

                def _fold(i):
                    ctr, rad, idx = occ_slice(i)
                    occ2 = fold_occluded_block(
                        o, d, a, inv_a, scan_ref[11, :, :] > 0.0,
                        ctr, rad, t_max, exclude_idx, idx,
                        origin_idx=origin_idx,
                    )
                    scan_ref[11, :, :] = occ2.astype(jnp.float32)

                _skip_loop(
                    n_blocks, aabb_ref,
                    super_aabb_ref if scan_super else None, SCAN_SUPER,
                    o, (1.0 / d.x, 1.0 / d.y, 1.0 / d.z),
                    _need, lambda: t_max, True, _fold,
                )
                occ = scan_ref[11, :, :] > 0.0
                return _plane_occluded(
                    scene_v, o, d, t_max, exclude_idx, occ,
                    origin_idx=origin_idx, ns_base=ns_base,
                )

            def body(i, occ_f):
                ctr, rad, idx = occ_slice(i)
                # occ rides the fori carry as f32 0/1: Mosaic cannot
                # legalize i1 vectors through scf.for (measured hard
                # compile failure on v5e; the bool<->f32 round-trip is
                # exact, same rule as the early-exit state rows).
                occ2 = fold_occluded_block(
                    o, d, a, inv_a, occ_f > 0.0, ctr, rad, t_max,
                    exclude_idx, idx, origin_idx=origin_idx,
                )
                return occ2.astype(jnp.float32)

            occ = jax.lax.fori_loop(
                0, n_blocks, body, o.x * 0.0
            ) > 0.0
            return _plane_occluded(
                scene_v, o, d, t_max, exclude_idx, occ,
                origin_idx=origin_idx, ns_base=ns_base,
            )

        intersect_fn.occluded = _occluded_fn

    if tri:
        # Triangle fold: wrap the sphere/plane strategy with the blocked
        # Morton triangle scan (ops/intersect.tri_layout). The winner carry
        # lives in VMEM scratch rows mutated under ``pl.when`` so a block
        # whose AABB no live lane's ray enters is skipped entirely — the
        # same form as the sphere block skip. Merge semantics are
        # _fold_triangles' exactly (ties keep spheres/planes; among
        # triangles the lowest original index), so radiance stays
        # bit-identical to the XLA path.
        from .intersect import (
            TRI_SCAN_BLOCK,
            fold_tri_block,
            fold_tri_occluded_block,
            merge_tri_hit,
            tri_carry_init,
        )

        n_tri_blocks = tri_tbl_ref.shape[0]
        # tri_base (static kwarg, host-computed): shape-index base for
        # triangles in the kernel's numbering (sphere numbering count +
        # plane count) — strictly above any original sphere index, so NEE
        # light matching and shadow-ray self-exclusion behave exactly as
        # in the XLA path.
        tri_base_ = np.int32(tri_base)

        TB = TRI_SCAN_BLOCK

        def _tri_slice(i):
            """Unpack lane-packed triangle block ``i``: scalar views over
            the (3, 128) tile (_PackedCols — see _slice_block)."""
            blk = tri_tbl_ref[i]
            v0 = _PackedCols(blk, ((0, 0), (0, TB), (0, 2 * TB)))
            e1 = _PackedCols(blk, ((0, 3 * TB), (0, 4 * TB), (0, 5 * TB)))
            e2 = _PackedCols(blk, ((0, 6 * TB), (0, 7 * TB), (1, 0)))
            n3 = _PackedCols(blk, ((1, TB), (1, 2 * TB), (1, 3 * TB)))
            kind = _PackedCols(blk, ((1, 4 * TB),), jnp.int32)
            exp = _PackedCols(blk, ((1, 5 * TB),))
            idx = _PackedCols(blk, ((1, 6 * TB),), jnp.int32)
            alb = _PackedCols(blk, ((2, 0), (2, TB), (2, 2 * TB)))
            return v0, e1, e2, n3, kind, exp, alb, idx

        def _tri_write(c):
            bt, bi, kind, exp, alb, n3 = c
            vals = [
                bt, bi.astype(jnp.float32), kind.astype(jnp.float32), exp,
                alb.x, alb.y, alb.z, n3.x, n3.y, n3.z,
            ]
            for k, v in enumerate(vals):
                tri_ref[k, :, :] = jnp.broadcast_to(v, (s_blk, LANES))

        def _tri_read():
            g = lambda k: tri_ref[k, :, :]
            return (
                g(0), g(1).astype(jnp.int32), g(2).astype(jnp.int32), g(3),
                Vec3(g(4), g(5), g(6)), Vec3(g(7), g(8), g(9)),
            )

        base_isect = intersect_fn
        # Bound Intersector method (sweep) or the scan closure's attribute.
        base_occluded = intersect_fn.occluded

        def _tri_isect(scene_v, o, d, prev=None):
            hit = base_isect(scene_v, o, d, prev=prev)
            # Triangle-relative self-exclusion index (negative = none).
            prev_tri = None if prev is None else prev - tri_base_
            if tri_skip:
                need = _alive_mask()
                # Seed the carry's winner t with the sphere/plane winner:
                # merge_tri_hit only takes a triangle at tr_t < hit.t
                # (strict — ties keep the incumbent), and no real triangle
                # can RECORD t == hit.t here (the fold's tie arm needs
                # idx[k] < bi = 0; real indices are >= 0), so seeding is
                # semantics-neutral — but it lets the front-to-back prune
                # below drop triangle blocks already occluded by
                # spheres/planes from the very first block.
                ci = tri_carry_init(o.x)
                _tri_write((hit.t,) + ci[1:])

                def _fold(i):
                    _tri_write(
                        fold_tri_block(
                            o, d, _tri_read(), *_tri_slice(i),
                            prev_tri=prev_tri,
                        )
                    )

                # tri_ref[0] is the running winner t (seeded above).
                _skip_loop(
                    n_tri_blocks, tri_aabb_ref,
                    tri_super_aabb_ref if tri_super else None, TRI_SUPER,
                    o, (1.0 / d.x, 1.0 / d.y, 1.0 / d.z),
                    lambda: need, lambda: tri_ref[0, :, :], False, _fold,
                )
                return merge_tri_hit(hit, o, d, _tri_read(), tri_base_)

            def body(i, carry):
                return fold_tri_block(
                    o, d, carry, *_tri_slice(i),
                    prev_tri=prev_tri,
                )

            carry = jax.lax.fori_loop(0, n_tri_blocks, body, tri_carry_init(o.x))
            return merge_tri_hit(hit, o, d, carry, tri_base_)

        def _tri_occluded(scene_v, o, d, t_max, exclude_idx, origin_idx=None):
            occ0 = base_occluded(
                scene_v, o, d, t_max, exclude_idx, origin_idx=origin_idx
            )
            if not tri_skip:
                def body(i, occ_f):
                    v0, e1, e2, n3, kind, exp, alb, idx = _tri_slice(i)
                    # f32 0/1 carry: scf.for cannot carry i1 vectors (see
                    # the sphere occlusion fold above).
                    occ2 = fold_tri_occluded_block(
                        o, d, occ_f > 0.0, v0, e1, e2, t_max, exclude_idx,
                        idx, tri_base_, origin_idx=origin_idx,
                    )
                    return occ2.astype(jnp.float32)

                return jax.lax.fori_loop(
                    0, n_tri_blocks, body, occ0.astype(jnp.float32)
                ) > 0.0
            alive = _alive_mask()
            # Row 10 carries the occlusion mask (f32 0/1); the skip drops
            # blocks no not-yet-occluded live lane's shadow ray enters.
            tri_ref[10, :, :] = jnp.broadcast_to(
                occ0.astype(jnp.float32), (s_blk, LANES)
            )

            def _need():
                occ_now = tri_ref[10, :, :] > 0.0
                return ~occ_now if alive is None else (alive & ~occ_now)

            def _fold(i):
                v0, e1, e2, n3, kind, exp, alb, idx = _tri_slice(i)
                occ2 = fold_tri_occluded_block(
                    o, d, tri_ref[10, :, :] > 0.0, v0, e1, e2,
                    t_max, exclude_idx, idx, tri_base_,
                    origin_idx=origin_idx,
                )
                tri_ref[10, :, :] = occ2.astype(jnp.float32)

            _skip_loop(
                n_tri_blocks, tri_aabb_ref,
                tri_super_aabb_ref if tri_super else None, TRI_SUPER,
                o, (1.0 / d.x, 1.0 / d.y, 1.0 / d.z),
                _need, lambda: t_max, True, _fold,
            )
            return tri_ref[10, :, :] > 0.0

        _tri_isect.occluded = _tri_occluded
        intersect_fn = _tri_isect

    def make_step(depth):
        def step(st):
            if alive_ref is not None:
                # Refresh the alive row the block-skip folds read (the
                # register-carried form has no st_ref[12]); covers the
                # s_limit padding lanes from depth 1 on.
                alive_ref[0, :, :] = jnp.broadcast_to(
                    st.alive.astype(jnp.float32), (s_blk, LANES)
                )
            pat = hash_combine(pixel_base, SALT_BOUNCE, np.uint32(depth))
            bx, by = bounce_point(s_idx, root, pat, depth)
            nee_samples = None
            if nee:
                npat = hash_combine(pixel_base, SALT_NEE, np.uint32(depth))
                ux, uy = bounce_point(s_idx, root, npat, depth)
                upick = randfloat(
                    s_idx, hash_combine(pixel_base, SALT_NEEPICK, np.uint32(depth))
                )
                nee_samples = (ux, uy, upick, depth < max_depth)
            return bounce(
                scene, st, bx, by, isect=intersect_fn,
                lights=lights_v, nee_samples=nee_samples, physical=physical,
                first_bounce=depth == 1,
            )

        return step

    if not early_exit:
        for depth in range(1, max_depth + 1):
            state = make_step(depth)(state)
    elif early_exit == "cond":
        # Register-carried whole-tile early exit: the path state stays in
        # vector registers across bounces and each depth ≥ 2 bounce runs
        # under a value-yielding lax.cond on "any lane alive". Same skipped
        # work as the scratch form below, minus its per-bounce VMEM
        # round-trip of the full state (13–15 rows each way). Round 1's
        # Mosaic crashed lowering a value-yielding cond over this many
        # vector registers (NOTES.md); the current one compiles it — but
        # only for f32 yields (an i1 vector in the carry still fails to
        # legalize), so the bool fields cross the cond as f32 0/1. The
        # bool↔f32 round-trip is exact, keeping the form bit-identical to
        # the straight-line loop (pinned in tests/test_pallas.py).
        # NOTE: _pack/_unpack and the scratch form's write_state/read_state
        # below are the two serializations of the PathState field layout —
        # when adding a PathState field, update BOTH pairs (and shade.py's
        # PathState) or the new field silently resets across bounces in
        # whichever form was missed.
        def _pack(st):
            return (
                st.o, st.d, st.throughput, st.radiance,
                st.alive.astype(jnp.float32),
                st.suppress.astype(jnp.float32) if nee else None,
                st.prev_pdf,
                # Shape indices are far below 2^24: exact as f32 (int
                # vectors crossing a Mosaic value-yielding cond are riskier
                # than f32; bools can't at all).
                st.prev_shape.astype(jnp.float32),
                st.prev_normal,  # Vec3 | None (MIS only)
            )

        def _unpack(t):
            o_, d_, tp, rd, al, sp, pp, ps, pn = t
            return PathState(
                o=o_, d=d_, throughput=tp, radiance=rd, alive=al > 0.0,
                suppress=(sp > 0.0) if nee else None, prev_pdf=pp,
                prev_shape=ps.astype(jnp.int32), prev_normal=pn,
            )

        carried = _pack(make_step(1)(state))
        for depth in range(2, max_depth + 1):
            carried = jax.lax.cond(
                jnp.any(carried[4] > 0.0),
                lambda t, depth=depth: _pack(make_step(depth)(_unpack(t))),
                lambda t: t,
                carried,
            )
        state = _unpack(carried)
    else:
        # Whole-tile early exit. A tile is (s_blk samples × 128 CONTIGUOUS
        # pixels of one row), so path death is spatially coherent: sky/env
        # tiles terminate at depth 1 and skip every remaining bounce
        # (intersection + sampling + shading) behind one scalar branch.
        # The state lives in a VMEM scratch ref mutated under ``pl.when`` —
        # a side-effecting scf.if, which Mosaic lowers fine, unlike a
        # value-yielding lax.cond over the ~100-register path state (that
        # form crashes the Mosaic compiler; see NOTES.md). Bool fields ride
        # as f32 0/1 (Mosaic VMEM has no i1 stores).

        # NOTE: this pair and the cond form's _pack/_unpack above serialize
        # the same PathState layout — keep all of them in sync when adding
        # a field (see the note at _pack).
        def write_state(st):
            vals = [
                st.o.x, st.o.y, st.o.z,
                st.d.x, st.d.y, st.d.z,
                st.throughput.x, st.throughput.y, st.throughput.z,
                st.radiance.x, st.radiance.y, st.radiance.z,
                st.alive.astype(jnp.float32),
            ]
            if nee:
                vals += [st.suppress.astype(jnp.float32), st.prev_pdf]
            # prev_shape rides as f32 (exact below 2^24; no i32 VMEM row
            # needed) AFTER the nee rows so the alive row stays at index 12;
            # MIS adds the prev_normal triple at the very end.
            vals.append(st.prev_shape.astype(jnp.float32))
            if nee and physical:
                vals += [st.prev_normal.x, st.prev_normal.y, st.prev_normal.z]
            for k, v in enumerate(vals):
                st_ref[k, :, :] = jnp.broadcast_to(v, (s_blk, LANES))

        def read_state():
            g = lambda k: st_ref[k, :, :]
            return PathState(
                o=Vec3(g(0), g(1), g(2)),
                d=Vec3(g(3), g(4), g(5)),
                throughput=Vec3(g(6), g(7), g(8)),
                radiance=Vec3(g(9), g(10), g(11)),
                alive=g(12) > 0.0,
                suppress=(g(13) > 0.0) if nee else None,
                prev_pdf=g(14) if nee else None,
                prev_shape=g(15 if nee else 13).astype(jnp.int32),
                prev_normal=(
                    Vec3(g(16), g(17), g(18)) if (nee and physical) else None
                ),
            )

        # The initial state is written first so the scan skip's alive mask
        # (st_ref[12]) is valid during the depth-1 bounce too — it then
        # also excludes the s_limit-padded lanes from block-AABB tests.
        write_state(state)
        # Depth 1 runs unconditionally (every lane starts alive).
        write_state(make_step(1)(read_state()))
        for depth in range(2, max_depth + 1):

            @pl.when(jnp.any(st_ref[12, :, :] > 0.0))
            def _step(depth=depth):
                write_state(make_step(depth)(read_state()))

        state = read_state()

    rad = state.radiance
    out_ref[0, :] += jnp.sum(rad.x, axis=0)
    out_ref[1, :] += jnp.sum(rad.y, axis=0)
    out_ref[2, :] += jnp.sum(rad.z, axis=0)
    if with_stats:
        # Row 3 of the (8, LANES) output block is free; accumulate the
        # per-sample luminance second moment for adaptive sampling.
        from ..color import luminance

        lum = luminance(rad)
        out_ref[3, :] += jnp.sum(lum * lum, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "img_w",
        "img_h",
        "n_rows",
        "n_samples",
        "root",
        "max_depth",
        "interpret",
        "s_blk",
        "vma",
        "accel",
        "with_stats",
        "physical",
        "early_exit",
        "scan_skip",
        "tri_skip",
        "row_stride",
    ),
)
def render_block_pallas(
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
    interpret: bool = False,
    s_blk: int = S_BLK,
    vma=None,
    accel: str = "sweep",
    with_stats: bool = False,
    lights=None,
    physical: bool = False,
    early_exit=True,  # True (VMEM-scratch form) | "cond" (register form) | False
    scan_skip: bool = True,
    row_stride: int = 1,
    scan_blocks=None,
    tri_blocks=None,
    tri_skip=None,  # None = auto (off below TRI_SKIP_ENGAGE blocks)
):
    """Drop-in replacement for render.render_block (same contract: radiance
    sums over sample indices [s0, s0+n_samples) for a row band).

    ``vma``: when invoked inside ``shard_map``, the tuple of mesh axis names
    the output varies over (required by the varying-axes type system)."""
    n_pix = n_rows * img_w
    pix_tiles = -(-n_pix // LANES)
    s_tiles = -(-n_samples // s_blk)
    p_pad = pix_tiles * LANES

    # Host-side pixel→(row, col) tables (avoids in-kernel integer div).
    # row_stride > 1 renders every row_stride-th row starting at row0 (the
    # sharded renderer's interleaved row assignment; see render_block_impl).
    pix = jnp.arange(p_pad, dtype=jnp.int32)
    rowcol = jnp.stack(
        [jnp.int32(row0) + (pix // img_w) * np.int32(row_stride), pix % img_w]
    )  # (2, p_pad)

    if s_limit is None:
        s_limit_v = jnp.uint32(s0) + jnp.uint32(n_samples)
    else:
        s_limit_v = jnp.uint32(s_limit)
    # Lanes also stop at the requested chunk end (S_BLK padding).
    s_limit_v = jnp.minimum(s_limit_v, jnp.uint32(s0) + jnp.uint32(n_samples))

    scalars = jnp.stack(
        [jnp.int32(row0), jnp.asarray(s0, jnp.int32), jnp.asarray(seed, jnp.int32),
         s_limit_v.astype(jnp.int32)]
    ).reshape(1, 4)
    cam_scalars = jnp.stack(
        [cam.focal_distance, cam.lens_radius, cam.vp_factor, cam.adjusted_pixel_size]
    ).reshape(1, 4).astype(jnp.float32)
    cam_vecs = jnp.stack([cam.eye, cam.u, cam.v, cam.w]).astype(jnp.float32)

    # Count padding: the kernel's rebuilt SceneArrays derives shape counts
    # from array shapes, so padding entries are *unhittable* fakes (a sphere
    # with NaN center, so every intersection comparison is false — a huge
    # finite center is NOT safe, the discriminant is a catastrophic
    # cancellation that can go garbage-positive; a plane with a zero normal
    # whose t is ±inf) plus zero material rows. Empty
    # categories get one fake; the scan path additionally pads spheres to a
    # SCAN_BLOCK multiple so the in-kernel fori_loop has no ragged tail.
    n_sph_real = scene.num_spheres
    if accel == "scan":
        from .intersect import SCAN_BLOCK, scan_layout

        # Spatially-sorted blocked layout shared with the XLA scans: the
        # sphere refs hold the SORTED order, sphere_idx maps entries back
        # to original indices (hit.shape / NEE light matching), the
        # per-block AABBs drive the whole-block skip, sphere_invert
        # carries the PRE-DIVIDED invert/radius (bit-identical to the XLA
        # fold), and sphere mat rows are pre-multiplied color×param with
        # param 1. Padding entries have NaN centers (never test valid).
        # ``scan_blocks`` (the Renderer's Intersector.layout) skips
        # rebuilding the sort per launch.
        L = scan_blocks if scan_blocks is not None else scan_layout(scene)
        target_ns = L.n_blocks * SCAN_BLOCK
        sphere_center = L.ctr.reshape(target_ns, 3)
        sphere_radius = L.rad.reshape(target_ns)
        sphere_invert = L.inv_r.reshape(target_ns)
        sphere_idx = L.idx.reshape(target_ns, 1)
        scan_aabb = jnp.concatenate([L.bmin, L.bmax], axis=1)  # (n_blocks, 6)
        sph_kind = L.kind.reshape(target_ns)
        sph_exp = L.exp.reshape(target_ns)
        sph_color = L.alb.reshape(target_ns, 3)
        sph_param = jnp.ones((target_ns,), jnp.float32)
        # Two-level skip: union AABBs over SCAN_SUPER consecutive blocks;
        # content arrays pad with unhittable NaN spheres to the superblock
        # multiple so the inner fori_loop can slice any block in a group.
        scan_super = bool(scan_skip) and L.n_blocks >= SUPER_ENGAGE
        if scan_super:
            scan_aabb, super_aabb, padb = _superblock_pad_and_union(
                scan_aabb, L.n_blocks, SCAN_SUPER
            )
            if padb:
                padn = padb * SCAN_BLOCK

                def padrows(a, fill, tail=()):
                    return jnp.concatenate(
                        [a, jnp.full((padn,) + tail, fill, a.dtype)]
                    )

                sphere_center = padrows(sphere_center, np.nan, (3,))
                sphere_radius = padrows(sphere_radius, 1.0)
                sphere_invert = padrows(sphere_invert, 1.0)
                sphere_idx = padrows(sphere_idx, -1, (1,))
                sph_kind = padrows(sph_kind, 0)
                sph_exp = padrows(sph_exp, 0.0)
                sph_color = padrows(sph_color, 0.0, (3,))
                sph_param = padrows(sph_param, 1.0)
                target_ns += padn
        else:
            super_aabb = jnp.full((1, 6), np.nan, jnp.float32)
        # LANE-PACK the per-sphere data into (n_blocks, 3, 128) tiles
        # (_slice_block unpacks): VMEM pads every ref's last axis to 128
        # lanes, so the former (N, 1)/(N, 3) refs cost 128×/43× their true
        # bytes — at 65k spheres that's ~160 MB of the chip's 128 MB VMEM
        # (measured OOM). Packed rows cost exactly their data (12.6 MB at
        # 262k spheres). Layout per block row r, lane segment k·32..k·32+31:
        #   r0: ctr.x | ctr.y | ctr.z | radius
        #   r1: inv_r | kind  | exp   | original index   (ints exact as f32)
        #   r2: alb.r | alb.g | alb.b | unused
        assert SCAN_BLOCK * 4 == LANES, "packing assumes 32-sphere blocks"
        nbf = target_ns // SCAN_BLOCK
        seg_ = lambda a: a.reshape(nbf, SCAN_BLOCK)
        alb_sc = sph_color * sph_param[:, None]
        sphere_tbl = jnp.stack(
            [
                jnp.concatenate(
                    [seg_(sphere_center[:, 0]), seg_(sphere_center[:, 1]),
                     seg_(sphere_center[:, 2]), seg_(sphere_radius)], axis=1),
                jnp.concatenate(
                    [seg_(sphere_invert),
                     seg_(sph_kind.astype(jnp.float32)), seg_(sph_exp),
                     seg_(sphere_idx[:, 0].astype(jnp.float32))], axis=1),
                jnp.concatenate(
                    [seg_(alb_sc[:, 0]), seg_(alb_sc[:, 1]), seg_(alb_sc[:, 2]),
                     jnp.zeros((nbf, SCAN_BLOCK), jnp.float32)], axis=1),
            ],
            axis=1,
        )
        # Shape numbering keeps the padded sphere count (planes/triangles
        # number above it; packed entries carry ORIGINAL sphere indices),
        # but the scene-rebuild refs shrink to one dummy row — scan mode
        # reads sphere data only through the packed table.
        ns_base = target_ns
        mat_row0 = 1
        sphere_center = jnp.full((1, 3), np.nan, jnp.float32)
        sphere_radius = jnp.ones((1,), jnp.float32)
        sphere_invert = jnp.ones((1,), jnp.float32)
        sph_kind = jnp.zeros((1,), jnp.int32)
        sph_exp = jnp.zeros((1,), jnp.float32)
        sph_color = jnp.zeros((1, 3), jnp.float32)
        sph_param = jnp.zeros((1,), jnp.float32)
    else:
        target_ns = max(n_sph_real, 1)
        sph_mats = target_ns - n_sph_real
        if sph_mats:
            sphere_center = jnp.concatenate(
                [scene.sphere_center, jnp.full((sph_mats, 3), np.nan, jnp.float32)]
            )
            sphere_radius = jnp.concatenate(
                [scene.sphere_radius, jnp.ones((sph_mats,), jnp.float32)]
            )
            sphere_invert = jnp.concatenate(
                [scene.sphere_invert, jnp.ones((sph_mats,), jnp.float32)]
            )
        else:
            sphere_center = scene.sphere_center
            sphere_radius = scene.sphere_radius
            sphere_invert = scene.sphere_invert
        scan_aabb = jnp.zeros((1, 6), jnp.float32)
        scan_super = False
        super_aabb = jnp.full((1, 6), np.nan, jnp.float32)
        sphere_tbl = jnp.zeros((1, 3, LANES), jnp.float32)  # dummy
        ns_base = None  # sweep numbering derives from the real refs
        mat_row0 = None

        def pad0(a, tail=()):
            if not sph_mats:
                return a
            return jnp.concatenate(
                [a, jnp.zeros((sph_mats,) + tail, a.dtype)], axis=0
            )

        sph_kind = pad0(scene.mat_kind[:n_sph_real])
        sph_exp = pad0(scene.mat_exp[:n_sph_real])
        sph_color = pad0(scene.mat_color[:n_sph_real], (3,))
        sph_param = pad0(scene.mat_param[:n_sph_real])
    if scene.num_planes == 0:
        plane_point = jnp.zeros((1, 3), jnp.float32)
        plane_normal = jnp.zeros((1, 3), jnp.float32)
        pl_mats = 1
    else:
        plane_point = scene.plane_point
        plane_normal = scene.plane_normal
        pl_mats = 0

    ns = sphere_center.shape[0]
    npl_ = plane_point.shape[0]
    ns_num = ns_base if ns_base is not None else ns  # shape-numbering count
    n_blocks_aabb = scan_aabb.shape[0]

    def mats(sph_rows, plane_rows, fill_shape_tail=()):
        """Sphere mat rows (already padded/ordered), then plane rows, then
        one zero row for the fake plane when the scene has none."""
        parts = [sph_rows, plane_rows]
        if pl_mats:
            parts.append(jnp.zeros((1,) + fill_shape_tail, sph_rows.dtype))
        return jnp.concatenate(parts, axis=0)

    # Plane rows only: triangle rows sit past the planes in the flat table
    # and travel separately via the TriLayout refs.
    pl_lo, pl_hi = n_sph_real, n_sph_real + scene.num_planes
    mat_kind = mats(sph_kind, scene.mat_kind[pl_lo:pl_hi])
    mat_color = mats(sph_color, scene.mat_color[pl_lo:pl_hi], (3,))
    mat_param = mats(sph_param, scene.mat_param[pl_lo:pl_hi])
    mat_exp = mats(sph_exp, scene.mat_exp[pl_lo:pl_hi])

    # Triangles: Morton-sorted TRI_SCAN_BLOCK layout (ops/intersect.py),
    # LANE-PACKED into (n_tri_blocks, 3, 128) tiles for the same VMEM
    # economics as the sphere table (_pack layout in _tri_slice: row 0 =
    # v0.xyz|e1.xyz|e2.xy, row 1 = e2.z|n.xyz|kind|exp|idx|pad, row 2 =
    # alb.rgb|pad — 8 segments of TRI_SCAN_BLOCK=16 lanes per row).
    # Dummies keep the kernel ABI fixed for triangle-free scenes.
    tri = scene.num_triangles > 0
    if tri:
        from .intersect import TRI_SCAN_BLOCK, tri_layout

        assert TRI_SCAN_BLOCK * 8 == LANES, "packing assumes 16-tri blocks"
        TL = tri_blocks if tri_blocks is not None else tri_layout(scene)
        if tri_skip is None:  # auto: see TRI_SKIP_ENGAGE
            tri_skip = TL.n_blocks >= TRI_SKIP_ENGAGE
        ntt = TL.n_blocks * TRI_SCAN_BLOCK
        tri_v0 = TL.v0.reshape(ntt, 3)
        tri_e1 = TL.e1.reshape(ntt, 3)
        tri_e2 = TL.e2.reshape(ntt, 3)
        tri_n = TL.n.reshape(ntt, 3)
        tri_kind = TL.kind.reshape(ntt)
        tri_exp = TL.exp.reshape(ntt)
        tri_alb = TL.alb.reshape(ntt, 3)
        tri_idx = TL.idx.reshape(ntt)
        tri_aabb = jnp.concatenate([TL.bmin, TL.bmax], axis=1)  # (ntb, 6)
        tri_super = bool(tri_skip) and TL.n_blocks >= SUPER_ENGAGE
        if tri_super:
            tri_aabb, tri_super_aabb, padb = _superblock_pad_and_union(
                tri_aabb, TL.n_blocks, TRI_SUPER
            )
            if padb:
                padn = padb * TRI_SCAN_BLOCK

                def padtri(a, fill, tail=()):
                    return jnp.concatenate(
                        [a, jnp.full((padn,) + tail, fill, a.dtype)]
                    )

                tri_v0 = padtri(tri_v0, np.nan, (3,))
                tri_e1 = padtri(tri_e1, 0.0, (3,))
                tri_e2 = padtri(tri_e2, 0.0, (3,))
                tri_n = padtri(tri_n, 0.0, (3,))
                tri_kind = padtri(tri_kind, 0)
                tri_exp = padtri(tri_exp, 0.0)
                tri_alb = padtri(tri_alb, 0.0, (3,))
                tri_idx = padtri(tri_idx, -1)
                ntt += padn
        else:
            tri_super_aabb = jnp.full((1, 6), np.nan, jnp.float32)
        ntb = ntt // TRI_SCAN_BLOCK
        tseg = lambda a: a.reshape(ntb, TRI_SCAN_BLOCK)
        zt = jnp.zeros((ntb, TRI_SCAN_BLOCK), jnp.float32)
        tri_tbl = jnp.stack(
            [
                jnp.concatenate(
                    [tseg(tri_v0[:, 0]), tseg(tri_v0[:, 1]), tseg(tri_v0[:, 2]),
                     tseg(tri_e1[:, 0]), tseg(tri_e1[:, 1]), tseg(tri_e1[:, 2]),
                     tseg(tri_e2[:, 0]), tseg(tri_e2[:, 1])], axis=1),
                jnp.concatenate(
                    [tseg(tri_e2[:, 2]), tseg(tri_n[:, 0]), tseg(tri_n[:, 1]),
                     tseg(tri_n[:, 2]), tseg(tri_kind.astype(jnp.float32)),
                     tseg(tri_exp), tseg(tri_idx.astype(jnp.float32)), zt],
                    axis=1),
                jnp.concatenate(
                    [tseg(tri_alb[:, 0]), tseg(tri_alb[:, 1]),
                     tseg(tri_alb[:, 2]), zt, zt, zt, zt, zt], axis=1),
            ],
            axis=1,
        )
    else:
        tri_tbl = jnp.zeros((1, 3, LANES), jnp.float32)
        tri_aabb = jnp.zeros((1, 6), jnp.float32)
        tri_super = False
        tri_super_aabb = jnp.full((1, 6), np.nan, jnp.float32)
    n_tri_blocks_aabb = tri_aabb.shape[0]
    n_super_aabb = super_aabb.shape[0]
    n_tri_super_aabb = tri_super_aabb.shape[0]

    nee = lights is not None
    light_kinds = ()
    if nee:
        light_c = lights.center
        light_r = lights.radius.reshape(-1, 1)
        light_e = lights.emit
        light_i = lights.shape_idx.reshape(-1, 1)
        light_p = lights.pick.reshape(-1, 1)
        light_cdf = lights.cdf.reshape(-1, 1)
    else:  # dummies keep the kernel ABI fixed
        light_c = jnp.zeros((1, 3), jnp.float32)
        light_r = jnp.ones((1, 1), jnp.float32)
        light_e = jnp.zeros((1, 3), jnp.float32)
        light_i = jnp.zeros((1, 1), jnp.int32)
        light_p = jnp.ones((1, 1), jnp.float32)
        light_cdf = jnp.zeros((1, 1), jnp.float32)
    if nee and lights.has_tris:
        light_kinds = lights.kinds
        light_it = lights.is_tri.reshape(-1, 1)
        light_tv0 = lights.tri_v0
        light_te1 = lights.tri_e1
        light_te2 = lights.tri_e2
        light_tn = lights.tri_n
        light_ta = lights.tri_area.reshape(-1, 1)
        # Triangle-light shape indices use the ORIGINAL numbering
        # (spheres, planes, tris — extract_lights); the kernel's rebuilt
        # scene numbers triangles from the PADDED sphere+plane count
        # (tri_base above). Remap so hit.shape matching (emission
        # suppression, MIS) and shadow-ray self-exclusion line up.
        shift = np.int32((ns_num + npl_) - (n_sph_real + scene.num_planes))
        if shift:
            light_i = jnp.where(
                light_it.astype(jnp.int32) > 0, light_i + shift, light_i
            )
    else:  # dummies keep the kernel ABI fixed
        light_it = jnp.zeros((light_c.shape[0], 1), jnp.float32)
        light_tv0 = light_te1 = light_te2 = light_tn = jnp.zeros(
            (light_c.shape[0], 3), jnp.float32
        )
        light_ta = jnp.zeros((light_c.shape[0], 1), jnp.float32)
    n_lights = light_c.shape[0]

    scan_skip = bool(scan_skip and accel == "scan")
    kern = functools.partial(
        _kernel, img_w=img_w, img_h=img_h, root=root, max_depth=max_depth,
        s_blk=s_blk, accel=accel, with_stats=with_stats, nee=nee,
        physical=physical, early_exit=early_exit, scan_skip=scan_skip,
        tri=tri, tri_skip=bool(tri and tri_skip), unit_d=scene.unit_d,
        light_kinds=light_kinds, scan_super=scan_super,
        tri_super=bool(tri and tri_super),
        ns_base=ns_base, mat_row0=mat_row0, tri_base=int(ns_num + npl_),
    )
    # 13 base + prev_shape + (nee: suppress, prev_pdf) + (MIS: prev_normal·3)
    n_state = 14 + (2 if nee else 0) + (3 if (nee and physical) else 0)
    scratch = (
        [pltpu.VMEM((n_state, s_blk, LANES), jnp.float32)]
        if early_exit is True
        else []
    )
    if early_exit == "cond" and (scan_skip or (tri and tri_skip)):
        # The register-carried form only spills the alive mask (for the
        # block-skip folds' need test), not the whole path state.
        scratch.append(pltpu.VMEM((1, s_blk, LANES), jnp.float32))
    if scan_skip:
        # 11 winner-carry rows + 1 occlusion row (see the kernel's scan
        # closures); ints ride as f32 (exact below 2^24).
        scratch.append(pltpu.VMEM((12, s_blk, LANES), jnp.float32))
    if tri and tri_skip:
        # 10 triangle winner-carry rows + 1 occlusion row (see the kernel's
        # triangle closures); ints ride as f32 (exact below 2^24). Only the
        # skip form needs the scratch (pl.when cannot yield values); the
        # unskipped fold carries registers through fori_loop.
        scratch.append(pltpu.VMEM((11, s_blk, LANES), jnp.float32))

    grid = (pix_tiles, s_tiles)
    smem = lambda shp: pl.BlockSpec(shp, lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    smem1 = lambda n: pl.BlockSpec((n,), lambda i, j: (0,), memory_space=pltpu.SMEM)
    whole = lambda shp: pl.BlockSpec(shp, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    whole3 = lambda shp: pl.BlockSpec(shp, lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM)

    # SMEM tables travel FLAT: a 2-D SMEM window pads every row to 512
    # bytes, so (M, 6) costs M·512 B of the ~1 MB SMEM — the hidden
    # ceiling that OOM'd at 16k spheres. Flat costs the true M·24 B,
    # part of what unlocks the 262k-sphere scale.
    scan_aabb = scan_aabb.reshape(-1)
    super_aabb = super_aabb.reshape(-1)
    tri_aabb = tri_aabb.reshape(-1)
    tri_super_aabb = tri_super_aabb.reshape(-1)

    def _promote(x):
        """Under shard_map all kernel operands must share the output's
        varying-axes set; promote replicated ones."""
        if not vma:
            return x
        cur = getattr(jax.typeof(x), "vma", frozenset())
        missing = tuple(a for a in vma if a not in cur)
        return jax.lax.pcast(x, missing, to="varying") if missing else x

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            smem((1, 4)),
            smem((1, 4)),
            pl.BlockSpec((2, LANES), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            whole((ns, 3)),
            whole((ns, 1)),
            whole((ns, 1)),
            whole((npl_, 3)),
            whole((npl_, 3)),
            whole((ns + npl_, 1)),
            whole((ns + npl_, 3)),
            whole((ns + npl_, 1)),
            whole((ns + npl_, 1)),
            whole((1, 3)),
            whole((4, 3)),
            whole((n_lights, 3)),
            whole((n_lights, 1)),
            whole((n_lights, 3)),
            whole((n_lights, 1)),
            whole((n_lights, 1)),
            whole((n_lights, 1)),
            whole((n_lights, 1)),
            whole((n_lights, 3)),
            whole((n_lights, 3)),
            whole((n_lights, 3)),
            whole((n_lights, 3)),
            whole((n_lights, 1)),
            whole3(sphere_tbl.shape),
            smem1(n_blocks_aabb * 6),
            smem1(n_super_aabb * 6),
            whole3(tri_tbl.shape),
            smem1(n_tri_blocks_aabb * 6),
            smem1(n_tri_super_aabb * 6),
        ],
        out_specs=pl.BlockSpec((8, LANES), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        out_shape=jax.ShapeDtypeStruct(
            (8, p_pad), jnp.float32,
            **({"vma": frozenset(vma)} if vma else {}),
        ),
        interpret=interpret,
    )(
        *map(
            _promote,
            (
                scalars,
                cam_scalars,
                rowcol,
                sphere_center,
                sphere_radius.reshape(ns, 1),
                sphere_invert.reshape(ns, 1),
                plane_point,
                plane_normal,
                mat_kind.reshape(ns + npl_, 1),
                mat_color,
                mat_param.reshape(ns + npl_, 1),
                mat_exp.reshape(ns + npl_, 1),
                scene.background.reshape(1, 3),
                cam_vecs,
                light_c,
                light_r,
                light_e,
                light_i,
                light_p,
                light_cdf,
                light_it,
                light_tv0,
                light_te1,
                light_te2,
                light_tn,
                light_ta,
                sphere_tbl,
                scan_aabb,
                super_aabb,
                tri_tbl,
                tri_aabb,
                tri_super_aabb,
            ),
        )
    )

    n_ch = 4 if with_stats else 3
    ch = out[:n_ch, :n_pix]  # (n_ch, n_pix)
    return jnp.transpose(ch).reshape(n_rows, img_w, n_ch)
