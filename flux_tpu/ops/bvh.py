"""Bounding-volume hierarchy over the scene's spheres.

The reference has no acceleration structure: ``Scene::hit`` is a linear
``min_by`` over every boxed shape (fluxcore/src/scene.rs:156-160) with a
per-sphere AABB slab pretest (shapes.rs:98-133,172-175) that merely lets a
scalar CPU tracer skip the quadratic per ray. The brute-force wavefront
sweep in ops/intersect.py mirrors that and is *right* at demo scale — on
the VPU, testing a dozen spheres against every lane is cheaper than any
pointer chasing. But it's O(N) per bounce with N unrolled at trace time,
which falls over for the thousand-sphere scenes the reference could never
reach. This module is the scaling path beyond the reference:

* **Build** (host, numpy): median split on the widest centroid axis,
  leaves of <= ``leaf_size`` spheres, flattened in DFS order into plain
  arrays — no pointers, no recursion on device.
* **Traversal** (device): the classic stackless *threaded* BVH. Every node
  carries a ``miss`` link = the DFS index right after its subtree; a lane
  that hits a box descends (``ptr + 1``), a lane that misses jumps the
  whole subtree. All lanes advance in lockstep under ``lax.while_loop``
  with per-lane node pointers; node data comes in by gather (``jnp.take``),
  the one place this design pays the TPU's gather tax — bounded by
  O(log N) instead of the sweep's O(N) unrolled FLOPs.

Leaves are tested with a fixed-size unrolled loop (``leaf_size`` is a
compile-time constant), so the whole traversal is one ``while_loop`` whose
body XLA fuses into a single wavefront pass.

Planes are unbounded and rare; they stay on the linear sweep in
ops/intersect.py and are folded in after traversal.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import T_MIN
from ..scene import SceneArrays
from ..vec import Vec3
from .intersect import quad_a, sphere_t

__all__ = ["BvhArrays", "build_bvh", "sphere_hits_bvh"]

_T_MIN = np.float32(T_MIN)
_INF = np.float32(np.inf)


@dataclass(frozen=True)
class BvhArrays:
    """Flattened threaded BVH (device pytree).

    ``count == 0`` marks internal nodes. ``miss`` of the last subtree is
    ``num_nodes`` — the traversal's terminal pointer.
    """

    bmin: jnp.ndarray  # (M, 3) f32 node AABB min
    bmax: jnp.ndarray  # (M, 3) f32 node AABB max
    first: jnp.ndarray  # (M,) i32 first entry in `order` (leaves)
    count: jnp.ndarray  # (M,) i32 number of spheres (0 = internal)
    miss: jnp.ndarray  # (M,) i32 DFS skip link
    order: jnp.ndarray  # (Ns,) i32 leaf-contiguous -> original sphere index

    @property
    def num_nodes(self) -> int:
        return self.bmin.shape[0]


jax.tree_util.register_dataclass(
    BvhArrays,
    data_fields=[f.name for f in dataclasses.fields(BvhArrays)],
    meta_fields=[],
)

# Fixed leaf capacity: keeps the in-loop leaf test a static unroll.
LEAF_SIZE = 4


def build_bvh(centers: np.ndarray, radii: np.ndarray, leaf_size: int = LEAF_SIZE) -> BvhArrays:
    """Median-split BVH over spheres; returns the flattened device arrays.

    Sphere AABBs are center ± radius (the reference's Sphere bbox,
    shapes.rs:154-168). Split axis = widest centroid extent; split point =
    median, which guarantees a balanced tree of depth ceil(log2(N / leaf)).
    """
    centers = np.asarray(centers, np.float64)
    radii = np.asarray(radii, np.float64)
    n = centers.shape[0]
    if n == 0:
        raise ValueError("cannot build a BVH over zero spheres")
    lo_all = centers - radii[:, None]
    hi_all = centers + radii[:, None]

    bmin, bmax, first, count, miss = [], [], [], [], []
    order: list = []

    def emit(ids: np.ndarray) -> int:
        """Append the subtree over `ids` in DFS order; returns its root index."""
        me = len(bmin)
        bmin.append(lo_all[ids].min(axis=0))
        bmax.append(hi_all[ids].max(axis=0))
        first.append(0)
        count.append(0)
        miss.append(0)  # patched after children are emitted
        if len(ids) <= leaf_size:
            first[me] = len(order)
            count[me] = len(ids)
            order.extend(int(i) for i in ids)
        else:
            c = centers[ids]
            axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
            mid = len(ids) // 2
            part = ids[np.argsort(c[:, axis], kind="stable")]
            emit(part[:mid])
            emit(part[mid:])
        miss[me] = len(bmin)  # next DFS index after this whole subtree
        return me

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 64 + 4 * int(np.ceil(np.log2(n + 1))) * 8))
    try:
        emit(np.arange(n))
    finally:
        sys.setrecursionlimit(old_limit)

    f32 = lambda a: jnp.asarray(np.asarray(a, np.float32))
    i32 = lambda a: jnp.asarray(np.asarray(a, np.int32))
    return BvhArrays(
        bmin=f32(bmin),
        bmax=f32(bmax),
        first=i32(first),
        count=i32(count),
        miss=i32(miss),
        order=i32(order),
    )


class SphereHit(NamedTuple):
    """Per-lane nearest sphere from traversal (before plane folding)."""

    t: jnp.ndarray  # (B,) f32, inf on miss
    index: jnp.ndarray  # (B,) i32 original sphere index (0 when t == inf)


def sphere_hits_bvh(scene: SceneArrays, bvh: BvhArrays, o: Vec3, d: Vec3, prev=None) -> SphereHit:
    """Nearest sphere hit for every lane via stackless threaded traversal.
    ``prev`` is the sphere index the ray originates on (previous bounce's
    hit), whose quadratic gets the exact ``c = 0`` self-hit treatment —
    see ops/intersect.sphere_t ``on_self``."""
    m = bvh.num_nodes
    batch = o.x.shape

    a, inv_a = quad_a(scene, d)
    # Slab test uses 1/d with IEEE inf semantics (shapes.rs:104-131).
    inv_dx, inv_dy, inv_dz = 1.0 / d.x, 1.0 / d.y, 1.0 / d.z

    # Leaf `order` padded so first + LEAF_SIZE never reads out of bounds.
    order_pad = jnp.concatenate(
        [bvh.order, jnp.zeros((LEAF_SIZE,), jnp.int32)]
    )

    def body(state):
        ptr, best_t, best_i = state
        node = jnp.minimum(ptr, m - 1)  # finished lanes idle on the last node
        nb_min = jnp.take(bvh.bmin, node, axis=0)  # (B, 3)
        nb_max = jnp.take(bvh.bmax, node, axis=0)
        cnt = jnp.take(bvh.count, node, axis=0)
        fst = jnp.take(bvh.first, node, axis=0)
        mis = jnp.take(bvh.miss, node, axis=0)

        # Slab test (the BoundingBox::hit math, shapes.rs:104-131), with the
        # running best_t as the far clip: a box behind the current nearest
        # hit can be skipped outright.
        t1 = (nb_min[..., 0] - o.x) * inv_dx
        t2 = (nb_max[..., 0] - o.x) * inv_dx
        t3 = (nb_min[..., 1] - o.y) * inv_dy
        t4 = (nb_max[..., 1] - o.y) * inv_dy
        t5 = (nb_min[..., 2] - o.z) * inv_dz
        t6 = (nb_max[..., 2] - o.z) * inv_dz
        t_in = jnp.maximum(
            jnp.maximum(jnp.minimum(t1, t2), jnp.minimum(t3, t4)), jnp.minimum(t5, t6)
        )
        t_out = jnp.minimum(
            jnp.minimum(jnp.maximum(t1, t2), jnp.maximum(t3, t4)), jnp.maximum(t5, t6)
        )
        # 0·inf NaN guard (same rule as the pallas block skip): a ray with a
        # zero direction component whose origin sits exactly on a slab plane
        # yields NaN intervals, and NaN comparisons would read as a miss —
        # dropping a real hit behind the node. Treat NaN as hit so the skip
        # stays strictly conservative.
        nan_slab = jnp.isnan(t_in) | jnp.isnan(t_out)
        box_hit = nan_slab | ((t_in <= t_out) & (t_out > _T_MIN) & (t_in < best_t))

        is_leaf = cnt > 0
        # Leaf: test its (static-capacity) sphere slots against the lane.
        test = box_hit & is_leaf
        for k in range(LEAF_SIZE):
            slot_ok = test & (np.int32(k) < cnt)
            sph = jnp.take(order_pad, fst + np.int32(k), axis=0)
            ctr = jnp.take(scene.sphere_center, sph, axis=0)  # (B, 3)
            rad = jnp.take(scene.sphere_radius, sph, axis=0)
            t, valid = sphere_t(
                o, d, a, inv_a, ctr[..., 0], ctr[..., 1], ctr[..., 2], rad,
                on_self=None if prev is None else prev == sph,
            )
            good = slot_ok & valid & (t < best_t)
            best_t = jnp.where(good, t, best_t)
            best_i = jnp.where(good, sph, best_i)

        ptr = jnp.where(box_hit & ~is_leaf, ptr + 1, mis)
        # Lanes already finished must stay finished.
        ptr = jnp.where(state[0] >= m, state[0], ptr)
        return ptr, best_t, best_i

    def cond(state):
        return jnp.any(state[0] < m)

    ptr0 = jnp.zeros(batch, jnp.int32)
    t0 = jnp.full(batch, _INF, jnp.float32)
    i0 = jnp.zeros(batch, jnp.int32)
    _, best_t, best_i = jax.lax.while_loop(cond, body, (ptr0, t0, i0))
    return SphereHit(t=best_t, index=best_i)
