"""Per-index stratified 2-D sample patterns (regular / jittered / MJ / CMJ).

The reference builds explicit sample tables — ``grid_regular`` /
``grid_jittered`` / ``grid_multi_jittered`` / ``grid_correlated_multi_jittered``
(samplers/src/lib.rs:35-90,184-191) — and ships per-worker copies of them
(fluxcore/src/sampling.rs:13-33).  Here each pattern is a *pure function*
``point(s, root, pattern) -> (x, y)`` of the sample index ``s`` in
``[0, root²)`` and a uint32 pattern id, evaluated in-register on the TPU VPU.
The stratification guarantees match the reference's tables:

* ``regular``    — cell centers of the root×root grid.
* ``jittered``   — one uniform point per root×root cell.
* ``mj``         — multi-jittered: root×root stratified *and* n-rooks on the
                   root² fine grid, with per-row/per-column sub-stratum
                   shuffles (the table analog is lib.rs:46-73).
* ``cmj``        — correlated multi-jittered: same, but the sub-stratum
                   shuffles are shared across rows/columns (lib.rs:75-90).

Construction (own formulation, verified by tests/test_samplers.py): sample
``s`` owns coarse cell ``(i, j) = (s % r, s // r)``; its fine x-stratum within
column ``i`` is a permutation ``pi_x(j)`` and its fine y-stratum within row
``j`` is ``pi_y(i)``.  MJ keys the permutations on the row/column index, CMJ
does not.  Exact permutations require power-of-two ``root`` (see
``hash.permute_pow2``); other roots fall back to the canonical (unshuffled)
multi-jitter arrangement, which keeps both stratification properties but is
more correlated — the same trade the reference's unshuffled base grid makes
(lib.rs:44-61).
"""

import jax.numpy as jnp
import numpy as np

from .hash import hash_combine, permute_pow2, randfloat

__all__ = ["regular_point", "jittered_point", "mj_point", "cmj_point", "point"]

# Purpose salts so that x/y jitters and permutations never collide.
_SALT_JX = 0x16A3D5C7
_SALT_JY = 0x2C9F1B4F
_SALT_PX = 0x51633E2D
_SALT_PY = 0x68BC21EB


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def _f32(u):
    """uint32 (small values) -> float32 via int32 (Mosaic-compatible)."""
    return u.astype(jnp.int32).astype(jnp.float32)


def regular_point(s, root: int, pattern=0):
    """Center of cell s of the root×root grid (lib.rs:184-191)."""
    s = jnp.asarray(s, jnp.uint32)
    r = np.float32(root)
    i = _f32(s % np.uint32(root))
    j = _f32(s // np.uint32(root))
    half = np.float32(0.5)
    return (i + half) / r, (j + half) / r


def jittered_point(s, root: int, pattern):
    """One uniform point per root×root cell (lib.rs:35-44)."""
    s = jnp.asarray(s, jnp.uint32)
    r = np.float32(root)
    i = _f32(s % np.uint32(root))
    j = _f32(s // np.uint32(root))
    jx = randfloat(s, hash_combine(pattern, _SALT_JX))
    jy = randfloat(s, hash_combine(pattern, _SALT_JY))
    return (i + jx) / r, (j + jy) / r


def _multi_jitter(s, root: int, pattern, correlated: bool):
    s = jnp.asarray(s, jnp.uint32)
    r_u = np.uint32(root)
    r_f = np.float32(root)
    i = s % r_u  # coarse column
    j = s // r_u  # coarse row

    if _is_pow2(root):
        if correlated:
            px = hash_combine(pattern, _SALT_PX)
            py = hash_combine(pattern, _SALT_PY)
        else:
            px = hash_combine(pattern, _SALT_PX, i)
            py = hash_combine(pattern, _SALT_PY, j)
        fine_x = _f32(permute_pow2(j, root, px))
        fine_y = _f32(permute_pow2(i, root, py))
    else:
        # Canonical arrangement: n-rooks by construction, no shuffle.
        fine_x = _f32(j)
        fine_y = _f32((r_u - np.uint32(1)) - i)

    jx = randfloat(s, hash_combine(pattern, _SALT_JX))
    jy = randfloat(s, hash_combine(pattern, _SALT_JY))
    x = (_f32(i) + (fine_x + jx) / r_f) / r_f
    y = (_f32(j) + (fine_y + jy) / r_f) / r_f
    return x, y


def mj_point(s, root: int, pattern):
    """Multi-jittered sample s of root² (table analog: lib.rs:46-73)."""
    return _multi_jitter(s, root, pattern, correlated=False)


def cmj_point(s, root: int, pattern):
    """Correlated multi-jittered sample s of root² (lib.rs:75-90)."""
    return _multi_jitter(s, root, pattern, correlated=True)


def bounce_point(s, root: int, pattern, depth: int):
    """Stratified 2-D sample for bounce ``depth`` (static int).

    MJ at the first bounce — where hemisphere-sample stratification shows
    up directly as visible noise — and plain jittered beyond: the same
    root×root coarse stratification, minus the n-rooks fine property and
    its two Kensler permutation networks per call, which stop paying for
    themselves once a path has scattered (demo2 MSE vs the converged
    render is unchanged within run-to-run noise; tools/mse_check.py).
    The reference stratifies every depth the same way via its per-depth
    hemi tables (sampling.rs:23-29) — depth 1 keeps that faithfully.
    """
    return mj_point(s, root, pattern) if depth <= 1 else jittered_point(s, root, pattern)


_KINDS = {
    "regular": regular_point,
    "jittered": jittered_point,
    "mj": mj_point,
    "cmj": cmj_point,
}


def point(kind: str, s, root: int, pattern):
    """Dispatch by pattern-kind name (static)."""
    return _KINDS[kind](s, root, pattern)
