"""Whole-table sample-grid APIs and the stateful ``Sampler`` convenience class.

API parity with the reference's ``samplers`` crate surface
(samplers/src/lib.rs:22-90,184-191): every generator returns an ``(root², 2)``
array of unit-square points.  Unlike the reference — whose ``Sampler`` wraps
an OS-seeded IsaacRng, making tables irreproducible (lib.rs:27-33) — these
tables are pure functions of an explicit uint32 pattern id, so the
``sampler-debug`` visualizer and the statistical tests are deterministic.

The renderer itself never materializes tables; it calls the per-index
functions in :mod:`flux_tpu.samplers.patterns` directly.
"""

import jax
import jax.numpy as jnp

from . import patterns
from .hash import hash_combine

__all__ = [
    "grid_regular",
    "grid_jittered",
    "grid_multi_jittered",
    "grid_correlated_multi_jittered",
    "Sampler",
]


def _table(kind: str, root: int, pattern) -> jnp.ndarray:
    s = jnp.arange(root * root, dtype=jnp.uint32)
    x, y = patterns.point(kind, s, root, pattern)
    return jnp.stack([x, y], axis=-1)


def grid_regular(root: int) -> jnp.ndarray:
    """(root², 2) cell-center grid (lib.rs:184-191)."""
    return _table("regular", root, 0)


def grid_jittered(root: int, pattern=0) -> jnp.ndarray:
    """(root², 2) jittered grid (lib.rs:35-44)."""
    return _table("jittered", root, pattern)


def grid_multi_jittered(root: int, pattern=0) -> jnp.ndarray:
    """(root², 2) multi-jittered grid (lib.rs:46-73)."""
    return _table("mj", root, pattern)


def grid_correlated_multi_jittered(root: int, pattern=0) -> jnp.ndarray:
    """(root², 2) correlated multi-jittered grid (lib.rs:75-90)."""
    return _table("cmj", root, pattern)


class Sampler:
    """Deterministic stand-in for the reference's ``Sampler`` (lib.rs:22-33).

    Each call draws a fresh pattern id from a counter mixed with the seed, so
    successive tables differ (as the stateful IsaacRng's would) while the
    whole sequence stays reproducible from ``seed``.
    """

    def __init__(self, seed: int = 0):
        self.seed = int(seed)
        self._counter = 0

    def _next_pattern(self):
        p = hash_combine(self.seed, self._counter)
        self._counter += 1
        return p

    def grid_jittered(self, root: int) -> jnp.ndarray:
        return grid_jittered(root, self._next_pattern())

    def grid_multi_jittered(self, root: int) -> jnp.ndarray:
        return grid_multi_jittered(root, self._next_pattern())

    def grid_correlated_multi_jittered(self, root: int) -> jnp.ndarray:
        return grid_correlated_multi_jittered(root, self._next_pattern())
