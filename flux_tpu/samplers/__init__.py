"""flux_tpu.samplers — deterministic, counter-based stratified sampling.

TPU-native rebuild of the reference ``samplers`` crate
(samplers/src/lib.rs): stratified unit-square patterns (regular / jittered /
multi-jittered / correlated multi-jittered), hemisphere and concentric-disc
warps, and the hashing primitives that replace stateful RNG with pure
functions of (index, pattern).
"""

from .grids import (
    Sampler,
    grid_correlated_multi_jittered,
    grid_jittered,
    grid_multi_jittered,
    grid_regular,
)
from .hash import hash_combine, mix, next_pow2, permute_pow2, randfloat
from .patterns import cmj_point, jittered_point, mj_point, point, regular_point
from .warps import to_hemisphere, to_poisson_disc, to_unit_hemi

__all__ = [
    "Sampler",
    "grid_regular",
    "grid_jittered",
    "grid_multi_jittered",
    "grid_correlated_multi_jittered",
    "hash_combine",
    "mix",
    "next_pow2",
    "permute_pow2",
    "randfloat",
    "regular_point",
    "jittered_point",
    "mj_point",
    "cmj_point",
    "point",
    "to_unit_hemi",
    "to_hemisphere",
    "to_poisson_disc",
]
