"""Counter-based hashing primitives for deterministic, stateless sampling.

The reference generates samples with a stateful ``IsaacRng`` seeded from the
OS entropy pool (reference: samplers/src/lib.rs:27-33), which makes every
render non-reproducible and forces it to precompute large per-worker sample
tables (fluxcore/src/sampling.rs:13-33).  On TPU the idiomatic design is the
opposite: every random number is a pure function of *where it is used* —
``hash(seed, pixel, sample_index, bounce, purpose)`` — so any lane of any
device can regenerate its sample stream with a handful of integer ops, no
tables, no state, bitwise reproducible across meshes.

The permutation / hash functions below follow Kensler, "Correlated
Multi-Jittered Sampling" (Pixar Technical Memo 13-01) — public-domain
constructions widely used for exactly this purpose.  All arithmetic is
uint32 and wraps, which XLA lowers directly to the VPU.
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "mix",
    "hash_combine",
    "randfloat",
    "permute_pow2",
    "next_pow2",
]


def _u32(x):
    return jnp.asarray(x, dtype=jnp.uint32)


def mix(x):
    """32-bit avalanche finalizer (murmur3-style). uint32 -> uint32."""
    x = _u32(x)
    x ^= x >> 16
    x *= np.uint32(0x7FEB352D)
    x ^= x >> 15
    x *= np.uint32(0x846CA68B)
    x ^= x >> 16
    return x


def hash_combine(*vals):
    """Fold any number of integer values into one well-mixed uint32.

    Used to derive per-(pixel, depth, purpose) pattern identifiers. Inputs may
    be Python ints or integer arrays (broadcast together).
    """
    acc = _u32(0x9E3779B9)
    for v in vals:
        acc = mix(acc ^ (_u32(v) + np.uint32(0x9E3779B9) + (acc << 6) + (acc >> 2)))
    return acc


def randfloat(i, p):
    """Hash (index, pattern) to a float32 uniform in [0, 1).

    One murmur3-style avalanche finalizer over ``index ^ pattern`` — the
    standard stateless-RNG construction (the same :func:`mix` family the
    pattern-id derivation uses). This replaced the longer Kensler-memo
    xor-shift chain (10 rounds + a pattern-keyed multiply): randfloat is
    the single most-called full-wavefront sampler primitive (≥14 calls per
    sample at depth 5), the finalizer's avalanche quality is as good, and
    the demo2 MSE-vs-converged check (tools/mse_check.py) is unchanged
    within run noise."""
    i = _u32(i) ^ _u32(p)
    i ^= i >> 16
    i *= np.uint32(0x7FEB352D)
    i ^= i >> 15
    i *= np.uint32(0x846CA68B)
    i ^= i >> 16
    # Scale the top 24 bits to [0, 1). Routing through int32 (always in
    # range after the shift) matters: Mosaic has no uint32->float32 cast.
    return (i >> 8).astype(jnp.int32).astype(jnp.float32) * np.float32(
        1.0 / (1 << 24)
    )


def next_pow2(n: int) -> int:
    """Smallest power of two >= n (host-side helper, static)."""
    if n <= 1:
        return 1
    return 1 << (int(n) - 1).bit_length()


def permute_pow2(i, l: int, p):
    """Pseudo-random *bijection* of [0, l) keyed by pattern ``p``.

    ``l`` must be a static power of two; the Kensler permutation network is
    then an exact bijection with no cycle-walking (no data-dependent loops —
    a hard requirement for efficient TPU lowering). Callers with non-power-
    of-two strata use :func:`flux_tpu.samplers.patterns` fallbacks instead.
    """
    assert l & (l - 1) == 0 and l > 0, "permute_pow2 requires a power-of-two domain"
    w = np.uint32(l - 1)
    i = _u32(i)
    p = _u32(p)
    i ^= p
    i *= np.uint32(0xE170893D)
    i ^= p >> 16
    i ^= (i & w) >> 4
    i ^= p >> 8
    i *= np.uint32(0x0929EB3F)
    i ^= p >> 23
    i ^= (i & w) >> 1
    i *= np.uint32(1) | (p >> 27)
    i *= np.uint32(0x6935FA69)
    i ^= (i & w) >> 11
    i *= np.uint32(0x74DCCA23)
    i ^= p >> 2
    i *= np.uint32(0x9E501CC3)
    i ^= (i & w) >> 2
    i *= np.uint32(0xC860A3DF)
    i &= w
    i ^= i >> 5
    return (i + p) & w
