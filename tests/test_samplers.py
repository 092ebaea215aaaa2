"""Statistical and structural tests of the sampler library.

The reference has no tests at all (SURVEY.md §4); its sampler QA is the
visual ``sampler-debug`` tool. Here we verify the stratification guarantees
each pattern claims, the warp distributions, determinism, and permutation
bijectivity.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from flux_tpu import samplers
from flux_tpu.samplers.hash import permute_pow2, randfloat


def _counts_coarse(pts, root):
    """Occupancy of the root x root coarse grid."""
    ij = np.floor(np.asarray(pts) * root).astype(int)
    ij = np.clip(ij, 0, root - 1)
    counts = np.zeros((root, root), int)
    for x, y in ij:
        counts[x, y] += 1
    return counts


def _counts_fine(vals, n):
    """Occupancy of n fine strata along one axis."""
    idx = np.clip(np.floor(np.asarray(vals) * n).astype(int), 0, n - 1)
    return np.bincount(idx, minlength=n)


@pytest.mark.parametrize("root", [4, 8, 16])
@pytest.mark.parametrize("kind", ["jittered", "mj", "cmj"])
def test_coarse_stratification(root, kind):
    fn = {
        "jittered": samplers.grid_jittered,
        "mj": samplers.grid_multi_jittered,
        "cmj": samplers.grid_correlated_multi_jittered,
    }[kind]
    pts = fn(root, pattern=123)
    assert pts.shape == (root * root, 2)
    counts = _counts_coarse(pts, root)
    assert (counts == 1).all(), f"{kind} not one-per-cell on coarse grid"


@pytest.mark.parametrize("root", [4, 8, 16])
@pytest.mark.parametrize("kind", ["mj", "cmj"])
def test_nrooks_fine_stratification(root, kind):
    fn = {
        "mj": samplers.grid_multi_jittered,
        "cmj": samplers.grid_correlated_multi_jittered,
    }[kind]
    pts = np.asarray(fn(root, pattern=7))
    n = root * root
    assert (_counts_fine(pts[:, 0], n) == 1).all(), "x projection not n-rooks"
    assert (_counts_fine(pts[:, 1], n) == 1).all(), "y projection not n-rooks"


def test_nonpow2_root_still_stratified():
    root = 5
    pts = np.asarray(samplers.grid_multi_jittered(root, pattern=3))
    counts = _counts_coarse(pts, root)
    assert (counts == 1).all()
    n = root * root
    assert (_counts_fine(pts[:, 0], n) == 1).all()
    assert (_counts_fine(pts[:, 1], n) == 1).all()


def test_regular_grid_centers():
    root = 4
    pts = np.asarray(samplers.grid_regular(root))
    expect = (np.arange(root) + 0.5) / root
    assert np.allclose(np.unique(np.round(pts[:, 0], 6)), expect)
    assert np.allclose(np.unique(np.round(pts[:, 1], 6)), expect)


def test_determinism_and_pattern_independence():
    a = samplers.grid_correlated_multi_jittered(8, pattern=1)
    b = samplers.grid_correlated_multi_jittered(8, pattern=1)
    c = samplers.grid_correlated_multi_jittered(8, pattern=2)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_permute_pow2_is_bijection():
    for l in [2, 8, 128]:
        for p in [0, 1, 0xDEADBEEF]:
            out = np.asarray(permute_pow2(jnp.arange(l, dtype=jnp.uint32), l, p))
            assert sorted(out.tolist()) == list(range(l))


def test_randfloat_range_and_mean():
    i = jnp.arange(200_000, dtype=jnp.uint32)
    u = np.asarray(randfloat(i, 42))
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 2e-3
    assert abs(u.var() - 1.0 / 12.0) < 1e-3


def test_hemisphere_warp_distribution():
    """cos(theta) = (1-y)^(1/(e+1)): for e=0, cos(theta) ~ U[0,1]."""
    root = 64
    pts = samplers.grid_multi_jittered(root, pattern=9)
    dirs = np.asarray(samplers.to_hemisphere(pts, 0.0))
    norms = np.linalg.norm(dirs, axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-5)
    assert (dirs[:, 2] >= 0).all()
    # cos(theta) uniform => mean 1/2, var 1/12
    assert abs(dirs[:, 2].mean() - 0.5) < 5e-3
    assert abs(dirs[:, 2].var() - 1 / 12) < 5e-3


def test_hemisphere_warp_high_exponent_concentrates():
    pts = samplers.grid_multi_jittered(32, pattern=5)
    dirs = np.asarray(samplers.to_hemisphere(pts, 1000.0))
    # cos^1000 lobe: almost all samples near the pole
    assert dirs[:, 2].min() > 0.9


def test_poisson_disc_in_unit_disc_and_uniform():
    root = 64
    pts = samplers.grid_correlated_multi_jittered(root, pattern=11)
    dx, dy = samplers.to_poisson_disc(pts[:, 0], pts[:, 1])
    dx, dy = np.asarray(dx), np.asarray(dy)
    r2 = dx * dx + dy * dy
    assert (r2 <= 1.0 + 1e-6).all()
    # Area-preserving map of stratified input: fraction inside r=0.5 is ~1/4
    frac = (r2 <= 0.25).mean()
    assert abs(frac - 0.25) < 0.02
    assert abs(dx.mean()) < 0.02 and abs(dy.mean()) < 0.02


def test_poisson_disc_center_origin():
    dx, dy = samplers.to_poisson_disc(jnp.array([0.5]), jnp.array([0.5]))
    assert abs(float(dx[0])) < 1e-6 and abs(float(dy[0])) < 1e-6


def test_sampler_class_sequence():
    s1 = samplers.Sampler(seed=0)
    s2 = samplers.Sampler(seed=0)
    a1, b1 = s1.grid_multi_jittered(8), s1.grid_multi_jittered(8)
    a2 = s2.grid_multi_jittered(8)
    assert np.array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.array_equal(np.asarray(a1), np.asarray(b1))
