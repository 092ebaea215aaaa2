"""The driver interface (__graft_entry__) must keep working: entry() is
compile-checked single-chip and dryrun_multichip() validates the full
sharded training-step analog on a virtual mesh. Regressions here are
invisible to the rest of the suite but break the build driver."""

import numpy as np
import pytest


def test_entry_returns_jittable_fn():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 800, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    # conftest already forces the 8-device CPU platform; dryrun must also
    # survive being called in such an already-initialized process.
    g.dryrun_multichip(8)


def test_dryrun_multichip_small():
    import __graft_entry__ as g

    g.dryrun_multichip(2)
