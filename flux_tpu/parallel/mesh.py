"""Device-mesh construction helpers.

The reference scales across machines with hand-rolled TCP worker processes
(flux-node); on TPU the same scaling axis is a ``jax.sharding.Mesh`` over
the slice's chips, with XLA collectives over ICI doing what the CBOR event
stream did.  The renderer uses a 2-D logical mesh:

* ``rows`` — image-space tile sharding (the work-unit/row-band axis,
  job.rs:66-88 reborn as a sharded dimension)
* ``spp``  — sample-space sharding (each chip renders the same pixels with
  a disjoint stratified sample range; a ``psum`` averages them), the axis
  the reference never had (SURVEY.md §2 parallelism table)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "pick_mesh_shape"]


def pick_mesh_shape(n_devices: int, n_rows_hint: int = 0) -> Tuple[int, int]:
    """Choose (rows_shards, spp_shards) for ``n_devices``.

    Sample sharding is preferred: it is perfectly load-balanced (every chip
    renders the same pixels) where tile sharding inherits the scene's
    per-row cost variance — the imbalance the reference's dynamic pull
    queue existed to fix (manager.rs:100).  Row sharding is engaged by
    callers that are memory-bound on very large frames.
    """
    return (1, n_devices)


def make_mesh(
    devices: Optional[Sequence] = None,
    rows_shards: int = 1,
    spp_shards: Optional[int] = None,
) -> Mesh:
    """Build a ('rows', 'spp') mesh over ``devices`` (default: all)."""
    devs = list(devices) if devices is not None else jax.devices()
    if spp_shards is None:
        spp_shards = len(devs) // rows_shards
    if rows_shards < 1 or spp_shards < 1:
        raise ValueError(
            f"mesh axes must be >= 1, got rows={rows_shards} spp={spp_shards} "
            f"over {len(devs)} devices"
        )
    n = rows_shards * spp_shards
    if n > len(devs):
        raise ValueError(
            f"mesh {rows_shards}x{spp_shards} needs {n} devices, have {len(devs)}"
        )
    grid = np.array(devs[:n]).reshape(rows_shards, spp_shards)
    return Mesh(grid, ("rows", "spp"))
