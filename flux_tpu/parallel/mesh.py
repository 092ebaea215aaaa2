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


# Per-device wavefront budget (lanes = rows × cols of one sample pass) above
# which an spp-only split is judged memory-bound and the 'rows' axis engages.
# Sized against the single-device Renderer's default target_lanes (32M —
# render.py): at or below this many lanes per sample the per-device launch
# can still chunk the sample axis down to 1 and stay inside that budget with
# generous headroom for wavefront temporaries; a taller frame would force
# sub-sample launches, which the unit renderer cannot split.
ROWS_LANE_BUDGET = 2 << 20


def pick_mesh_shape(
    n_devices: int, n_rows_hint: int = 0, n_cols_hint: int = 0
) -> Tuple[int, int]:
    """Choose (rows_shards, spp_shards) for ``n_devices``.

    Sample sharding is preferred: it is perfectly load-balanced (every chip
    renders the same pixels) where tile sharding inherits the scene's
    per-row cost variance — the imbalance the reference's dynamic pull
    queue existed to fix (manager.rs:100).  Row sharding engages
    automatically when the frame hinted by ``n_rows_hint``/``n_cols_hint``
    is memory-bound for an spp-only split: the 'rows' axis doubles until a
    device's per-sample wavefront (local rows × cols lanes) fits
    ROWS_LANE_BUDGET, or the devices run out.
    """
    rows_shards = 1
    lanes = n_rows_hint * max(n_cols_hint, 1)
    while (
        lanes // rows_shards > ROWS_LANE_BUDGET
        and rows_shards * 2 <= n_devices
        and n_devices % (rows_shards * 2) == 0
    ):
        rows_shards *= 2
    return (rows_shards, n_devices // rows_shards)


def make_mesh(
    devices: Optional[Sequence] = None,
    rows_shards: Optional[int] = 1,
    spp_shards: Optional[int] = None,
    n_rows_hint: int = 0,
    n_cols_hint: int = 0,
) -> Mesh:
    """Build a ('rows', 'spp') mesh over ``devices`` (default: all).

    ``rows_shards=None`` picks the shape automatically from the frame hints
    via :func:`pick_mesh_shape` (spp-only at demo scale; rows engage on
    memory-bound tall frames)."""
    devs = list(devices) if devices is not None else jax.devices()
    if rows_shards is None:
        rows_shards, auto_spp = pick_mesh_shape(len(devs), n_rows_hint, n_cols_hint)
        if spp_shards is None:
            spp_shards = auto_spp
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
