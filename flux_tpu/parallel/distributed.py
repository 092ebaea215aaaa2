"""Multi-host initialization over DCN.

For hosts that share a TPU slice, ``jax.distributed.initialize`` +
``shard_map`` over the global mesh replace the reference's flux-node TCP
protocol entirely (SURVEY.md §5 "Distributed communication backend").
Hosts that do *not* share a slice still cooperate through the
:mod:`flux_tpu.node` daemon, which is the wire-level flux-node analog.
"""

from __future__ import annotations

import jax

__all__ = ["init_multihost"]


def init_multihost(
    coordinator_address: str = None,
    num_processes: int = None,
    process_id: int = None,
) -> None:
    """Join this host to a multi-host JAX runtime (idempotent-ish wrapper).

    With all arguments None, relies on the TPU environment's automatic
    bootstrap. After this, ``jax.devices()`` spans the slice and
    :class:`flux_tpu.parallel.MeshRenderer` shards frames globally.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
