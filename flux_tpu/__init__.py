"""flux_tpu — a TPU-native distributed Monte Carlo path tracer.

A from-scratch rebuild of the capabilities of jtdaugherty/flux (a Rust
distributed CPU renderer) on JAX/XLA/Pallas: wavefront path tracing over
megabatches of rays, deterministic counter-based sampling, scenes compiled to
device-resident struct-of-arrays, and cooperative multi-chip rendering via
``shard_map`` over a device mesh in place of the reference's TCP worker
fabric. See SURVEY.md for the structural map of the reference.
"""

__version__ = "0.1.0"

from . import constants, samplers  # noqa: F401
