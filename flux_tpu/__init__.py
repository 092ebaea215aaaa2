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
from .job import Job, JobConfiguration, JobID, WorkUnit  # noqa: F401
from .render import Renderer  # noqa: F401
from .scene import SceneData, compile_scene, load_scene, loads_scene  # noqa: F401


def __getattr__(name):
    # Lazy heavyweight submodules (keep `import flux_tpu` light).
    if name in ("manager", "workers", "node", "parallel", "image", "cli"):
        import importlib

        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
