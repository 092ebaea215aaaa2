"""flux_tpu — a TPU-native distributed Monte Carlo path tracer.

A from-scratch rebuild of the capabilities of jtdaugherty/flux (a Rust
distributed CPU renderer) on JAX/XLA/Pallas: wavefront path tracing over
megabatches of rays, deterministic counter-based sampling, scenes compiled to
device-resident struct-of-arrays, and cooperative multi-chip rendering via
``shard_map`` over a device mesh in place of the reference's TCP worker
fabric. See SURVEY.md for the structural map of the reference.
"""

__version__ = "0.1.0"

import os as _os


def _host_fingerprint():
    """Short stable id of this host's CPU capabilities (flags + model),
    used to segregate persistent-cache entries per machine class.

    Linux reads /proc/cpuinfo (model + feature flags — the signal that
    actually varies across the TPU-host fleet). Elsewhere the best
    portable proxies are platform.processor()/machine(): coarser (two
    same-model Macs share a dir — correct; a same-arch pair with
    different ISA extensions would too), so non-Linux hosts keep a
    residual cross-host stale-AOT exposure. Fine for this project: TPU
    hosts are Linux; the fallback just keeps imports working anywhere."""
    import hashlib
    import platform as _platform

    blob = _platform.machine()
    seen = set()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                # One logical CPU is representative; take each field once.
                if key in ("flags", "model name", "Features") and key not in seen:
                    seen.add(key)
                    blob += line
    except OSError:
        # Non-Linux: no /proc/cpuinfo — fold in the processor string so at
        # least different CPU models separate.
        blob += _platform.processor()
    return hashlib.sha256(blob.encode()).hexdigest()[:12]


def _setup_compilation_cache():
    """Point every process at one persistent XLA compilation cache.

    The Pallas megakernel takes minutes to compile on a cold TPU toolchain;
    a shared on-disk cache makes every process after the first start in
    seconds. The cache *key* hashes parts of the config (e.g. the autotune
    cache dir derived from the cache path), so the configuration must be
    identical across processes — which is exactly why it lives here rather
    than in each entry point. Opt out with FLUX_TPU_NO_CACHE=1.
    """
    if _os.environ.get("FLUX_TPU_NO_CACHE"):
        return
    cache_dir = _os.environ.get("FLUX_TPU_CACHE_DIR")
    if not cache_dir:
        repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        # Segregate the cache by host CPU fingerprint. XLA's cache key does
        # NOT cover the target machine features: an AOT result compiled on
        # one host loads on another with only a stderr warning ("could lead
        # to execution errors such as SIGILL"), running codegen tuned for
        # the other machine. Besides the SIGILL hazard, mixing one
        # stale-cached program with one freshly compiled program yields two
        # differently-contracted f32 binaries whose borderline compares can
        # flip — observed as a spurious 1.4% cross-backend radiance
        # divergence (vs 0 when both sides compile on the same host) when
        # this repo directory moved machines between sessions.
        root = _os.path.join(repo, "artifacts", "xla_cache")
        cache_dir = _os.path.join(root, _host_fingerprint())
        # One-time sweep of pre-segregation entries left loose in the cache
        # root (round-4 layout change): harmless since jax now points at
        # the per-host subdir, but they include exactly the stale
        # other-host AOT binaries the segregation exists to quarantine —
        # dead disk weight a future reader could mistake for cache
        # corruption. Guarded by a marker so this is a migration, not a
        # standing rm on import (a .gitignore or concurrent tool file
        # placed there later must survive); dotfiles/docs are skipped.
        marker = _os.path.join(root, ".swept-r5")
        if _os.path.isdir(root) and not _os.path.exists(marker):
            try:
                for name in _os.listdir(root):
                    p = _os.path.join(root, name)
                    if (_os.path.isfile(p) and not name.startswith(".")
                            and not name.endswith((".md", ".txt"))):
                        _os.unlink(p)
                with open(marker, "w") as f:
                    f.write("pre-segregation loose cache files swept\n")
            except OSError:
                pass
    try:
        _os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # caching is an optimization; never block import on it


_setup_compilation_cache()

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
