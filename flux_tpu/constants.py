"""Numeric constants shared across the framework.

Mirrors the reference's constant set (fluxcore/src/constants.rs:4-6): the ray
self-intersection epsilon ``T_MIN``, ``INV_PI``, and the default worker port.
"""

import math

# Minimum ray parameter for a valid intersection (ray-epsilon). Matches the
# reference value (fluxcore/src/constants.rs:4).
T_MIN = 5e-4

INV_PI = 1.0 / math.pi

# Default TCP port for render nodes (fluxcore/src/constants.rs:6).
DEFAULT_PORT = 2000
