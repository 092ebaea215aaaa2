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

# Purpose salts separating the independent sample streams of a pixel
# (the pixel_sets / disc_sets / hemi_sets analog, sampling.rs:12-33).
SALT_AA = 0x41415341
SALT_LENS = 0x4C454E53
SALT_BOUNCE = 0x424F554E
SALT_NEE = 0x4E454531
SALT_NEEPICK = 0x4E454532
