"""Color utilities (vectorized analog of fluxcore/src/color.rs).

The reference's ``Color`` struct with overloaded operators becomes plain
``(..., 3)`` float32 arrays; only the tone-map needs a named function.
"""

import jax.numpy as jnp
import numpy as np

__all__ = ["max_to_one", "luminance"]

# Rec. 709 luma weights (noise estimation for adaptive sampling).
_LUM_R, _LUM_G, _LUM_B = np.float32(0.2126), np.float32(0.7152), np.float32(0.0722)


def luminance(rgb):
    """Luma of a Vec3 (SoA) or an (..., 3) array."""
    if hasattr(rgb, "x"):
        return _LUM_R * rgb.x + _LUM_G * rgb.y + _LUM_B * rgb.z
    return _LUM_R * rgb[..., 0] + _LUM_G * rgb[..., 1] + _LUM_B * rgb[..., 2]


def max_to_one(img: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel tone map: divide by the max channel when it exceeds 1.

    Matches ``Color::max_to_one`` (color.rs:35-44), applied after the
    sample average exactly as the reference does per pixel (trace.rs:85-87).
    """
    m = jnp.max(img, axis=-1, keepdims=True)
    scale = jnp.where(m > 1.0, 1.0 / m, 1.0)
    return img * scale
