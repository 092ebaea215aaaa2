"""Color utilities (vectorized analog of fluxcore/src/color.rs).

The reference's ``Color`` struct with overloaded operators becomes plain
``(..., 3)`` float32 arrays; only the tone-map needs a named function.
"""

import jax.numpy as jnp

__all__ = ["max_to_one"]


def max_to_one(img: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel tone map: divide by the max channel when it exceeds 1.

    Matches ``Color::max_to_one`` (color.rs:35-44), applied after the
    sample average exactly as the reference does per pixel (trace.rs:85-87).
    """
    m = jnp.max(img, axis=-1, keepdims=True)
    scale = jnp.where(m > 1.0, 1.0 / m, 1.0)
    return img * scale
