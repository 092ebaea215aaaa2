"""Row-oriented image accumulator and writers (PPM / PNG).

Analog of the reference's ``Image`` (fluxcore/src/image.rs): rows may arrive
in any order from the work-unit stream; missing rows are written as black
(image.rs:55-59).  The PPM writer produces the same 16-bit ASCII P3 format
with the same ``value * 65535.99`` truncating quantization (image.rs:46-53).
PNG output (via Pillow, 8-bit) is an added convenience the reference gets by
hand-converting its PPMs.
"""

from __future__ import annotations

import io
import numpy as np

__all__ = ["Image", "ppm_bytes", "write_ppm", "write_png"]


class Image:
    """Mutable row-store: height × width × RGB float in [0, 1]."""

    def __init__(self, width: int, height: int):
        self.width = int(width)
        self.height = int(height)
        self.pixels = np.zeros((self.height, self.width, 3), np.float32)
        self._filled = np.zeros(self.height, bool)

    def set_row(self, row_index: int, values: np.ndarray) -> None:
        values = np.asarray(values, np.float32)
        if values.shape != (self.width, 3):
            raise ValueError(f"row shape {values.shape} != ({self.width}, 3)")
        self.pixels[row_index] = values
        self._filled[row_index] = True

    def set_rows(self, row_start: int, values: np.ndarray) -> None:
        values = np.asarray(values, np.float32)
        # Enforce the same contract as set_row: a malformed network frame
        # must fail loudly here, not as a broadcast error (or a silent
        # partial write) inside the ImageBuilder thread.
        if values.ndim != 3 or values.shape[1:] != (self.width, 3):
            raise ValueError(
                f"rows shape {values.shape} != (n, {self.width}, 3)"
            )
        n = values.shape[0]
        if row_start < 0 or row_start + n > self.height:
            raise ValueError(
                f"rows [{row_start}, {row_start + n}) outside image "
                f"height {self.height}"
            )
        self.pixels[row_start : row_start + n] = values
        self._filled[row_start : row_start + n] = True

    def set_pixel(self, row_index: int, col_index: int, value) -> None:
        self.pixels[row_index, col_index] = np.asarray(value, np.float32)
        self._filled[row_index] = True

    @property
    def filled_rows(self) -> np.ndarray:
        return self._filled.copy()

    def complete(self) -> bool:
        return bool(self._filled.all())


def ppm_bytes(pixels: np.ndarray) -> bytes:
    """Encode (H, W, 3) floats as 16-bit ASCII PPM (P3), one pixel per line
    — byte-compatible with the reference writer (image.rs:43-61).

    Uses the native C++ encoder when available (~100× faster on full
    frames); this pure-Python path is the behavioral reference."""
    from .native import ppm_encode_native

    native = ppm_encode_native(np.asarray(pixels, np.float32))
    if native is not None:
        return native
    h, w = pixels.shape[:2]
    q = (np.asarray(pixels, np.float64) * 65535.99).astype(np.uint16)
    buf = io.StringIO()
    buf.write(f"P3\n{w} {h}\n65535\n")
    flat = q.reshape(-1, 3)
    # np.savetxt is pathologically slow; manual join is ~10x faster.
    lines = "\n".join(f"{r} {g} {b}" for r, g, b in flat)
    buf.write(lines)
    buf.write("\n")
    return buf.getvalue().encode()


def _ensure_parent(path: str) -> None:
    """Create the destination directory if missing — `--output-dir` names a
    directory that need not pre-exist; failing at the END of a long render
    with FileNotFoundError is the worst possible time."""
    import os

    parent = os.path.dirname(os.path.abspath(path))
    if parent:
        os.makedirs(parent, exist_ok=True)


def write_ppm(path: str, img: "Image | np.ndarray") -> None:
    pixels = img.pixels if isinstance(img, Image) else np.asarray(img)
    _ensure_parent(path)
    with open(path, "wb") as f:
        f.write(ppm_bytes(pixels))


def write_png(path: str, img: "Image | np.ndarray") -> None:
    from PIL import Image as PILImage

    pixels = img.pixels if isinstance(img, Image) else np.asarray(img)
    _ensure_parent(path)
    arr8 = (np.clip(pixels, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    PILImage.fromarray(arr8, "RGB").save(path)


def read_ppm(path: str) -> np.ndarray:
    """Parse a P3 PPM back to (H, W, 3) floats (for round-trip tests)."""
    with open(path, "rb") as f:
        tokens = f.read().split()
    assert tokens[0] == b"P3", "only ASCII P3 supported"
    w, h, maxv = int(tokens[1]), int(tokens[2]), int(tokens[3])
    data = np.array(tokens[4 : 4 + w * h * 3], dtype=np.float64).reshape(h, w, 3)
    return (data / maxv).astype(np.float32)
