"""Native (C++) host-component tests: the ctypes PPM encoder must be
byte-identical to the pure-Python behavioral reference."""

import io

import numpy as np
import pytest

from flux_tpu import native


def python_ppm(pixels: np.ndarray) -> bytes:
    """The pure-Python encoder, inlined so the test is independent of which
    path flux_tpu.image.ppm_bytes picks."""
    h, w = pixels.shape[:2]
    q = (np.asarray(pixels, np.float64) * 65535.99).astype(np.uint16)
    buf = io.StringIO()
    buf.write(f"P3\n{w} {h}\n65535\n")
    buf.write("\n".join(f"{r} {g} {b}" for r, g, b in q.reshape(-1, 3)))
    buf.write("\n")
    return buf.getvalue().encode()


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native library unavailable (no compiler)")
    return native.get_lib()


def test_native_builds(lib):
    assert lib is not None


def test_native_matches_python(lib):
    rng = np.random.default_rng(3)
    px = rng.random((13, 7, 3)).astype(np.float32)
    assert native.ppm_encode_native(px) == python_ppm(px)


def test_native_edge_values(lib):
    px = np.array(
        [[[0.0, 1.0, 0.5], [0.9999999, 1.0000001, 0.25]]], np.float32
    )
    got = native.ppm_encode_native(px)
    assert got == python_ppm(px)
    # max channel clamps to 65535 even slightly above 1.0
    assert b"65536" not in got


def test_image_module_uses_some_encoder():
    from flux_tpu.image import ppm_bytes

    px = np.zeros((2, 2, 3), np.float32)
    data = ppm_bytes(px)
    assert data.startswith(b"P3\n2 2\n65535\n")
