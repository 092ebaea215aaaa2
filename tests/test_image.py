"""Image accumulator and PPM writer tests (format parity with image.rs)."""

import numpy as np
import pytest

from flux_tpu.image import Image, ppm_bytes, read_ppm, write_png, write_ppm


def test_ppm_format_matches_reference():
    """Header and quantization match image.rs:46-53: P3, max 65535, one
    pixel per line, truncating ``v * 65535.99``."""
    px = np.array([[[0.0, 0.5, 1.0]]], np.float32)
    data = ppm_bytes(px).decode()
    lines = data.strip().split("\n")
    assert lines[0] == "P3"
    assert lines[1] == "1 1"
    assert lines[2] == "65535"
    r, g, b = map(int, lines[3].split())
    assert r == 0
    assert g == int(0.5 * 65535.99)  # 32767 by truncation
    assert b == 65535


def test_ppm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    px = rng.random((7, 5, 3)).astype(np.float32)
    p = str(tmp_path / "x.ppm")
    write_ppm(p, px)
    back = read_ppm(p)
    assert back.shape == px.shape
    np.testing.assert_allclose(back, px, atol=1.0 / 65535)


def test_image_rows_and_completeness():
    img = Image(4, 3)
    assert not img.complete()
    img.set_rows(0, np.zeros((2, 4, 3), np.float32))
    assert not img.complete()
    img.set_row(2, np.ones((4, 3), np.float32))
    assert img.complete()
    assert img.pixels[2, 0, 0] == 1.0


def test_missing_rows_stay_black(tmp_path):
    """Unfilled rows are written as black (image.rs:55-59 padding)."""
    img = Image(2, 2)
    img.set_row(0, np.ones((2, 3), np.float32))
    p = str(tmp_path / "pad.ppm")
    write_ppm(p, img)
    back = read_ppm(p)
    assert (back[0] > 0.99).all()
    assert (back[1] == 0.0).all()


def test_set_pixel():
    img = Image(3, 2)
    img.set_pixel(1, 2, (0.25, 0.5, 0.75))
    np.testing.assert_allclose(img.pixels[1, 2], [0.25, 0.5, 0.75])


def test_row_shape_validated():
    img = Image(4, 3)
    with pytest.raises(ValueError):
        img.set_row(0, np.zeros((5, 3), np.float32))


def test_png_write(tmp_path):
    from PIL import Image as PILImage

    px = np.zeros((2, 2, 3), np.float32)
    px[0, 0] = (1.0, 0.0, 0.0)
    p = str(tmp_path / "x.png")
    write_png(p, px)
    back = np.asarray(PILImage.open(p))
    assert back.shape == (2, 2, 3)
    assert tuple(back[0, 0]) == (255, 0, 0)


def test_set_rows_validates_shape_and_bounds():
    """set_rows enforces the same contract as set_row (a malformed network
    frame must fail loudly, not broadcast-error or silently partial-write in
    the ImageBuilder thread)."""
    import pytest

    from flux_tpu.image import Image

    img = Image(8, 6)
    img.set_rows(2, np.zeros((2, 8, 3), np.float32))  # ok
    with pytest.raises(ValueError):
        img.set_rows(0, np.zeros((2, 7, 3), np.float32))  # wrong width
    with pytest.raises(ValueError):
        img.set_rows(0, np.zeros((2, 8, 4), np.float32))  # wrong channels
    with pytest.raises(ValueError):
        img.set_rows(0, np.zeros((8, 3), np.float32))  # missing rows dim
    with pytest.raises(ValueError):
        img.set_rows(5, np.zeros((2, 8, 3), np.float32))  # past the bottom
    with pytest.raises(ValueError):
        img.set_rows(-1, np.zeros((2, 8, 3), np.float32))
    # Nothing was corrupted by the rejected writes.
    assert img.filled_rows.tolist() == [False, False, True, True, False, False]
