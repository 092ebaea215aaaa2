"""In-terminal preview (flux_tpu/termview.py) — the SDL-window stand-in
(flux/src/main.rs:216-323) for headless TPU hosts."""

import io

import numpy as np

from flux_tpu.termview import TermPreview, ansi_halfblock, detect_mode


class FakeTty(io.StringIO):
    def __init__(self, tty=True):
        super().__init__()
        self._tty = tty

    def isatty(self):
        return self._tty


def grad_image(h=32, w=64):
    y = np.linspace(0, 1, h)[:, None, None]
    x = np.linspace(0, 1, w)[None, :, None]
    return np.concatenate([y + 0 * x, x + 0 * y, 0.5 + 0 * (x + y)], axis=2)


def test_detect_mode():
    assert detect_mode(FakeTty(tty=False), env={}) is None
    assert detect_mode(FakeTty(), env={"TERM": "xterm-256color"}) == "ansi"
    assert detect_mode(FakeTty(), env={"TERM": "xterm-kitty"}) == "kitty"
    assert detect_mode(FakeTty(), env={"KITTY_WINDOW_ID": "1", "TERM": "x"}) == "kitty"
    assert detect_mode(FakeTty(), env={"TERM": "dumb"}) is None


def test_ansi_halfblock_shape_and_colors():
    art = ansi_halfblock(grad_image(), max_cols=32, max_rows=8)
    lines = art.split("\n")
    # Fits the budget: every 2 image rows -> 1 text row.
    assert 1 <= len(lines) <= 8
    assert all("▀" in ln for ln in lines)
    assert "\x1b[38;2;" in art and "\x1b[48;2;" in art  # 24-bit fg+bg
    assert art.endswith("\x1b[0m")
    # Black image -> all-zero colors.
    black = ansi_halfblock(np.zeros((8, 8, 3)), max_cols=8, max_rows=4)
    assert "\x1b[38;2;0;0;0m" in black


def test_ansi_halfblock_aspect():
    # A wide image must be bounded by max_cols, a tall one by max_rows.
    wide = ansi_halfblock(grad_image(16, 256), max_cols=40, max_rows=20)
    assert max(ln.count("▀") for ln in wide.split("\n")) <= 40
    tall = ansi_halfblock(grad_image(256, 16), max_cols=40, max_rows=20)
    assert len(tall.split("\n")) <= 20


def test_term_preview_inplace_redraw():
    out = FakeTty()
    tp = TermPreview(stream=out, mode="ansi", max_cols=16, max_rows=6)
    tp.update(grad_image())
    first = out.getvalue()
    assert "▀" in first and "\x1b[" in first
    tp.update(grad_image())
    second = out.getvalue()[len(first):]
    # The second frame rewinds the cursor over the first (in-place update).
    assert second.startswith("\x1b[") and "A\r" in second[:8]


def test_term_preview_status_line_accounting():
    """A status line rides the redraw: it is drawn under the art, cleared
    to end-of-line, and counted in the cursor-up rewind so the next frame
    fully repaints over it (cli.py routes per-pass status through here)."""
    out = FakeTty()
    tp = TermPreview(stream=out, mode="ansi", max_cols=16, max_rows=6)
    tp.update(grad_image(), status="pass 1/4")
    first = out.getvalue()
    assert "pass 1/4" in first and "\x1b[K" in first
    n_lines = first.count("\n")  # art lines + 1 status line
    tp.update(grad_image(), status="pass 2/4")
    second = out.getvalue()[len(first):]
    # The rewind must cover art + status, i.e. every line the first frame drew.
    assert second.startswith(f"\x1b[{n_lines}A\r")
    assert "pass 2/4" in second
    # Without a status the rewind shrinks by exactly the status line.
    tp.update(grad_image())
    third = out.getvalue()[len(first) + len(second):]
    assert third.startswith(f"\x1b[{n_lines}A\r")
    tp.update(grad_image())
    fourth = out.getvalue()[len(first) + len(second) + len(third):]
    assert fourth.startswith(f"\x1b[{n_lines - 1}A\r")


def test_term_preview_kitty_status_line():
    out = FakeTty()
    tp = TermPreview(stream=out, mode="kitty")
    tp.update(grad_image(), status="s1")
    first = out.getvalue()
    assert "s1" in first
    tp.update(grad_image(), status="s2")
    second = out.getvalue()[len(first):]
    # Rewind covers the image line + the status line.
    assert second.startswith("\x1b[2A\r")


def test_term_preview_noop_without_tty():
    out = FakeTty(tty=False)
    tp = TermPreview(stream=out, mode="auto")
    tp.update(grad_image())
    assert out.getvalue() == ""


def test_term_preview_kitty_mode():
    out = FakeTty()
    tp = TermPreview(stream=out, mode="kitty")
    tp.update(grad_image())
    v = out.getvalue()
    assert "\x1b_G" in v and v.count("\x1b\\") >= 2  # delete + transmit
    assert "a=T" in v and "f=100" in v
