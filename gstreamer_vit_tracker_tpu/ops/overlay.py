"""On-device overlay compositor — HUD drawing without a host round-trip.

TPU-native replacement for the reference's CPU pixel-poking renderers
(/root/reference/src/drawing_rgb.rs, drawing.rs, nv12_convert.rs:172-343;
SURVEY.md §2 "native components" item 3).  Every primitive is a vectorised
mask computed from ``broadcasted_iota`` against (possibly traced) scalar
geometry, merged with ``where`` — no scalar scatter storms, everything
fuses into one XLA program over the frame.

Semantics mirror the reference exactly (same thickness/band geometry, dash
period 6, cursor size 25 / gap 5, crosshair arms, 5x7 font with 6-cell
advance), pinned by the golden tests in tests/test_overlay.py.

Text rendering operates on a statically-placed strip (HUD layout is fixed,
pipeline_ir.rs:168-186) with dynamic *content* passed as glyph-index
arrays, so arbitrary per-frame strings (FPS numbers, scores) render fully
on device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .font import ADVANCE, FONT_TABLE, encode_text

__all__ = [
    "draw_rect", "draw_crosshair", "draw_cursor", "draw_selection",
    "draw_background", "draw_text", "encode_text", "HudParams", "render_hud",
]


def _grid(h: int, w: int):
    r = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return r, c


def _paint(img: jnp.ndarray, mask: jnp.ndarray, color) -> jnp.ndarray:
    color = jnp.asarray(color, img.dtype)
    return jnp.where(mask[..., None], color, img)


def draw_rect(img: jnp.ndarray, x, y, w, h, thickness: int, color,
              enable=True) -> jnp.ndarray:
    """Rectangle outline, drawing_rgb.rs:55-66 semantics: ``thickness``
    bands inside the box extent, per-pixel bounds clipping."""
    H, W = img.shape[0], img.shape[1]
    r, c = _grid(H, W)
    x, y, w, h = (jnp.asarray(v, jnp.int32) for v in (x, y, w, h))
    t = thickness
    in_rect = (r >= y) & (r < y + h) & (c >= x) & (c < x + w)
    border = ((r < y + t) | (r >= y + h - t) | (c < x + t) | (c >= x + w - t))
    return _paint(img, in_rect & border & jnp.asarray(enable), color)


def draw_crosshair(img: jnp.ndarray, cx, cy, size: int, color,
                   enable=True) -> jnp.ndarray:
    """Cross of half-length ``size`` (drawing_rgb.rs:68-73)."""
    H, W = img.shape[0], img.shape[1]
    r, c = _grid(H, W)
    cx = jnp.asarray(cx, jnp.int32)
    cy = jnp.asarray(cy, jnp.int32)
    m = (((r == cy) & (jnp.abs(c - cx) <= size))
         | ((c == cx) & (jnp.abs(r - cy) <= size)))
    return _paint(img, m & jnp.asarray(enable), color)


def draw_cursor(img: jnp.ndarray, cx, cy, enable=True,
                color=(0, 255, 0)) -> jnp.ndarray:
    """Open-centre cursor, size 25 / gap 5 (drawing_rgb.rs:75-84)."""
    H, W = img.shape[0], img.shape[1]
    r, c = _grid(H, W)
    cx = jnp.asarray(cx, jnp.int32)
    cy = jnp.asarray(cy, jnp.int32)
    dx = jnp.abs(c - cx)
    dy = jnp.abs(r - cy)
    m = (((r == cy) & (dx >= 5) & (dx <= 25))
         | ((c == cx) & (dy >= 5) & (dy <= 25)))
    return _paint(img, m & jnp.asarray(enable), color)


def draw_selection(img: jnp.ndarray, start_x, start_y, cur_x, cur_y,
                   enable=True) -> jnp.ndarray:
    """Dashed yellow selection box with period-6 dashes
    (drawing_rgb.rs:106-129)."""
    H, W = img.shape[0], img.shape[1]
    r, c = _grid(H, W)
    sx, sy, ux, uy = (jnp.asarray(v, jnp.int32) for v in
                      (start_x, start_y, cur_x, cur_y))
    x1 = jnp.maximum(jnp.minimum(sx, ux), 0)
    y1 = jnp.maximum(jnp.minimum(sy, uy), 0)
    x2 = jnp.minimum(jnp.maximum(sx, ux), W - 1)
    y2 = jnp.minimum(jnp.maximum(sy, uy), H - 1)
    dash_c = (c // 6) % 2 == 0
    dash_r = (r // 6) % 2 == 0
    horiz = ((r == y1) | (r == y2)) & (c >= x1) & (c <= x2) & dash_c
    vert = ((c == x1) | (c == x2)) & (r >= y1) & (r <= y2) & dash_r
    return _paint(img, (horiz | vert) & jnp.asarray(enable), (255, 255, 0))


def draw_background(img: jnp.ndarray, x, y, w, h, value: int = 30,
                    enable=True) -> jnp.ndarray:
    """Filled dark-gray info box (drawing_rgb.rs:42-52 memset fill)."""
    H, W = img.shape[0], img.shape[1]
    r, c = _grid(H, W)
    x, y, w, h = (jnp.asarray(v, jnp.int32) for v in (x, y, w, h))
    m = (r >= y) & (r < y + h) & (c >= x) & (c < x + w)
    return _paint(img, m & jnp.asarray(enable), (value, value, value))


def draw_text(img: jnp.ndarray, chars: jnp.ndarray, n_chars, x: int, y: int,
              scale: int, luma: int, enable=True) -> jnp.ndarray:
    """Render up to ``len(chars)`` glyphs at static position (x, y).

    ``chars``: (max_len,) int32 glyph indices (font.encode_text);
    ``n_chars`` may be traced.  Matches draw_text_rgb (drawing_rgb.rs:86-104):
    5x7 glyphs, integer ``scale``, ``6*scale`` advance, same luma on all
    three channels.  Operates on a statically-sliced strip so the gather
    cost is proportional to the text box, not the frame.
    """
    H, W = img.shape[0], img.shape[1]
    max_len = chars.shape[0]
    strip_h = min(7 * scale, H - y)
    strip_w = min(ADVANCE * scale * max_len, W - x)
    if strip_h <= 0 or strip_w <= 0:
        return img
    strip = jax.lax.dynamic_slice(img, (y, x, 0), (strip_h, strip_w, 3))
    r, c = _grid(strip_h, strip_w)
    k = c // (ADVANCE * scale)
    gx = (c % (ADVANCE * scale)) // scale
    gy = r // scale
    font = jnp.asarray(FONT_TABLE)
    ch = chars[k]
    lit = (font[ch, jnp.minimum(gy, 6), jnp.minimum(gx, 4)] == 1)
    lit = lit & (gx < 5) & (gy < 7) & (k < jnp.asarray(n_chars, jnp.int32))
    lit = lit & jnp.asarray(enable)
    strip = jnp.where(lit[..., None], jnp.asarray(luma, img.dtype), strip)
    return jax.lax.dynamic_update_slice(img, strip, (y, x, 0))


# ---------------------------------------------------------------------------
# Full HUD (pipeline_ir.rs:162-204 composition, one jitted program)
# ---------------------------------------------------------------------------

# Field widths for the dynamic HUD strings.
STATE_LEN = 12      # "SELECT START"
FPS_LEN = 10        # "FPS: 12345"
TRK_LEN = 12        # "trk:123.4ms"
SCORE_LEN = 11      # "score: 100%"


class HudParams:
    """Host-side helper bundling the per-frame dynamic HUD inputs."""

    def __init__(self, state_name: str, fps: float, track_ms: float,
                 score: float, is_tracking: bool, is_selecting: bool,
                 cursor: Tuple[int, int], sel_start: Tuple[int, int],
                 sel_active: bool, bbox, has_bbox: bool):
        # Dynamic strings are TRUNCATED to their field width, never raised
        # on: a compile-dominated first tracked frame can push track_ms past
        # 9999.9 and must not crash the frame loop (encode_text itself still
        # raises on overflow — that contract is for static strings).
        self.state_chars, self.state_n = encode_text(
            state_name[:STATE_LEN], STATE_LEN)
        self.fps_chars, self.fps_n = encode_text(
            f"FPS: {fps:.0f}"[:FPS_LEN], FPS_LEN)
        self.trk_chars, self.trk_n = encode_text(
            f"trk:{track_ms:.1f}ms"[:TRK_LEN], TRK_LEN)
        self.score_chars, self.score_n = encode_text(
            f"score: {score * 100.0:.0f}%"[:SCORE_LEN], SCORE_LEN)
        self.is_tracking = is_tracking
        self.is_selecting = is_selecting
        self.cursor = cursor
        self.sel_start = sel_start
        self.sel_active = sel_active
        self.bbox = np.asarray(bbox if bbox is not None else (0, 0, 0, 0),
                               np.int32)
        self.has_bbox = has_bbox


@functools.partial(jax.jit, donate_argnums=(0,))
def _render_hud(img, state_chars, state_n, fps_chars, fps_n, trk_chars, trk_n,
                score_chars, score_n, is_tracking, is_selecting,
                cursor_x, cursor_y, sel_sx, sel_sy, sel_active,
                bbox, has_bbox):
    img = draw_text(img, state_chars, state_n, 15, 15, 2, 255)
    img = draw_text(img, fps_chars, fps_n, 15, 40, 2, 255)
    img = draw_text(img, trk_chars, trk_n, 15, 65, 1, 200)
    img = draw_text(img, score_chars, score_n, 200, 15, 2, 255,
                    enable=is_tracking)
    img = draw_cursor(img, cursor_x, cursor_y, enable=is_selecting)
    img = draw_selection(img, sel_sx, sel_sy, cursor_x, cursor_y,
                         enable=is_selecting & sel_active)
    img = draw_rect(img, bbox[0], bbox[1], bbox[2], bbox[3], 3, (0, 255, 0),
                    enable=has_bbox)
    img = draw_crosshair(img, bbox[0] + bbox[2] // 2, bbox[1] + bbox[3] // 2,
                         15, (0, 255, 0), enable=has_bbox)
    return img


def render_hud(img: jnp.ndarray, p: HudParams) -> jnp.ndarray:
    """Composite the full HUD (state, FPS, timings, score, cursor/selection,
    bbox + crosshair) onto ``img`` in one donated jitted call."""
    return _render_hud(
        img,
        jnp.asarray(p.state_chars), p.state_n,
        jnp.asarray(p.fps_chars), p.fps_n,
        jnp.asarray(p.trk_chars), p.trk_n,
        jnp.asarray(p.score_chars), p.score_n,
        bool(p.is_tracking), bool(p.is_selecting),
        int(p.cursor[0]), int(p.cursor[1]),
        int(p.sel_start[0]), int(p.sel_start[1]), bool(p.sel_active),
        jnp.asarray(p.bbox), bool(p.has_bbox),
    )
