"""Luma-plane overlay primitives (the legacy NV12 pipeline's drawing path).

The reference's legacy 1080p pipeline draws overlays directly into the
NV12 Y plane (/root/reference/src/nv12_convert.rs:172-343 and
drawing.rs:5-50) — brightness-only rect/crosshair/text/darken plus the
luma cursor/dashed-selection variants.  Same mask-based on-device design
as ops/overlay.py, acting on a (H, W) uint8 luma plane; chroma is left
untouched exactly like the reference.

Semantics differences vs the RGB variants are preserved deliberately:
* rect edges are inclusive (``x..=x2``) with coordinate clamping rather
  than per-pixel discard (nv12_convert.rs:183-212);
* the luma cursor draws full arms of length 25 *excluding* a ±5 dead zone
  around the centre (drawing.rs:10-22);
* background is a multiplicative darken, not a fill (nv12_convert.rs:
  324-343).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .font import FONT_TABLE, ADVANCE

__all__ = ["draw_rect_luma", "draw_crosshair_luma", "draw_text_luma",
           "draw_background_luma", "draw_cursor_luma", "draw_selection_luma",
           "draw_rect_luma_strips", "draw_crosshair_luma_strips",
           "render_hud_luma"]


def _grid(h: int, w: int):
    r = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return r, c


def draw_rect_luma(y_plane: jnp.ndarray, x, y, w, h, thickness: int,
                   brightness: int, enable=True) -> jnp.ndarray:
    """nv12_convert.rs:172-213: clamped inclusive edges, ``thickness``
    bands growing inward."""
    H, W = y_plane.shape
    r, c = _grid(H, W)
    x = jnp.asarray(x, jnp.int32)
    y = jnp.asarray(y, jnp.int32)
    w = jnp.asarray(w, jnp.int32)
    h = jnp.asarray(h, jnp.int32)
    x1 = jnp.maximum(x, 0)
    y1 = jnp.maximum(y, 0)
    x2 = jnp.minimum(x + w, W - 1)
    y2 = jnp.minimum(y + h, H - 1)
    t = thickness
    in_x = (c >= x1) & (c <= x2)
    in_y = (r >= y1) & (r <= y2)
    horiz = in_x & (((r >= y1) & (r < y1 + t)) | ((r <= y2) & (r > y2 - t)))
    vert = in_y & (((c >= x1) & (c < x1 + t)) | ((c <= x2) & (c > x2 - t)))
    m = (horiz | vert) & jnp.asarray(enable)
    return jnp.where(m, jnp.asarray(brightness, y_plane.dtype), y_plane)


def draw_crosshair_luma(y_plane: jnp.ndarray, cx, cy, size: int,
                        brightness: int, enable=True) -> jnp.ndarray:
    """nv12_convert.rs:216-242 (clamped centre, saturating arms)."""
    H, W = y_plane.shape
    r, c = _grid(H, W)
    cx = jnp.maximum(jnp.asarray(cx, jnp.int32), 0)
    cy = jnp.maximum(jnp.asarray(cy, jnp.int32), 0)
    m = (((r == cy) & (jnp.abs(c - cx) <= size))
         | ((c == cx) & (jnp.abs(r - cy) <= size)))
    m = m & jnp.asarray(enable)
    return jnp.where(m, jnp.asarray(brightness, y_plane.dtype), y_plane)


def draw_cursor_luma(y_plane: jnp.ndarray, cx, cy, enable=True) -> jnp.ndarray:
    """drawing.rs:5-23: arms to ±25 with a ±5 dead zone, brightness 255."""
    H, W = y_plane.shape
    r, c = _grid(H, W)
    cx = jnp.clip(jnp.asarray(cx, jnp.int32), 0, W - 1)
    cy = jnp.clip(jnp.asarray(cy, jnp.int32), 0, H - 1)
    dx = jnp.abs(c - cx)
    dy = jnp.abs(r - cy)
    m = (((r == cy) & (dx <= 25) & (dx > 5))
         | ((c == cx) & (dy <= 25) & (dy > 5)))
    m = m & jnp.asarray(enable)
    return jnp.where(m, jnp.asarray(255, y_plane.dtype), y_plane)


def draw_selection_luma(y_plane: jnp.ndarray, start_x, start_y, cur_x, cur_y,
                        enable=True) -> jnp.ndarray:
    """drawing.rs:25-50: dashed box on luma, period-6 dashes, 255."""
    H, W = y_plane.shape
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
    m = (horiz | vert) & jnp.asarray(enable)
    return jnp.where(m, jnp.asarray(255, y_plane.dtype), y_plane)


def draw_rect_luma_strips(y_plane: jnp.ndarray, x, y, w, h, thickness: int,
                          brightness: int) -> jnp.ndarray:
    """Strip-update variant of :func:`draw_rect_luma` for hot loops.

    Identical pixels (equivalence is test-pinned for in-frame rects), but
    writes four thin dynamic slices — two ``(t, W)`` rows and two ``(H, t)``
    columns — instead of a full-plane masked ``where``.  On a 4K luma the
    masked pass touches ~17 MB/edge; the strips touch ~36 KB total, which
    is what keeps the per-frame HUD composite off the benchmark's critical
    path (bench --uhd).

    Contract: pixel-identical to the masked variant only for rects whose
    edges lie inside the frame — a partially off-frame rect clamps its
    strip origin, so edge rows/columns past the border are dropped rather
    than wrapped (the masked variant draws the clamped-edge pixels
    instead).  Use :func:`draw_rect_luma` when exact off-frame semantics
    matter; thickness is clamped to the plane so tiny planes still
    compile.
    """
    H, W = y_plane.shape
    t = max(1, min(thickness, H, W))    # static: plane smaller than the
    # strip would fail to compile a (t, W)/(H, t) dynamic_slice
    x = jnp.asarray(x, jnp.int32)
    y = jnp.asarray(y, jnp.int32)
    w = jnp.asarray(w, jnp.int32)
    h = jnp.asarray(h, jnp.int32)
    x1 = jnp.maximum(x, 0)
    y1 = jnp.maximum(y, 0)
    x2 = jnp.minimum(x + w, W - 1)
    y2 = jnp.minimum(y + h, H - 1)
    bright = jnp.asarray(brightness, y_plane.dtype)

    def hstrip(plane, row_lo, cond_rows):
        row0 = jnp.clip(row_lo, 0, H - t)
        strip = jax.lax.dynamic_slice(plane, (row0, 0), (t, W))
        r = row0 + jax.lax.broadcasted_iota(jnp.int32, (t, W), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (t, W), 1)
        m = cond_rows(r) & (c >= x1) & (c <= x2)
        strip = jnp.where(m, bright, strip)
        return jax.lax.dynamic_update_slice(plane, strip, (row0, 0))

    def vstrip(plane, col_lo, cond_cols):
        col0 = jnp.clip(col_lo, 0, W - t)
        strip = jax.lax.dynamic_slice(plane, (0, col0), (H, t))
        r = jax.lax.broadcasted_iota(jnp.int32, (H, t), 0)
        c = col0 + jax.lax.broadcasted_iota(jnp.int32, (H, t), 1)
        m = cond_cols(c) & (r >= y1) & (r <= y2)
        strip = jnp.where(m, bright, strip)
        return jax.lax.dynamic_update_slice(plane, strip, (0, col0))

    y_plane = hstrip(y_plane, y1, lambda r: (r >= y1) & (r < y1 + t))
    y_plane = hstrip(y_plane, y2 - t + 1, lambda r: (r <= y2) & (r > y2 - t))
    y_plane = vstrip(y_plane, x1, lambda c: (c >= x1) & (c < x1 + t))
    y_plane = vstrip(y_plane, x2 - t + 1, lambda c: (c <= x2) & (c > x2 - t))
    return y_plane


def draw_crosshair_luma_strips(y_plane: jnp.ndarray, cx, cy, size: int,
                               brightness: int) -> jnp.ndarray:
    """Strip-update variant of :func:`draw_crosshair_luma`: one
    ``(2*size+1, 2*size+1)`` block update instead of a full-plane mask.
    Pixel-identical for centres inside (or near) the frame — the block
    origin clamps so truncated arms at the borders still land inside it.
    The block side is clamped to the plane, so planes smaller than the
    crosshair still compile (arms truncate to the plane)."""
    H, W = y_plane.shape
    side = min(2 * size + 1, H, W)
    cx = jnp.maximum(jnp.asarray(cx, jnp.int32), 0)
    cy = jnp.maximum(jnp.asarray(cy, jnp.int32), 0)
    row0 = jnp.clip(cy - size, 0, max(H - side, 0))
    col0 = jnp.clip(cx - size, 0, max(W - side, 0))
    block = jax.lax.dynamic_slice(y_plane, (row0, col0), (side, side))
    r = row0 + jax.lax.broadcasted_iota(jnp.int32, (side, side), 0)
    c = col0 + jax.lax.broadcasted_iota(jnp.int32, (side, side), 1)
    m = (((r == cy) & (jnp.abs(c - cx) <= size))
         | ((c == cx) & (jnp.abs(r - cy) <= size)))
    block = jnp.where(m, jnp.asarray(brightness, y_plane.dtype), block)
    return jax.lax.dynamic_update_slice(y_plane, block, (row0, col0))


def draw_background_luma(y_plane: jnp.ndarray, x: int, y: int, w: int, h: int,
                         darkness: int, enable=True) -> jnp.ndarray:
    """nv12_convert.rs:324-343: multiplicative darken,
    ``y' = y * (255 - darkness) / 255`` (integer semantics)."""
    H, W = y_plane.shape
    r, c = _grid(H, W)
    m = (r >= y) & (r < y + h) & (c >= x) & (c < x + w) & jnp.asarray(enable)
    factor = 255 - darkness
    darkened = ((y_plane.astype(jnp.int32) * factor) // 255).astype(y_plane.dtype)
    return jnp.where(m, darkened, y_plane)


def draw_text_luma(y_plane: jnp.ndarray, chars: jnp.ndarray, n_chars,
                   x: int, y: int, scale: int, brightness: int,
                   enable=True) -> jnp.ndarray:
    """nv12_convert.rs:245-321: 5x7 glyphs on the Y plane (static position,
    dynamic content — same strip technique as ops.overlay.draw_text)."""
    H, W = y_plane.shape
    max_len = chars.shape[0]
    strip_h = min(7 * scale, H - y)
    strip_w = min(ADVANCE * scale * max_len, W - x)
    if strip_h <= 0 or strip_w <= 0:
        return y_plane
    strip = jax.lax.dynamic_slice(y_plane, (y, x), (strip_h, strip_w))
    r, c = _grid(strip_h, strip_w)
    k = c // (ADVANCE * scale)
    gx = (c % (ADVANCE * scale)) // scale
    gy = r // scale
    font = jnp.asarray(FONT_TABLE)
    lit = (font[chars[k], jnp.minimum(gy, 6), jnp.minimum(gx, 4)] == 1)
    lit = lit & (gx < 5) & (gy < 7) & (k < jnp.asarray(n_chars, jnp.int32))
    lit = lit & jnp.asarray(enable)
    strip = jnp.where(lit, jnp.asarray(brightness, y_plane.dtype), strip)
    return jax.lax.dynamic_update_slice(y_plane, strip, (y, x))


# ---------------------------------------------------------------------------
# Full luma HUD (the legacy pipeline's composition, pipeline.rs:125-174)
# ---------------------------------------------------------------------------

import functools as _functools



@_functools.partial(jax.jit, donate_argnums=(0,))
def _render_hud_luma(y_plane, state_chars, state_n, fps_chars, fps_n,
                     trk_chars, trk_n, score_chars, score_n, is_tracking,
                     is_selecting, cursor_x, cursor_y, sel_sx, sel_sy,
                     sel_active, bbox, has_bbox):
    y_plane = draw_text_luma(y_plane, state_chars, state_n, 15, 15, 2, 255)
    y_plane = draw_text_luma(y_plane, fps_chars, fps_n, 15, 40, 2, 255)
    y_plane = draw_text_luma(y_plane, trk_chars, trk_n, 15, 65, 1, 200)
    y_plane = draw_text_luma(y_plane, score_chars, score_n, 200, 15, 2, 255,
                             enable=is_tracking)
    y_plane = draw_cursor_luma(y_plane, cursor_x, cursor_y,
                               enable=is_selecting)
    y_plane = draw_selection_luma(y_plane, sel_sx, sel_sy, cursor_x, cursor_y,
                                  enable=is_selecting & sel_active)
    y_plane = draw_rect_luma(y_plane, bbox[0], bbox[1], bbox[2], bbox[3], 3,
                             255, enable=has_bbox)
    y_plane = draw_crosshair_luma(y_plane, bbox[0] + bbox[2] // 2,
                                  bbox[1] + bbox[3] // 2, 15, 255,
                                  enable=has_bbox)
    return y_plane


def render_hud_luma(y_plane, p):
    """Composite the full HUD onto an NV12 Y plane in one donated jitted
    call.  ``p`` is an ops.overlay.HudParams."""
    return _render_hud_luma(
        y_plane,
        jnp.asarray(p.state_chars), p.state_n,
        jnp.asarray(p.fps_chars), p.fps_n,
        jnp.asarray(p.trk_chars), p.trk_n,
        jnp.asarray(p.score_chars), p.score_n,
        bool(p.is_tracking), bool(p.is_selecting),
        int(p.cursor[0]), int(p.cursor[1]),
        int(p.sel_start[0]), int(p.sel_start[1]), bool(p.sel_active),
        jnp.asarray(p.bbox), bool(p.has_bbox),
    )
