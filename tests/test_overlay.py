"""Golden-image tests: on-device overlay vs numpy ports of the reference's
pixel-exact drawing algorithms (/root/reference/src/drawing_rgb.rs)."""

import jax.numpy as jnp
import numpy as np

from gstreamer_vit_tracker_tpu.ops import font, overlay


# --- numpy ports of the reference algorithms (independent implementation) --

def np_set_pixel(img, x, y, rgb):
    h, w = img.shape[:2]
    if 0 <= x < w and 0 <= y < h:
        img[y, x] = rgb


def np_rect(img, x, y, rw, rh, t, rgb):
    # drawing_rgb.rs:55-66
    for tt in range(t):
        for i in range(rw):
            np_set_pixel(img, x + i, y + tt, rgb)
            np_set_pixel(img, x + i, y + rh - 1 - tt, rgb)
        for i in range(rh):
            np_set_pixel(img, x + tt, y + i, rgb)
            np_set_pixel(img, x + rw - 1 - tt, y + i, rgb)


def np_crosshair(img, cx, cy, size, rgb):
    for i in range(-size, size + 1):
        np_set_pixel(img, cx + i, cy, rgb)
        np_set_pixel(img, cx, cy + i, rgb)


def np_cursor(img, cx, cy):
    for i in range(5, 26):
        np_set_pixel(img, cx + i, cy, (0, 255, 0))
        np_set_pixel(img, cx - i, cy, (0, 255, 0))
        np_set_pixel(img, cx, cy + i, (0, 255, 0))
        np_set_pixel(img, cx, cy - i, (0, 255, 0))


def np_selection(img, sx, sy, ux, uy):
    h, w = img.shape[:2]
    x1, y1 = max(min(sx, ux), 0), max(min(sy, uy), 0)
    x2, y2 = min(max(sx, ux), w - 1), min(max(sy, uy), h - 1)
    for x in range(x1, x2 + 1):
        if (x // 6) % 2 == 0:
            np_set_pixel(img, x, y1, (255, 255, 0))
            np_set_pixel(img, x, y2, (255, 255, 0))
    for y in range(y1, y2 + 1):
        if (y // 6) % 2 == 0:
            np_set_pixel(img, x1, y, (255, 255, 0))
            np_set_pixel(img, x2, y, (255, 255, 0))


def np_text(img, text, x, y, scale, luma):
    cx = x
    for ch in text:
        g = font.glyph(ch)
        for gy in range(7):
            for gx in range(5):
                if g[gy, gx]:
                    for sy in range(scale):
                        for sx in range(scale):
                            np_set_pixel(img, cx + gx * scale + sx,
                                         y + gy * scale + sy,
                                         (luma, luma, luma))
        cx += 6 * scale


def blank(h=96, w=128):
    return np.full((h, w, 3), 17, np.uint8)


# --- tests -----------------------------------------------------------------

def test_rect_golden():
    for geom in [(10, 12, 40, 30, 3), (-5, -5, 30, 30, 2),
                 (100, 80, 60, 60, 3), (20, 20, 5, 5, 3)]:
        x, y, rw, rh, t = geom
        want = blank()
        np_rect(want, x, y, rw, rh, t, (0, 255, 0))
        got = np.asarray(overlay.draw_rect(jnp.asarray(blank()), x, y, rw, rh,
                                           t, (0, 255, 0)))
        np.testing.assert_array_equal(got, want, err_msg=f"geom={geom}")


def test_crosshair_golden():
    for cx, cy in [(64, 48), (3, 3), (126, 94)]:
        want = blank()
        np_crosshair(want, cx, cy, 15, (0, 255, 0))
        got = np.asarray(overlay.draw_crosshair(jnp.asarray(blank()), cx, cy,
                                                15, (0, 255, 0)))
        np.testing.assert_array_equal(got, want)


def test_cursor_golden():
    for cx, cy in [(64, 48), (10, 90)]:
        want = blank()
        np_cursor(want, cx, cy)
        got = np.asarray(overlay.draw_cursor(jnp.asarray(blank()), cx, cy))
        np.testing.assert_array_equal(got, want)


def test_selection_golden():
    for sx, sy, ux, uy in [(20, 20, 90, 70), (90, 70, 20, 20), (-4, 10, 300, 60)]:
        want = blank()
        np_selection(want, sx, sy, ux, uy)
        got = np.asarray(overlay.draw_selection(jnp.asarray(blank()), sx, sy,
                                                ux, uy))
        np.testing.assert_array_equal(got, want)


def test_text_golden():
    for text, x, y, scale, luma in [("TRACKING", 15, 15, 2, 255),
                                    ("FPS: 60", 15, 40, 2, 255),
                                    ("trk:1.5ms", 15, 65, 1, 200),
                                    ("score: 87%", 5, 5, 2, 255)]:
        want = blank(96, 256)
        np_text(want, text, x, y, scale, luma)
        chars, n = font.encode_text(text, 12)
        got = np.asarray(overlay.draw_text(jnp.asarray(blank(96, 256)),
                                           jnp.asarray(chars), n, x, y,
                                           scale, luma))
        np.testing.assert_array_equal(got, want, err_msg=text)


def test_background_fill():
    got = np.asarray(overlay.draw_background(jnp.asarray(blank()), 10, 10,
                                             50, 40))
    assert (got[10:50, 10:60] == 30).all()
    assert (got[:10] == 17).all()


def test_font_covers_status_strings():
    for s in ["SELECT START", "SELECT END", "TRACKING", "LOST",
              "FPS: 1234", "trk:12.3ms", "score: 100%", "conv:0.1ms"]:
        font.encode_text(s, 16)   # raises if a glyph is missing


def test_encode_text_rejects_unmapped():
    import pytest
    with pytest.raises(KeyError):
        font.encode_text("xyz?", 8)


def test_render_hud_smoke():
    img = jnp.asarray(blank(256, 320))
    p = overlay.HudParams(
        state_name="TRACKING", fps=60.0, track_ms=1.5, score=0.87,
        is_tracking=True, is_selecting=False, cursor=(160, 128),
        sel_start=(100, 100), sel_active=False, bbox=(80, 60, 50, 40),
        has_bbox=True)
    out = np.asarray(overlay.render_hud(img, p))
    assert out.shape == (256, 320, 3)
    # bbox outline painted green
    assert (out[60, 80 + 25] == (0, 255, 0)).all()
    # state text painted white somewhere in its strip
    assert (out[15:29, 15:159] == 255).any()


def test_disabled_draws_are_noops():
    img = blank()
    out = np.asarray(overlay.draw_rect(jnp.asarray(img), 10, 10, 40, 30, 3,
                                       (0, 255, 0), enable=False))
    np.testing.assert_array_equal(out, img)
