"""Golden tests for the luma-plane overlay path vs numpy ports of the
reference NV12 drawing (/root/reference/src/nv12_convert.rs:172-343,
drawing.rs:5-50)."""

import jax.numpy as jnp
import numpy as np

from gstreamer_vit_tracker_tpu.ops import font, overlay_nv12


def blank(h=96, w=128):
    return np.full((h, w), 100, np.uint8)


def np_rect_luma(y, x, yy, w, h, t, brightness):
    H, W = y.shape
    x1 = max(x, 0)
    y1 = max(yy, 0)
    x2 = min(x + w, W - 1)
    y2 = min(yy + h, H - 1)
    for tt in range(t):
        if y1 + tt < H:
            y[y1 + tt, x1:x2 + 1] = brightness
        if y2 - tt >= 0 and y2 - tt < H:
            y[y2 - tt, x1:x2 + 1] = brightness
    for py in range(y1, y2 + 1):
        for tt in range(t):
            if x1 + tt < W:
                y[py, x1 + tt] = brightness
            if x2 - tt >= 0 and x2 - tt < W:
                y[py, x2 - tt] = brightness
    return y


def test_rect_luma_golden():
    for geom in [(10, 12, 40, 30, 3), (100, 70, 60, 60, 2), (-5, -4, 30, 30, 2)]:
        x, yy, w, h, t = geom
        want = np_rect_luma(blank(), x, yy, w, h, t, 255)
        got = np.asarray(overlay_nv12.draw_rect_luma(jnp.asarray(blank()),
                                                     x, yy, w, h, t, 255))
        np.testing.assert_array_equal(got, want, err_msg=str(geom))


def test_cursor_luma_dead_zone():
    got = np.asarray(overlay_nv12.draw_cursor_luma(jnp.asarray(blank()), 64, 48))
    assert got[48, 64 + 6] == 255 and got[48, 64 + 25] == 255
    assert got[48, 64 + 5] == 100          # dead zone preserved
    assert got[48, 64] == 100              # centre preserved
    assert got[48 + 26, 64] == 100         # beyond arm length


def test_background_luma_multiplicative():
    base = blank()
    got = np.asarray(overlay_nv12.draw_background_luma(jnp.asarray(base),
                                                       10, 10, 40, 30, 150))
    # y' = y * (255-150) / 255 = 100*105//255 = 41
    assert (got[10:40, 10:50] == (100 * 105) // 255).all()
    assert (got[:10] == 100).all()


def test_text_luma_matches_rgb_variant():
    from gstreamer_vit_tracker_tpu.ops import overlay

    chars, n = font.encode_text("LOST", 8)
    luma = np.asarray(overlay_nv12.draw_text_luma(
        jnp.asarray(blank(64, 256)), jnp.asarray(chars), n, 5, 5, 2, 255))
    rgb = np.asarray(overlay.draw_text(
        jnp.asarray(np.full((64, 256, 3), 100, np.uint8)),
        jnp.asarray(chars), n, 5, 5, 2, 255))
    np.testing.assert_array_equal(luma, rgb[..., 0])


def test_selection_luma_dashes():
    got = np.asarray(overlay_nv12.draw_selection_luma(jnp.asarray(blank()),
                                                      20, 20, 80, 60))
    # Dash period along the top edge: (x//6)%2==0 (drawing.rs:38-43).  The
    # corner pixels additionally light when the vertical-edge rule
    # (y//6)%2==0 holds (x in {20, 80} with y=20 -> 20//6=3, odd -> off).
    for x in range(21, 80):
        expected = 255 if (x // 6) % 2 == 0 else 100
        assert got[20, x] == expected, x
    # Vertical edge rule.
    for y in range(21, 60):
        expected = 255 if (y // 6) % 2 == 0 else 100
        assert got[y, 20] == expected, y


def test_rect_strips_match_masked():
    rng = np.random.default_rng(0)
    for geom in [(10, 12, 40, 30, 3), (100, 70, 60, 60, 2),
                 (0, 0, 127, 95, 3), (90, 60, 37, 35, 1)]:
        x, yy, w, h, t = geom
        base = rng.integers(0, 256, (96, 128), dtype=np.uint8)
        want = np.asarray(overlay_nv12.draw_rect_luma(
            jnp.asarray(base), x, yy, w, h, t, 255))
        got = np.asarray(overlay_nv12.draw_rect_luma_strips(
            jnp.asarray(base), x, yy, w, h, t, 255))
        np.testing.assert_array_equal(got, want, err_msg=str(geom))


def test_crosshair_strips_match_masked():
    rng = np.random.default_rng(1)
    for cx, cy in [(64, 48), (3, 3), (125, 93), (0, 48), (64, 95)]:
        base = rng.integers(0, 256, (96, 128), dtype=np.uint8)
        want = np.asarray(overlay_nv12.draw_crosshair_luma(
            jnp.asarray(base), cx, cy, 15, 255))
        got = np.asarray(overlay_nv12.draw_crosshair_luma_strips(
            jnp.asarray(base), cx, cy, 15, 255))
        np.testing.assert_array_equal(got, want, err_msg=str((cx, cy)))


def test_strips_compile_on_planes_smaller_than_block():
    """Planes smaller than the strip/crosshair block must still compile
    (the block side clamps to the plane; ADVICE round-2)."""
    rng = np.random.default_rng(2)
    tiny = jnp.asarray(rng.integers(0, 256, (8, 10), dtype=np.uint8))
    out = overlay_nv12.draw_crosshair_luma_strips(tiny, 4, 4, 15, 255)
    assert out.shape == (8, 10)
    assert int(np.asarray(out)[4, 0]) == 255        # truncated arm drawn
    out2 = overlay_nv12.draw_rect_luma_strips(tiny, 1, 1, 6, 5, 12, 255)
    assert out2.shape == (8, 10)
