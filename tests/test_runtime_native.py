"""Native C++ runtime: build, ring semantics, converter bit-parity."""

import numpy as np
import pytest

from gstreamer_vit_tracker_tpu import runtime

pytestmark = pytest.mark.skipif(not runtime.available(),
                                reason="native toolchain unavailable")


def test_ring_drop_oldest():
    ring = runtime.NativeFrameRing(capacity=3, slot_bytes=16)
    for i in range(5):
        ring.push(np.full(16, i, np.uint8))
    assert len(ring) == 3
    assert ring.stats["dropped"] == 2
    seq, frame = ring.pop()
    assert frame[0] == 2            # oldest two (0, 1) were dropped
    assert seq == 3                 # sequence numbers are 1-based
    assert ring.pop()[1][0] == 3
    assert ring.pop()[1][0] == 4
    assert ring.pop() is None
    ring.close()


def test_ring_producer_never_blocks():
    ring = runtime.NativeFrameRing(capacity=2, slot_bytes=8)
    for i in range(10_000):
        ring.push(np.zeros(8, np.uint8))
    assert ring.stats["pushed"] == 10_000
    assert ring.stats["dropped"] == 9_998
    ring.close()


def test_native_nv12_matches_jax(rng):
    w, h = 128, 96
    buf = rng.integers(0, 256, size=w * h * 3 // 2, dtype=np.uint8)
    native = runtime.nv12_to_rgb(buf, w, h, num_threads=4)

    import jax.numpy as jnp

    from gstreamer_vit_tracker_tpu.ops import colorspace

    jax_out = np.asarray(colorspace.nv12_to_rgb(jnp.asarray(buf), width=w,
                                                height=h))
    np.testing.assert_array_equal(native, jax_out)


def test_native_yuy2_matches_jax(rng):
    w, h = 64, 48
    buf = rng.integers(0, 256, size=w * h * 2, dtype=np.uint8)
    native = runtime.yuy2_to_rgb(buf, w, h, num_threads=2)

    import jax.numpy as jnp

    from gstreamer_vit_tracker_tpu.ops import colorspace

    jax_out = np.asarray(colorspace.yuy2_to_rgb(jnp.asarray(buf), width=w,
                                                height=h))
    np.testing.assert_array_equal(native, jax_out)


def test_synth_nv12_generator():
    f = runtime.synth_nv12(64, 48, 10, 10, 16)
    assert f.shape == (64 * 48 * 3 // 2,)
    y = f[: 64 * 48].reshape(48, 64)
    # Object region is textured (has variance); background is a gradient.
    assert y[10:26, 10:26].std() > 10
