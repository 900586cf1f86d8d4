"""Flash-attention kernel vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gstreamer_vit_tracker_tpu.ops import attention


@pytest.mark.parametrize("b,s,d", [(2, 128, 64), (1, 320, 64), (3, 200, 32),
                                   (1, 1200, 32)])  # >1024: blocked path
def test_flash_matches_reference(rng, b, s, d):
    q = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    got = attention.flash_attention(q, k, v, interpret=True)
    want = attention.attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_flash_padding_does_not_leak(rng):
    """Padded key slots must not contribute: compare s=320 (padded to 384
    internally) against the unpadded reference."""
    b, s, d = 1, 320, 64
    q = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    v = 100.0 * jnp.asarray(rng.standard_normal((b, s, d)), jnp.float32)
    got = attention.flash_attention(q, k, v, interpret=True)
    want = attention.attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=2e-5)


def test_multihead_shapes(rng):
    b, s, dm, h = 2, 320, 192, 3
    q = jnp.asarray(rng.standard_normal((b, s, dm)), jnp.float32)
    out = attention.multihead_attention(q, q, q, h, use_pallas=False)
    assert out.shape == (b, s, dm)
    # Self-attention of identical q=k=v: rows are convex combos of v rows.
    assert np.isfinite(np.asarray(out)).all()


def test_multihead_pallas_matches_xla(rng):
    b, s, dm, h = 1, 64, 96, 3
    q = jnp.asarray(rng.standard_normal((b, s, dm)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, dm)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, dm)), jnp.float32)
    a = attention.multihead_attention(q, k, v, h, use_pallas=False)
    b_ = jax.jit(lambda q, k, v: attention.multihead_attention(
        q, k, v, h, use_pallas=True))(q, k, v)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)
