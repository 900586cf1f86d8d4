"""Fused ViT block kernel: numerical parity + trainability.

The fused Pallas block (ops/vit_block.py) must match the XLA reference
block bit-for-bit in f32 / within bf16 tolerance, and be differentiable
through its custom_vjp (backward = XLA reference), since the training
step may run with the fused path on TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gstreamer_vit_tracker_tpu.config import ModelConfig
from gstreamer_vit_tracker_tpu.models import vit
from gstreamer_vit_tracker_tpu.ops import vit_block

CFG = ModelConfig(template_size=32, search_size=64, patch_size=16,
                  embed_dim=32, depth=2, num_heads=2, dtype="float32")


def _one_block_params(key):
    return vit.init_vit_params(key, CFG)["blocks"][0]


def test_fused_block_matches_reference_f32():
    key = jax.random.PRNGKey(0)
    p = _one_block_params(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 20, CFG.embed_dim),
                          jnp.float32)
    ref = vit_block.block_reference(x, p, CFG.num_heads)
    out = vit_block.block(x, p, CFG.num_heads)        # interpret mode on CPU
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_block_matches_reference_bf16():
    key = jax.random.PRNGKey(2)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16), _one_block_params(key))
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 20, CFG.embed_dim),
                          jnp.bfloat16)
    ref = vit_block.block_reference(x, p, CFG.num_heads)
    out = vit_block.block(x, p, CFG.num_heads)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


def test_fused_block_grad_matches_reference():
    key = jax.random.PRNGKey(4)
    p = _one_block_params(key)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 12, CFG.embed_dim),
                          jnp.float32)

    def loss_fused(x, p):
        return (vit_block.block(x, p, CFG.num_heads) ** 2).sum()

    def loss_ref(x, p):
        return (vit_block.block_reference(x, p, CFG.num_heads) ** 2).sum()

    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree.leaves(gp_f), jax.tree.leaves(gp_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_encode_fused_matches_unfused():
    params = vit.init_vit_params(jax.random.PRNGKey(6), CFG)
    z = jax.random.normal(jax.random.PRNGKey(7),
                          (1, CFG.num_template_tokens, CFG.embed_dim))
    x = jax.random.normal(jax.random.PRNGKey(8),
                          (1, CFG.num_search_tokens, CFG.embed_dim))
    a = vit.encode(params, z, x, CFG, use_pallas=False, fused=False)
    b = vit.encode(params, z, x, CFG, use_pallas=False, fused=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_fused_encoder_matches_chained_blocks():
    params = vit.init_vit_params(jax.random.PRNGKey(11), CFG)
    blocks = params["blocks"]
    x = jax.random.normal(jax.random.PRNGKey(12), (2, 20, CFG.embed_dim))
    ref = vit_block.encoder_reference(x, blocks, CFG.num_heads)
    out = vit_block.encoder(x, blocks, CFG.num_heads)   # interpret on CPU
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_encoder_grad_matches_reference():
    params = vit.init_vit_params(jax.random.PRNGKey(13), CFG)
    blocks = params["blocks"]
    x = jax.random.normal(jax.random.PRNGKey(14), (1, 12, CFG.embed_dim))

    g_f = jax.grad(lambda x: (vit_block.encoder(x, blocks,
                                                CFG.num_heads) ** 2).sum())(x)
    g_r = jax.grad(lambda x: (vit_block.encoder_reference(
        x, blocks, CFG.num_heads) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               rtol=1e-4, atol=1e-4)


def test_encode_fused_depth0_is_noop_encoder():
    """corr-tiny runs depth=0 (no blocks); fused=True must not crash."""
    cfg0 = ModelConfig(template_size=32, search_size=64, patch_size=16,
                       embed_dim=32, depth=0, num_heads=2, dtype="float32")
    params = vit.init_vit_params(jax.random.PRNGKey(15), cfg0)
    z = jax.random.normal(jax.random.PRNGKey(16),
                          (1, cfg0.num_template_tokens, cfg0.embed_dim))
    x = jax.random.normal(jax.random.PRNGKey(17),
                          (1, cfg0.num_search_tokens, cfg0.embed_dim))
    a = vit.encode(params, z, x, cfg0, fused=False)
    b = vit.encode(params, z, x, cfg0, fused=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_fused_block_under_vmap():
    p = _one_block_params(jax.random.PRNGKey(9))
    xs = jax.random.normal(jax.random.PRNGKey(10), (3, 1, 12, CFG.embed_dim))
    fn = lambda x: vit_block.block(x, p, CFG.num_heads)
    out = jax.vmap(fn)(xs)
    ref = jnp.stack([vit_block.block_reference(xs[i], p, CFG.num_heads)
                     for i in range(3)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
