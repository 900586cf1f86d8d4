"""Model shape/determinism tests and weight persistence round-trip."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gstreamer_vit_tracker_tpu.config import ModelConfig
from gstreamer_vit_tracker_tpu.models import heads, vittrack, weights

TINY = ModelConfig(template_size=32, search_size=64, patch_size=16,
                   embed_dim=32, depth=2, num_heads=2, dtype="float32")


@pytest.fixture(scope="module")
def tiny_params():
    return vittrack.init_params(jax.random.PRNGKey(0), TINY)


def test_forward_shapes(tiny_params, rng):
    z = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    ztok = vittrack.embed_template(tiny_params, z, TINY)
    assert ztok.shape == (1, TINY.num_template_tokens, TINY.embed_dim)
    maps = vittrack.forward(tiny_params, ztok, x, TINY, use_pallas=False)
    fs = TINY.feat_size
    assert maps.score.shape == (1, fs, fs)
    assert maps.offset.shape == (1, fs, fs, 2)
    assert maps.size.shape == (1, fs, fs, 2)
    assert float(maps.score.min()) >= 0.0 and float(maps.score.max()) <= 1.0


def test_forward_deterministic(tiny_params, rng):
    z = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    ztok = vittrack.embed_template(tiny_params, z, TINY)
    a = vittrack.forward(tiny_params, ztok, x, TINY, use_pallas=False)
    b = vittrack.forward(tiny_params, ztok, x, TINY, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(a.score), np.asarray(b.score))


def test_corr_head_mode(rng):
    cfg = dataclasses.replace(TINY, head_mode="corr")
    params = vittrack.init_params(jax.random.PRNGKey(0), cfg)
    assert "head" not in params
    z = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    ztok = vittrack.embed_template(params, z, cfg)
    maps = vittrack.forward(params, ztok, x, cfg, use_pallas=False)
    assert maps.score.shape == (1, cfg.feat_size, cfg.feat_size)
    assert np.all(np.asarray(maps.size) == 0)   # "carry previous size" marker


def test_default_config_param_count():
    cfg = ModelConfig()
    params = vittrack.init_params(jax.random.PRNGKey(0), cfg)
    n = vittrack.count_params(params)
    # deit-tiny-class backbone + conv head: ~5-7M params.
    assert 4_000_000 < n < 9_000_000


def test_hanning_window():
    h = np.asarray(heads.hanning_2d(16))
    assert h.shape == (16, 16)
    assert h.max() <= 1.0 and h.min() >= 0.0
    assert h[8, 8] > h[0, 0]   # peak at the centre


def test_decode_maps_picks_peak():
    fs = 8
    score = jnp.zeros((fs, fs)).at[3, 5].set(1.0)
    offset = jnp.full((fs, fs, 2), 0.5)
    size = jnp.full((fs, fs, 2), 0.25)
    hann = jnp.ones((fs, fs))
    bbox, conf = heads.decode_maps(score, offset, size, hann,
                                   jnp.asarray([0.1, 0.1]))
    np.testing.assert_allclose(np.asarray(bbox),
                               [(5 + 0.5) / fs, (3 + 0.5) / fs, 0.25, 0.25],
                               atol=1e-6)
    assert float(conf) == 1.0


def test_decode_zero_size_carries_previous():
    fs = 4
    score = jnp.zeros((fs, fs)).at[1, 1].set(1.0)
    offset = jnp.full((fs, fs, 2), 0.5)
    size = jnp.zeros((fs, fs, 2))
    bbox, _ = heads.decode_maps(score, offset, size, jnp.ones((fs, fs)),
                                jnp.asarray([0.3, 0.4]))
    np.testing.assert_allclose(np.asarray(bbox[2:]), [0.3, 0.4], atol=1e-6)


def test_npz_roundtrip(tiny_params, tmp_path):
    path = str(tmp_path / "w.npz")
    weights.save_npz(path, tiny_params)
    loaded = weights.load_npz(path, tiny_params)
    a = jax.tree.leaves(tiny_params)
    b = jax.tree.leaves(loaded)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_grouped_head_matches_towers():
    """The derived 4-conv grouped head (serving path) must reproduce the
    12-conv tower head bit-for-bit in f32 and closely in bf16."""
    import dataclasses

    from gstreamer_vit_tracker_tpu.models import heads as heads_mod
    from gstreamer_vit_tracker_tpu.models import vittrack

    cfg = ModelConfig(template_size=32, search_size=64, patch_size=16,
                      embed_dim=32, depth=1, num_heads=2, dtype="float32")
    params = vittrack.init_params(jax.random.PRNGKey(3), cfg)
    feat = jax.random.normal(jax.random.PRNGKey(4),
                             (2, cfg.num_search_tokens, cfg.embed_dim))
    want = heads_mod.conv_head(params["head"], feat, cfg)
    g = heads_mod.group_head_params(params["head"])
    got = heads_mod.conv_head_grouped(g, feat, cfg)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    # forward() auto-selects the grouped path when attached.
    gp = vittrack.with_grouped_head(params)
    assert "head_grouped" in gp
    z = jnp.zeros((1, cfg.template_size, cfg.template_size, 3))
    x = jnp.zeros((1, cfg.search_size, cfg.search_size, 3))
    ztok = vittrack.embed_template(gp, z, cfg)
    m1 = vittrack.forward(gp, ztok, x, cfg, use_pallas=False, fused=False)
    m2 = vittrack.forward(params, ztok, x, cfg, use_pallas=False,
                          fused=False)
    np.testing.assert_allclose(np.asarray(m1.score), np.asarray(m2.score),
                               rtol=1e-5, atol=1e-5)

    cfg16 = dataclasses.replace(cfg, dtype="bfloat16")
    feat16 = feat.astype(jnp.bfloat16)
    w16 = heads_mod.conv_head(params["head"], feat16, cfg16)
    g16 = heads_mod.conv_head_grouped(g, feat16, cfg16)
    np.testing.assert_allclose(np.asarray(w16[0]), np.asarray(g16[0]),
                               rtol=1e-2, atol=1e-2)


def test_grouped_head_under_jit_and_scan():
    """The grouped head must work INSIDE jit/scan: every entry in the
    derived params dict is an array pytree leaf (ints there would become
    tracers and break static slicing — caught on TPU round 3)."""
    from gstreamer_vit_tracker_tpu.models import vittrack
    from gstreamer_vit_tracker_tpu.tracker import core

    cfg = ModelConfig(template_size=32, search_size=64, patch_size=16,
                      embed_dim=32, depth=1, num_heads=2, dtype="float32")
    params = vittrack.with_grouped_head(
        vittrack.init_params(jax.random.PRNGKey(3), cfg))
    for leaf in jax.tree.leaves(params):
        assert hasattr(leaf, "shape"), f"non-array leaf {leaf!r}"
    frame = jnp.zeros((64, 96, 3), jnp.uint8)
    st = core.init(params, frame, jnp.asarray([20.0, 20.0, 24.0, 24.0]), cfg)
    st2, packed = core.update_packed_jit(params, st, frame, cfg, "rgb")
    assert np.isfinite(np.asarray(packed)).all()
