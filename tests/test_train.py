"""Training subsystem tests: loss sanity + loss decreases on synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gstreamer_vit_tracker_tpu.config import ModelConfig
from gstreamer_vit_tracker_tpu.models import vittrack
from gstreamer_vit_tracker_tpu.train import (create_train_state, data, losses,
                                             train_step)

TINY = ModelConfig(template_size=32, search_size=64, patch_size=16,
                   embed_dim=32, depth=1, num_heads=2, dtype="float32")


def test_gaussian_target_peak():
    # Cell centres: (i + 0.5) / 16 — pick exact centres so the peak is 1.0.
    t = np.asarray(losses.gaussian_target(16, jnp.asarray([7.5 / 16, 3.5 / 16])))
    iy, ix = np.unravel_index(t.argmax(), t.shape)
    assert (iy, ix) == (3, 7)
    assert abs(t.max() - 1.0) < 1e-5


def test_focal_loss_prefers_correct_peak():
    fs = 8
    target = losses.gaussian_target(fs, jnp.asarray([0.5, 0.5]))
    good = jnp.clip(target * 0.9 + 0.01, 0, 1)
    bad = jnp.roll(good, 3, axis=0)
    assert float(losses.focal_loss(good, target)) < float(
        losses.focal_loss(bad, target))


def test_giou_perfect_box_zero_loss():
    b = jnp.asarray([0.5, 0.5, 0.2, 0.3])
    assert float(losses.giou_loss(b, b)) < 1e-5
    far = jnp.asarray([0.1, 0.1, 0.05, 0.05])
    assert float(losses.giou_loss(far, b)) > 0.5


def test_make_batch_shapes(rng):
    z, x, gt = data.make_batch(rng, 2, TINY)
    assert z.shape == (2, 32, 32, 3)
    assert x.shape == (2, 64, 64, 3)
    assert gt.shape == (2, 5)       # (cx, cy, w, h, visible)
    assert (gt[:, 2:4] > 0).all() and (gt[:, :4] <= 1.5).all()
    assert np.isin(gt[:, 4], (0.0, 1.0)).all()


def test_sample_raw_visibility_negatives(rng):
    """Full-occlusion samples carry visible=0 and occur at the configured
    rate; the search crop there shows the occluder, not the target."""
    n_vis0 = 0
    for _ in range(60):
        z, x, gt = data.sample_raw(rng, TINY, full_occ_frac=0.5,
                                   occlusion_frac=0.5)
        assert gt.shape == (5,)
        n_vis0 += int(gt[4] == 0.0)
    assert 10 < n_vis0 < 50      # ~30 expected at 0.5


def test_total_loss_invisible_masks_regressions():
    fs = 8
    score = jnp.full((fs, fs), 0.4)
    offset = jnp.full((fs, fs, 2), 0.3)
    size = jnp.full((fs, fs, 2), 0.2)
    gt = jnp.asarray([0.5, 0.5, 0.25, 0.25])
    tot_v, parts_v = losses.total_loss(score, offset, size, gt,
                                       visible=jnp.float32(0.0))
    assert float(parts_v["l1_offset"]) == 0.0
    assert float(parts_v["l1_size"]) == 0.0
    assert float(parts_v["giou"]) == 0.0
    # Invisible target: a LOW score map must cost less than a high one.
    lo, _ = losses.total_loss(jnp.full((fs, fs), 0.01), offset, size, gt,
                              visible=jnp.float32(0.0))
    assert float(lo) < float(tot_v)


@pytest.mark.slow
def test_train_step_decreases_loss(rng):
    params = vittrack.init_params(jax.random.PRNGKey(0), TINY)
    state = create_train_state(params, lr=1e-3)
    # The scene pool persists across tests; start from a clean pool so the
    # fixed-seed batch content (and thus the overfit trajectory) does not
    # depend on which tests ran before this one.
    data._SOURCE_POOL.clear()
    it = data.batch_iterator(0, 8, TINY)
    z, x, gt = next(it)
    z, x, gt = jnp.asarray(z), jnp.asarray(x), jnp.asarray(gt)
    first = None
    last = None
    for i in range(60):
        state, loss, parts = train_step(state, z, x, gt, TINY, lr=1e-3,
                                        use_pallas=False)
        if first is None:
            first = float(loss)
        last = float(loss)
    assert int(state.step) == 60
    assert last < first * 0.5, f"loss did not decrease: {first} -> {last}"
    assert np.isfinite(last)


def test_train_step_bf16_model(rng):
    """Training must differentiate cleanly through the true-bf16 compute
    path (params cast at use; conv head without dtype-mixing transpose)."""
    import dataclasses

    cfg16 = dataclasses.replace(TINY, dtype="bfloat16")
    params = vittrack.init_params(jax.random.PRNGKey(0), cfg16)
    state = create_train_state(params, lr=1e-3)
    z, x, gt = data.make_batch(rng, 4, cfg16)
    state, loss, parts = train_step(state, jnp.asarray(z), jnp.asarray(x),
                                    jnp.asarray(gt), cfg16, lr=1e-3,
                                    use_pallas=False)
    assert np.isfinite(float(loss))
    # Master weights stay f32.
    assert state.params["backbone"]["patch_embed"]["kernel"].dtype == jnp.float32


def test_sample_raw_rotation_mismatch():
    """rotation_frac renders template and search at mismatched in-plane
    angles (same scene, same gt): samples stay well-formed, and the
    default stream (rotation_frac=0) is bit-identical to the pre-knob
    sampler — existing datasets/seeds are unaffected."""
    rng = np.random.default_rng(11)
    for _ in range(20):
        z, x, gt = data.sample_raw(rng, TINY, rotation_frac=1.0,
                                   distractor_frac=0.0,
                                   occlusion_frac=0.0, full_occ_frac=0.0)
        assert z.dtype == x.dtype == np.uint8
        assert np.isfinite(gt).all() and (gt[2:4] > 0).all()
    a = data.sample_raw(np.random.default_rng(3), TINY)
    b = data.sample_raw(np.random.default_rng(3), TINY, rotation_frac=0.0)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(u, v)


def test_sample_raw_fade_mismatch():
    """fade_frac darkens the search-side target vs the template while
    keeping visible=1 (a faded target is still the target — the cue that
    separates deep fade from the gray occlusion negatives).  The default
    stream (fade_frac=0) is bit-identical to the pre-knob sampler."""
    rng = np.random.default_rng(21)
    darker = 0
    for _ in range(30):
        z, x, gt = data.sample_raw(rng, TINY, fade_frac=1.0,
                                   border_frac=0.0, distractor_frac=0.0,
                                   occlusion_frac=0.0, full_occ_frac=0.0,
                                   redetect_frac=0.0)
        assert z.dtype == x.dtype == np.uint8
        assert gt[4] == 1.0          # fade is NOT occlusion
        assert np.isfinite(gt).all() and (gt[2:4] > 0).all()
        hz, wz = z.shape[:2]
        hx, wx = x.shape[:2]
        tz = z[hz // 2 - 8:hz // 2 + 8, wz // 2 - 8:wz // 2 + 8]
        tx = x[hx // 2 - 8:hx // 2 + 8, wx // 2 - 8:wx // 2 + 8]
        darker += float(tx.mean()) < float(tz.mean()) - 5.0
    # The static-template regime (~half the draws, fade_x down to 0.3)
    # must show up as a clearly darker search-side centre.
    assert darker >= 5, f"only {darker}/30 samples visibly darker"
    a = data.sample_raw(np.random.default_rng(3), TINY)
    b = data.sample_raw(np.random.default_rng(3), TINY, fade_frac=0.0)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(u, v)
