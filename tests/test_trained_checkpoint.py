"""Integration: the shipped trained conv-head checkpoint genuinely tracks.

assets/weights_small_synthetic.npz is produced by
scripts/train_synthetic.py (3000 steps on synthetic data); this pins the
full learned-head story: weights load -> conv head + hanning decode ->
confident tracking.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gstreamer_vit_tracker_tpu.config import ModelConfig
from gstreamer_vit_tracker_tpu.media.source import SyntheticSource
from gstreamer_vit_tracker_tpu.models import vittrack, weights
from gstreamer_vit_tracker_tpu.tracker import core

CKPT = os.path.join(os.path.dirname(__file__), "..", "assets",
                    "weights_small_synthetic.npz")
SMALL = ModelConfig(template_size=64, search_size=128, patch_size=16,
                    embed_dim=96, depth=4, num_heads=2, dtype="float32")

pytestmark = pytest.mark.skipif(not os.path.exists(CKPT),
                                reason="trained checkpoint not present")


def iou(a, b):
    ix = max(0.0, min(a[0] + a[2], b[0] + b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[1] + a[3], b[1] + b[3]) - max(a[1], b[1]))
    inter = ix * iy
    return inter / (a[2] * a[3] + b[2] * b[3] - inter)


def test_trained_conv_model_tracks():
    params = weights.load_npz(CKPT, vittrack.init_params(
        jax.random.PRNGKey(0), SMALL))
    src = SyntheticSource(320, 256, obj_size=56, seed=2, speed=3.0)
    st = core.init(params, jnp.asarray(src.frame_rgb(0)),
                   jnp.asarray(src.bbox_at(0)), SMALL)
    upd = jax.jit(lambda p, s, f: core.update(p, s, f, SMALL,
                                              use_pallas=False))
    ious, confs = [], []
    for i in range(1, 31):
        st, bbox, conf = upd(params, st, jnp.asarray(src.frame_rgb(i)))
        ious.append(iou(np.asarray(bbox), np.asarray(src.bbox_at(i))))
        confs.append(float(conf))
    assert np.mean(ious) > 0.6, f"mean IoU {np.mean(ious):.3f}"
    assert min(confs) > 0.25, f"confidence dipped to {min(confs):.3f}"


@pytest.mark.slow
def test_trained_small_occlusion_lost_and_reacquires():
    """Full occlusion drives confidence below the Lost threshold (no
    silent drift), the frozen search window holds position, and the track
    re-acquires once the occluder passes (round-3 robustness gate;
    tracker_context.rs:122-138 is the behaviour being matched)."""
    params = weights.load_npz(CKPT, vittrack.init_params(
        jax.random.PRNGKey(0), SMALL))
    src = SyntheticSource(320, 256, obj_size=48, seed=3, speed=2.0,
                          occlusion=(120, 31))   # occluded frames 60-90
    st = core.init(params, jnp.asarray(src.frame_rgb(0)),
                   jnp.asarray(src.bbox_at(0)), SMALL)
    upd = jax.jit(lambda p, s, f: core.update(p, s, f, SMALL,
                                              use_pallas=False))
    confs, boxes, ious = {}, {}, {}
    for i in range(1, 121):
        st, bbox, conf = upd(params, st, jnp.asarray(src.frame_rgb(i)))
        confs[i] = float(conf)
        boxes[i] = np.asarray(bbox)
        ious[i] = iou(np.asarray(bbox), np.asarray(src.bbox_at(i)))
    thr = 0.25
    hidden = [i for i in range(60, 91)
              if src.visible_frac_at(i) == 0.0 and i in confs]
    assert hidden
    # Fully hidden -> confidence collapses at some point (the Lost
    # machine engages; no hallucinated track while nothing is visible).
    assert min(confs[i] for i in hidden) < thr
    # While confidence stays below threshold the carried box FREEZES.
    frozen_pairs = [i for i in range(2, 121)
                    if confs[i - 1] <= thr and confs[i] <= thr]
    assert frozen_pairs
    for i in frozen_pairs:
        assert np.array_equal(boxes[i - 1], boxes[i]), i
    # Re-acquisition after the occluder passes: confident again, box back
    # on the target.
    assert max(confs[i] for i in range(91, 111)) > thr
    assert np.mean([ious[i] for i in range(95, 121)]) > 0.4


FLAGSHIP_CKPT = os.path.join(os.path.dirname(__file__), "..", "assets",
                             "weights_vittrack_t_synthetic.npz")


@pytest.mark.skipif(not os.path.exists(FLAGSHIP_CKPT),
                    reason="flagship checkpoint not present")
def test_trained_flagship_tracks():
    cfg = ModelConfig(dtype="float32")   # CPU test: skip bf16 casts
    params = weights.load_npz(FLAGSHIP_CKPT,
                              vittrack.init_params(jax.random.PRNGKey(0), cfg))
    src = SyntheticSource(320, 256, obj_size=56, seed=2, speed=3.0)
    st = core.init(params, jnp.asarray(src.frame_rgb(0)),
                   jnp.asarray(src.bbox_at(0)), cfg)
    upd = jax.jit(lambda p, s, f: core.update(p, s, f, cfg, use_pallas=False))
    ious, confs = [], []
    for i in range(1, 21):
        st, bbox, conf = upd(params, st, jnp.asarray(src.frame_rgb(i)))
        ious.append(iou(np.asarray(bbox), np.asarray(src.bbox_at(i))))
        confs.append(float(conf))
    assert np.mean(ious) > 0.6, f"mean IoU {np.mean(ious):.3f}"
    assert min(confs) > 0.25


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(FLAGSHIP_CKPT),
                    reason="flagship checkpoint not present")
def test_trained_flagship_occlusion_conf_collapse():
    """Flagship Lost-machinery contract: while the target is FULLY hidden
    the confidence must collapse below the 0.25 threshold for a sustained
    majority of hidden frames — not a single dip.  Added after a fade
    fine-tune candidate kept conf <= 0.25 on only 1/3 of hidden frames
    (fade samples teach 'dark thing = still the target', which
    generalises to the gray occluder slab unless occlusion negatives
    outweigh them); the scenario eval's hidden_below_thr_frac surfaced
    it, this pins it at gate level.  Ref behaviour:
    /root/reference/src/tracker_context.rs:122-138."""
    cfg = ModelConfig(dtype="float32")
    params = weights.load_npz(FLAGSHIP_CKPT,
                              vittrack.init_params(jax.random.PRNGKey(0), cfg))
    src = SyntheticSource(320, 256, obj_size=48, seed=3, speed=2.0,
                          occlusion=(120, 31))   # occluded frames 60-90
    st = core.init(params, jnp.asarray(src.frame_rgb(0)),
                   jnp.asarray(src.bbox_at(0)), cfg)
    upd = jax.jit(lambda p, s, f: core.update(p, s, f, cfg, use_pallas=False))
    confs, ious = {}, {}
    for i in range(1, 121):
        st, bbox, conf = upd(params, st, jnp.asarray(src.frame_rgb(i)))
        confs[i] = float(conf)
        ious[i] = iou(np.asarray(bbox), np.asarray(src.bbox_at(i)))
    hidden = [i for i in range(60, 91) if src.visible_frac_at(i) == 0.0]
    assert hidden
    below = [i for i in hidden if confs[i] <= 0.25]
    frac = len(below) / len(hidden)
    assert frac >= 0.6, (
        f"hidden conf below 0.25 on only {frac:.2f} of hidden frames "
        f"(max hidden conf {max(confs[i] for i in hidden):.3f})")
    # Re-acquisition once the occluder passes.
    assert max(confs[i] for i in range(91, 111)) > 0.25
    assert np.mean([ious[i] for i in range(95, 121)]) > 0.4


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(FLAGSHIP_CKPT),
                    reason="flagship checkpoint not present")
def test_trained_flagship_scale_sweep_600():
    """Round-3 gate (VERDICT #1): 600 frames whose target scales
    0.5x -> 2x -> 0.5x; the size head's runtime decode must follow with
    mean IoU >= 0.85 and NO track loss."""
    cfg = ModelConfig(dtype="float32")   # CPU test: skip bf16 casts
    params = weights.load_npz(FLAGSHIP_CKPT,
                              vittrack.init_params(jax.random.PRNGKey(0), cfg))
    src = SyntheticSource(640, 512, obj_size=64, seed=11, speed=3.0,
                          scale_range=(0.5, 2.0), scale_period=600)
    st = core.init(params, jnp.asarray(src.frame_rgb(0)),
                   jnp.asarray(src.bbox_at(0)), cfg)
    upd = jax.jit(lambda p, s, f: core.update(p, s, f, cfg, use_pallas=False))
    ious, confs = [], []
    for i in range(1, 601):
        st, bbox, conf = upd(params, st, jnp.asarray(src.frame_rgb(i)))
        ious.append(iou(np.asarray(bbox), np.asarray(src.bbox_at(i))))
        confs.append(float(conf))
    ious = np.asarray(ious)
    assert ious.mean() > 0.85, f"mean IoU {ious.mean():.3f}"
    assert ious.min() > 0.3, f"lost the target (min IoU {ious.min():.3f})"
    assert min(confs) > 0.25, f"confidence dipped to {min(confs):.3f}"
    # The decoded size really followed the sweep: predicted box area at
    # the scale peak is ~4x the area at the trough.
    peak = np.mean([ious[i] for i in range(140, 160)])
    assert peak > 0.8, f"IoU at 2x scale peak {peak:.3f}"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(FLAGSHIP_CKPT),
                    reason="flagship checkpoint not present")
def test_trained_flagship_long_horizon_borders():
    """Round-2 gate: 600 frames at 640x512 — the Lissajous path repeatedly
    drives the target to within 10 px of every frame border, the regime
    where the round-1 checkpoint lost it after ~250 frames.  Requires
    sustained score > 0.25 (tracker_context.rs:122) and high IoU
    throughout, INCLUDING the final frames."""
    cfg = ModelConfig(dtype="float32")   # CPU test: skip bf16 casts
    params = weights.load_npz(FLAGSHIP_CKPT,
                              vittrack.init_params(jax.random.PRNGKey(0), cfg))
    src = SyntheticSource(640, 512, obj_size=48, seed=5, speed=3.0)
    st = core.init(params, jnp.asarray(src.frame_rgb(0)),
                   jnp.asarray(src.bbox_at(0)), cfg)
    upd = jax.jit(lambda p, s, f: core.update(p, s, f, cfg, use_pallas=False))
    ious, confs = [], []
    for i in range(1, 601):
        st, bbox, conf = upd(params, st, jnp.asarray(src.frame_rgb(i)))
        ious.append(iou(np.asarray(bbox), np.asarray(src.bbox_at(i))))
        confs.append(float(conf))
    ious = np.asarray(ious)
    assert ious.mean() > 0.85, f"mean IoU {ious.mean():.3f}"
    assert ious[-50:].mean() > 0.85, f"late IoU {ious[-50:].mean():.3f}"
    assert ious.min() > 0.3, f"lost the target (min IoU {ious.min():.3f})"
    assert min(confs) > 0.25, f"confidence dipped to {min(confs):.3f}"


@pytest.mark.slow
def test_trained_small_drift_tail_no_collapse():
    """Deep-fade drift gate: the target fades to ~40% brightness over the
    sequence and BOTH template policies must hold the faded tail.

    History: this gate originally asserted "update wins by >0.05" — the
    pre-fade-augmentation ordering (static degrades on drift, online
    update tracks it; flagship-scale: 0.663 vs 0.894 over 3x400 frames,
    docs/ARCHITECTURE.md).  The occlusion-balanced fine-tune then
    regressed the tail to 0.353/0.237 (gray occlusion negatives teach
    "dark target = occluded"), and the fix — fade_frac augmentation
    (template/search brightness mismatch with visible=1) — made the
    STATIC template fade-robust across the world's whole fade range
    (the renderer clamps fade at 0.25x; training covers 0.30-1.0x), so
    the >0.05 ordering is gone by design, not by defect (0.862/0.874
    measured).  What this gate pins now is the property that actually
    regressed: no deep-fade tail collapse, and the update machinery is
    never harmful.  The flagship's own fade fine-tune (adopted later)
    closed its drift gap the same way — 0.952 static vs 0.949 updated
    on eval_tracking --scenario drift — so "update wins" is historical
    at BOTH scales; the online update remains the generic answer for
    drift axes the training distribution doesn't cover."""
    import dataclasses

    params = weights.load_npz(CKPT, vittrack.init_params(
        jax.random.PRNGKey(0), SMALL))
    src = SyntheticSource(320, 256, obj_size=56, seed=5, speed=2.0,
                          appearance_drift=0.005)   # fade: 1 -> 0.4 @ 120

    def run(cfg):
        st = core.init(params, jnp.asarray(src.frame_rgb(0)),
                       jnp.asarray(src.bbox_at(0)), cfg)
        upd = jax.jit(lambda p, s, f: core.update(p, s, f, cfg,
                                                  use_pallas=False))
        vals = []
        for i in range(1, 121):
            st, bbox, conf = upd(params, st, jnp.asarray(src.frame_rgb(i)))
            vals.append(iou(np.asarray(bbox), np.asarray(src.bbox_at(i))))
        return np.mean(vals[-40:])    # the faded tail is where they split

    iou_static = run(SMALL)
    iou_updated = run(dataclasses.replace(
        SMALL, template_update_enabled=True))
    assert iou_static > 0.75, f"static tail collapsed: {iou_static:.3f}"
    assert iou_updated > 0.75, f"updated tail collapsed: {iou_updated:.3f}"
    assert iou_updated > iou_static - 0.05, (
        f"update harmful: {iou_updated:.3f} vs static {iou_static:.3f}")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(FLAGSHIP_CKPT),
                    reason="flagship checkpoint not present")
def test_trained_flagship_frame_exit_recovery():
    """Frame-exit contract: when the target leaves the frame ENTIRELY
    (exit_spec world — the disappearance mode with no occluder appearance
    to reject, just absence + the frame-border zero-pad regime),
    confidence must collapse below the 0.25 Lost threshold on a sustained
    majority of off-frame frames, and the tracker must re-acquire once
    the target re-enters the same way.  Full-sweep numbers: IoU 0.973,
    hidden conf max 0.027, reacquire 0.978 (eval_tracking --scenario
    exit).  Ref behaviour: /root/reference/src/tracker_context.rs:122-138
    (Lost machine keyed off per-frame score)."""
    cfg = ModelConfig(dtype="float32")
    params = weights.load_npz(FLAGSHIP_CKPT,
                              vittrack.init_params(jax.random.PRNGKey(0), cfg))
    # Window centred mid-period: frames [60, 110), fully out ~[75, 95].
    src = SyntheticSource(320, 256, obj_size=48, seed=5, speed=2.0,
                          exit_spec=(120, 50))
    st = core.init(params, jnp.asarray(src.frame_rgb(0)),
                   jnp.asarray(src.bbox_at(0)), cfg)
    upd = jax.jit(lambda p, s, f: core.update(p, s, f, cfg, use_pallas=False))
    confs, ious = {}, {}
    for i in range(1, 141):
        st, bbox, conf = upd(params, st, jnp.asarray(src.frame_rgb(i)))
        confs[i] = float(conf)
        ious[i] = iou(np.asarray(bbox), np.asarray(src.bbox_at(i)))
    hidden = [i for i in range(60, 110) if src.visible_frac_at(i) == 0.0]
    assert len(hidden) >= 15
    below = [i for i in hidden if confs[i] <= 0.25]
    frac = len(below) / len(hidden)
    assert frac >= 0.6, (
        f"off-frame conf below 0.25 on only {frac:.2f} of frames "
        f"(max off-frame conf {max(confs[i] for i in hidden):.3f})")
    # Re-acquisition after re-entry completes.
    assert max(confs[i] for i in range(112, 131)) > 0.25
    assert np.mean([ious[i] for i in range(115, 141)]) > 0.4


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(FLAGSHIP_CKPT),
                    reason="flagship checkpoint not present")
def test_trained_flagship_composed_stress():
    """Composed worst-case gate (round-4 VERDICT item 8): occlusion +
    ±24 px camera shake + appearance drift STACKED on one scene, 2×400
    frames — the README robustness table's rows hold piecewise; this pins
    the composition.  Run with the online template update enabled: the
    drift fade crosses ~0.35 brightness while occlusion passes force the
    re-detection ramp, and a frame-0 template cannot confirm a deeply
    faded target inside a 4x-grown window (measured: static template
    0.72/0.77 per seq, updated 0.89/0.92 — the regime --template-update
    exists for).  Gates: visible-frame IoU ≥ 0.85 overall, no terminal
    loss (late-window IoU), hidden-conf contract intact (the update must
    never have learned the occluder).  Ref behaviour under compound
    stress: /root/reference/src/tracker_context.rs:127-152."""
    import dataclasses

    cfg = dataclasses.replace(ModelConfig(dtype="float32"),
                              template_update_enabled=True)
    params = weights.load_npz(FLAGSHIP_CKPT,
                              vittrack.init_params(jax.random.PRNGKey(0), cfg))
    upd = jax.jit(lambda p, s, f: core.update(p, s, f, cfg, use_pallas=False))
    vis_ious, late_ious, hidden_confs = [], [], []
    for seed, obj in ((0, 40), (1, 48)):
        src = SyntheticSource(640, 512, obj_size=obj, seed=seed, speed=3.0,
                              occlusion=(200, 41), shake_px=24.0,
                              appearance_drift=0.002)
        st = core.init(params, jnp.asarray(src.frame_rgb(0)),
                       jnp.asarray(src.bbox_at(0)), cfg)
        for i in range(1, 401):
            st, bbox, conf = upd(params, st, jnp.asarray(src.frame_rgb(i)))
            vis = src.visible_frac_at(i)
            if vis >= 0.7:
                v = iou(np.asarray(bbox), np.asarray(src.bbox_at(i)))
                vis_ious.append(v)
                if i > 350:
                    late_ious.append(v)
            elif vis < 0.05:
                hidden_confs.append(float(conf))
    mean_iou = float(np.mean(vis_ious))
    assert mean_iou >= 0.85, f"composed-stress IoU {mean_iou:.3f}"
    # The deep-fade tail after the last occlusion pass must not collapse
    # (the static-template failure mode: conf ~0.01 forever after ~f335).
    assert np.mean(late_ious) >= 0.7, (
        f"terminal loss: late IoU {np.mean(late_ious):.3f}")
    # Hidden-conf contract: the updated template must still reject the
    # occluder on a sustained majority of fully-hidden frames.
    if hidden_confs:
        frac = float(np.mean(np.asarray(hidden_confs) <= 0.25))
        assert frac >= 0.6, (
            f"hidden conf below 0.25 on only {frac:.2f} of hidden frames "
            f"(max {max(hidden_confs):.3f}) — template update may have "
            f"learned the occluder")
