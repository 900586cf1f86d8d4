"""Config layer tests: defaults match the reference constants; JSON round
trip."""

from gstreamer_vit_tracker_tpu.config import AppConfig, ModelConfig


def test_reference_constants():
    c = AppConfig()
    # pipeline_ir.rs:27-30
    assert (c.capture.width, c.capture.height, c.capture.fps) == (640, 512, 60)
    assert (c.display.width, c.display.height) == (1280, 1024)
    # pipeline_ir.rs:82-83
    assert (c.display.connector_id, c.display.plane_id) == (231, 72)
    # pipeline_ir.rs:75-78
    assert c.queue.max_buffers == 3 and c.queue.leaky == "downstream"
    # tracker_context.rs:93,122,144; selection_state.rs:28-29,42
    assert c.session.score_threshold == 0.25
    assert c.session.lost_frames_max == 60
    assert c.session.min_bbox == 20
    assert c.session.cursor_step == 10
    assert c.session.cursor_fast_step == 50
    # main.rs:32
    assert c.capture.device == "/dev/video21"
    # timing_stats.rs windows; pipeline_ir.rs print cadence
    assert c.telemetry.window == 120 and c.telemetry.print_every == 60


def test_model_derived_sizes():
    m = ModelConfig()
    assert m.feat_size == 16
    assert m.template_feat_size == 8
    assert m.num_template_tokens == 64
    assert m.num_search_tokens == 256
    assert m.num_tokens == 320


def test_json_roundtrip():
    c = AppConfig()
    c2 = AppConfig.from_json(c.to_json())
    assert c2 == c


def test_config_hashable_for_jit():
    m = ModelConfig()
    hash(m)
    d = {m: 1}
    assert d[ModelConfig()] == 1
