"""gst-launch pipeline-description front-end (media/gst.py).

The reference's media graph IS a GStreamer element chain
(/root/reference/src/pipeline_ir.rs:21-87, pipeline.rs:19-53); these
tests pin that the reference's own pipeline lines parse onto the right
TPU-framework components, plus the failure modes (unknown element, bad
caps, missing source) that must not be silently dropped.
"""

import pytest

from gstreamer_vit_tracker_tpu.media.gst import parse_launch

# The active IR pipeline, verbatim semantics of pipeline_ir.rs:21-87.
REFERENCE_IR = (
    "v4l2src device=/dev/video21 io-mode=4 do-timestamp=true ! "
    "video/x-raw,format=YUY2,width=640,height=512,framerate=60/1 ! "
    "videoconvert n-threads=4 ! video/x-raw,format=RGB ! identity ! "
    "rgaconvert ! video/x-raw,format=RGB,width=1280,height=1024 ! "
    "queue max-size-buffers=3 leaky=downstream ! "
    "kmssink sync=false connector-id=231 plane-id=72"
)

# The legacy NV12/1080p pipeline, pipeline.rs:19-53.
REFERENCE_LEGACY = (
    "v4l2src device=/dev/video21 ! "
    "video/x-raw,format=NV12,width=1920,height=1080,framerate=60/1 ! "
    "identity ! queue max-size-buffers=3 leaky=2 ! kmssink sync=false"
)


def test_reference_ir_pipeline_parses():
    spec = parse_launch(REFERENCE_IR)
    assert spec.source == "v4l2"
    assert spec.device == "/dev/video21"
    # Capture caps (the first caps segment): YUY2 640x512@60. The RGB
    # caps AFTER videoconvert describe the reference's CPU-converted
    # probe layout (pipeline_ir.rs:46-55); here conversion is fused into
    # the on-device preprocess, so ingest keeps the CAPTURE format.
    assert spec.fmt == "yuy2"
    assert any("intermediate caps format RGB" in n for n in spec.notes)
    assert (spec.width, spec.height, spec.fps) == (640, 512, 60)
    # Display caps (after rgaconvert): 1280x1024.
    assert (spec.display_width, spec.display_height) == (1280, 1024)
    assert spec.display
    assert spec.sink_props["connector-id"] == "231"
    assert spec.sink_props["plane-id"] == "72"
    # Queue semantics: depth 3, leaky downstream (pipeline_ir.rs:75-78).
    assert spec.queue_buffers == 3 and spec.queue_leaky
    assert spec.has_probe


def test_first_format_bearing_caps_wins():
    # Geometry may be refined by later pre-scaler caps, but the ingest
    # format is pinned by the first format-bearing caps segment.
    spec = parse_launch(
        "videotestsrc ! video/x-raw,format=NV12,width=640,height=512 ! "
        "videoconvert ! video/x-raw,format=RGB,width=320,height=256 ! "
        "fakesink")
    assert spec.fmt == "nv12"
    assert (spec.width, spec.height) == (320, 256)


def test_reference_legacy_pipeline_parses():
    spec = parse_launch(REFERENCE_LEGACY)
    assert spec.fmt == "nv12"
    assert (spec.width, spec.height, spec.fps) == (1920, 1080, 60)
    assert spec.queue_leaky          # leaky=2 is GST_QUEUE_LEAK_DOWNSTREAM
    assert spec.display
    assert spec.display_width is None


def test_videotestsrc_and_record_chain():
    spec = parse_launch(
        "videotestsrc ! video/x-raw,format=NV12,width=320,height=256,"
        "framerate=30/1 ! identity ! y4menc ! filesink location=out.y4m")
    assert spec.source == "synthetic"
    assert spec.fmt == "nv12"
    assert spec.fps == 30
    assert spec.record_path == "out.y4m"
    assert not spec.display


def test_filesrc_decodebin():
    spec = parse_launch("filesrc location=clip.y4m ! decodebin ! "
                        "identity ! fakesink")
    assert spec.source == "file"
    assert spec.input_path == "clip.y4m"
    assert not spec.display


def test_capsfilter_element_form_and_typed_fields():
    spec = parse_launch(
        'videotestsrc ! capsfilter caps="video/x-raw,format=(string)YUY2,'
        'width=(int)640,height=(int)512" ! fakesink')
    assert spec.fmt == "yuy2" and (spec.width, spec.height) == (640, 512)


@pytest.mark.parametrize("desc,frag", [
    ("v4l2src ! weirdelement ! fakesink", "unsupported element"),
    ("fakesink", "no source"),
    ("videotestsrc ! audio/x-raw,rate=48000 ! fakesink", "media type"),
    ("videotestsrc ! video/x-raw,format=I420 ! fakesink", "format"),
    ("filesrc ! fakesink", "location"),
    ("videotestsrc ! y4menc", "filesink"),
    ("videotestsrc ! videotestsrc ! fakesink", "multiple sources"),
    ("videotestsrc !! fakesink", "empty"),
])
def test_rejects_unmappable(desc, frag):
    with pytest.raises(ValueError, match=frag):
        parse_launch(desc)


def test_apply_maps_display_sink_to_preview():
    import argparse

    from gstreamer_vit_tracker_tpu.media.gst import apply_to_args

    ns = argparse.Namespace(source="synthetic", device="", input="",
                            fmt="rgb", width=0, height=0, fps=0, record="",
                            display_scale=False, preview=-1)
    apply_to_args(parse_launch(REFERENCE_IR), ns)
    assert ns.preview == 0          # kmssink -> live MJPEG preview
    assert ns.display_scale         # rgaconvert + display caps
    ns.preview = 7300               # explicit --preview wins
    apply_to_args(parse_launch(REFERENCE_IR), ns)
    assert ns.preview == 7300
    ns.preview = -1
    apply_to_args(parse_launch(
        "videotestsrc ! identity ! fakesink"), ns)
    assert ns.preview == -1         # fakesink stays headless


def test_app_runs_from_gst_description(tmp_path):
    """End to end: one --gst string configures source, format, geometry
    and recording; the app tracks headlessly and writes the y4m."""
    from gstreamer_vit_tracker_tpu.app import main as app_main

    out = tmp_path / "trk.y4m"
    rc = app_main.main([
        "--gst",
        "videotestsrc ! video/x-raw,format=NV12,width=320,height=256,"
        f"framerate=30/1 ! identity ! y4menc ! filesink location={out}",
        "--headless", "--frames", "6", "--no-pace", "--cpu",
    ])
    assert rc == 0
    data = out.read_bytes()
    assert data.startswith(b"YUV4MPEG2")
    assert data.count(b"FRAME") == 6


def test_app_rejects_bad_gst_description():
    from gstreamer_vit_tracker_tpu.app import main as app_main

    with pytest.raises(SystemExit):
        app_main.main(["--gst", "videotestsrc ! nosuchelement ! fakesink",
                       "--headless", "--frames", "1", "--cpu"])


def test_image_jpeg_caps_select_mjpeg_capture():
    spec = parse_launch(
        "v4l2src device=/dev/video0 ! "
        "image/jpeg,width=1280,height=720,framerate=30/1 ! jpegdec ! "
        "identity ! fakesink")
    assert spec.source == "v4l2"
    assert spec.v4l2_pixfmt == "mjpeg"
    assert spec.fmt == "rgb"                 # decoded before preprocess
    assert (spec.width, spec.height, spec.fps) == (1280, 720, 30)


@pytest.mark.parametrize("desc,frag", [
    ("v4l2src ! video/x-raw,format=YUY2 ! videoscale ! image/jpeg ! "
     "fakesink", "capture mode"),
    ("v4l2src ! video/x-raw,format=YUY2 ! image/jpeg ! fakesink",
     "capture caps"),
])
def test_image_jpeg_caps_misuse_rejected(desc, frag):
    with pytest.raises(ValueError, match=frag):
        parse_launch(desc)
