"""Central configuration for the TPU-native ViT tracker framework.

The reference application hard-codes every constant (camera device, capture
geometry, thresholds, queue depths; see /root/reference/src/main.rs:25,32,
pipeline_ir.rs:27-30,75-84, tracker_context.rs:93,122,144, and
selection_state.rs:21-45).  SURVEY.md §5 mandates lifting exactly those
constants into a config layer — this module is that layer.

Everything is a frozen dataclass so configs are hashable and can be closed
over by ``jax.jit`` without retracing surprises.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class CaptureConfig:
    """Camera / frame-source geometry.

    Mirrors the active IR pipeline caps (reference pipeline_ir.rs:27-41:
    YUY2 640x512@60) and the legacy NV12 1080p pipeline (pipeline.rs:26-37).
    """

    device: str = "/dev/video21"          # main.rs:32
    width: int = 640                       # pipeline_ir.rs:27
    height: int = 512                      # pipeline_ir.rs:28
    fps: int = 60                          # pipeline_ir.rs:39
    pixel_format: str = "RGB"              # format delivered to the tracker
    # Legacy pipeline variant (pipeline.rs:26-27)
    legacy_width: int = 1920
    legacy_height: int = 1080
    legacy_format: str = "NV12"


@dataclasses.dataclass(frozen=True)
class DisplayConfig:
    """Display sink geometry (reference pipeline_ir.rs:29-30, 64-84)."""

    width: int = 1280
    height: int = 1024
    connector_id: int = 231                # pipeline_ir.rs:82
    plane_id: int = 72                     # pipeline_ir.rs:83
    vsync: bool = False                    # kmssink sync=false (pipeline_ir.rs:81)


@dataclasses.dataclass(frozen=True)
class QueueConfig:
    """Bounded, drop-oldest frame queue (pipeline_ir.rs:75-78:
    ``max-size-buffers=3, leaky=downstream``)."""

    max_buffers: int = 3
    leaky: str = "downstream"


@dataclasses.dataclass(frozen=True)
class SessionConfig:
    """Tracking-session state machine constants.

    score_threshold   — accept/keep threshold (tracker_context.rs:93,122)
    lost_frames_max   — auto-reset counter bound; the reference resets when
                        the Lost counter *exceeds* 60, i.e. on the 62nd lost
                        frame (tracker_context.rs:144-151)
    min_bbox          — minimum selection box edge (selection_state.rs:42-43)
    cursor_step       — normal cursor step px (selection_state.rs:28)
    cursor_fast_step  — fast cursor step px (selection_state.rs:29)
    """

    score_threshold: float = 0.25
    lost_frames_max: int = 60
    min_bbox: int = 20
    cursor_step: int = 10
    cursor_fast_step: int = 50


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """VitTrack model hyper-parameters.

    The reference outsources inference to OpenCV Zoo's
    ``object_tracking_vittrack_2023sep`` model running on a Rockchip NPU
    (reference main.rs:25, Cargo.lock:923-938).  That model is an
    OSTrack-style one-stream tracker: template and search crops are
    patch-embedded, concatenated, run through a ViT encoder, and the search
    tokens feed score/offset/size heads decoded with a hanning-window
    penalty.  We re-implement that architecture TPU-natively.

    Defaults follow the deit-tiny class backbone commonly used by the
    lightweight VitTrack/OSTrack family.
    """

    template_size: int = 128        # template crop resolution (Hz = Wz)
    search_size: int = 256          # search crop resolution (Hx = Wx)
    patch_size: int = 16
    embed_dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: float = 4.0
    template_factor: float = 2.0    # context amount around bbox for template
    search_factor: float = 4.0      # context amount around bbox for search
    head_mode: str = "conv"         # "conv" (learned) | "corr" (training-free)
    # Hanning-penalty formula for the decode.  "interior" (default) is
    # MEASURED to be exactly the window cv2.TrackerVit multiplies into the
    # conf map (compat/cv2vit.py; gate tests/test_cv2_replica.py), so the
    # shipped default is the reference-exact decode.  "opencv" matches
    # cv2.createHanningWindow bit-for-bit (zero border cells) — a formula
    # TrackerVit turns out NOT to use.  See models/heads.py::hanning_2d.
    hann_mode: str = "interior"
    # Normalisation applied after /255 (ImageNet stats).
    norm_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    norm_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    dtype: str = "bfloat16"         # compute dtype on TPU
    # Online template update (BASELINE.json config 3).
    template_update_enabled: bool = False
    template_update_threshold: float = 0.7
    template_update_interval: int = 25
    # Blend weight kept on the *initial* template during an online update
    # (the rest goes to the fresh embedding).  1.0 disables adaptation;
    # 0.0 is a pure re-capture (drift-prone).
    template_update_anchor: float = 0.35
    # Static band (px) sliced around the crop window before the resample
    # matmuls — bounds preprocess cost by the band, not the frame size
    # (ops/preprocess.py::band_origin).  None disables banding; windows
    # larger than the band fade to zero padding at the fringe.
    preprocess_band: Optional[int] = 1152
    # Below this confidence the tracker FREEZES its carried bbox (search
    # window + size) instead of following the decoded peak: during a full
    # occlusion the maps are noise and following them walks the search
    # window away from where the target will reappear.  Matches the
    # session machine's Lost threshold (tracker_context.rs:122) so the
    # window holds exactly while the session counts lost frames, enabling
    # re-acquisition when the occluder passes.  0.0 restores the
    # always-follow behaviour (what cv2's TrackerVit does internally).
    window_freeze_threshold: float = 0.25
    # Max per-frame relative size change of the tracked box (0 disables).
    # Periodic textures (lattices, halftone dots, fences) correlate at
    # many shifts, letting the size head enter a window-growth feedback
    # loop (measured on the independent eval world: 48 -> 294 px in ~20
    # frames, confidently tracking the lattice afterwards).  Legitimate
    # dynamics are far below this: the 0.5x-2x in-family scale sweep
    # peaks at ~1.5%/frame.  cv2's TrackerVit has no such clamp — this is
    # a deliberate robustness extension, like the window freeze above.
    size_rate_limit: float = 0.25
    # Size is a slow, high-confidence quantity: below this confidence the
    # box SIZE holds its previous value while position keeps updating
    # (0 disables).  Sits between window_freeze_threshold (full freeze,
    # 0.25) and normal tracking: the lattice-balloon pathology above rides
    # exactly this half-confident band (measured conf 0.04-0.51 while the
    # box grew 48 -> 300 px), whereas every legitimate size change in the
    # scenario suite happens at conf >= 0.8.  Another deliberate extension
    # over cv2's TrackerVit.
    size_conf_freeze: float = 0.5
    # Re-detection ramp: with the window frozen in place, each consecutive
    # low-confidence frame multiplies the search-window factor by
    # ``lost_window_growth`` (capped at ``lost_window_max_growth``x) so a
    # target that drifted while occluded is still inside the window when
    # it reappears.  1.12^13 ~= 4x: after ~13 hidden frames the window
    # covers 4x the normal context (a 40 px target's window grows to
    # ~540 px — a fast target that drifted ~250 px during a 40-frame
    # occlusion is still inside; measured on the eval scenario).  1.0
    # disables the ramp.
    lost_window_growth: float = 1.12
    lost_window_max_growth: float = 4.0
    # Multi-object exclusive slots (tracker/multi.py): two slots whose
    # decoded boxes overlap beyond this IoU are treated as one target
    # claimed twice — the lower-confidence slot reverts to its previous
    # box and enters the lost/re-detection path.  Only consulted when a
    # batched update is called with exclusive=True.
    exclusive_overlap_threshold: float = 0.6

    @property
    def feat_size(self) -> int:
        """Side of the search feature map (e.g. 256/16 = 16)."""
        return self.search_size // self.patch_size

    @property
    def template_feat_size(self) -> int:
        return self.template_size // self.patch_size

    @property
    def num_template_tokens(self) -> int:
        return self.template_feat_size ** 2

    @property
    def num_search_tokens(self) -> int:
        return self.feat_size ** 2

    @property
    def num_tokens(self) -> int:
        return self.num_template_tokens + self.num_search_tokens


@dataclasses.dataclass(frozen=True)
class TelemetryConfig:
    """Rolling perf-stats window and print cadence
    (timing_stats.rs:18-34 uses 120-sample windows; pipeline_ir.rs:210 prints
    every 60 frames)."""

    window: int = 120
    print_every: int = 60
    hud_enabled: bool = True


@dataclasses.dataclass(frozen=True)
class AppConfig:
    """Top-level application config bundling all subsystems."""

    capture: CaptureConfig = CaptureConfig()
    display: DisplayConfig = DisplayConfig()
    queue: QueueConfig = QueueConfig()
    session: SessionConfig = SessionConfig()
    model: ModelConfig = ModelConfig()
    telemetry: TelemetryConfig = TelemetryConfig()
    model_path: str = ""   # optional checkpoint to load (main.rs:25 analog)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(text: str) -> "AppConfig":
        raw = json.loads(text)
        return AppConfig(
            capture=CaptureConfig(**raw.get("capture", {})),
            display=DisplayConfig(**raw.get("display", {})),
            queue=QueueConfig(**raw.get("queue", {})),
            session=SessionConfig(**raw.get("session", {})),
            model=ModelConfig(**{k: tuple(v) if isinstance(v, list) else v
                                 for k, v in raw.get("model", {}).items()}),
            telemetry=TelemetryConfig(**raw.get("telemetry", {})),
            model_path=raw.get("model_path", ""),
        )

    def replace(self, **kwargs: Any) -> "AppConfig":
        return dataclasses.replace(self, **kwargs)


DEFAULT = AppConfig()
