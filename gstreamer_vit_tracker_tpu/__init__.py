"""gstreamer_vit_tracker_tpu — a TPU-native (JAX/XLA/Pallas) framework with
the capabilities of ``frodik13/gstreamer-vit-tracker``.

The reference (/root/reference) is a Rust GStreamer application running an
interactive single-object ViT tracker on a Rockchip NPU.  This package
re-designs every one of its capabilities TPU-first — see SURVEY.md for the
complete component inventory and the layer-by-layer mapping.

Subpackages
-----------
ops       fused NV12/YUY2 preprocess, MXU resampling, flash attention,
          on-device overlay compositor
models    ViT backbone + VitTrack score/offset/size heads
tracker   functional init/update with HBM-resident TrackState; vmap
          multi-object / multi-stream batching
session   Selecting -> Tracking -> Lost state machine, selection geometry,
          user commands
parallel  device mesh, sharding rules, multi-chip serving/training
train     losses, synthetic data, sharded train step
media     frame sources/sinks and the bounded drop-oldest frame queue
runtime   native C++ frame ring + generators (ctypes bindings)
utils     rolling timing stats, HUD text, logging
app       interactive CLI entry point (keyboard-driven, like the reference)
"""

__version__ = "0.1.0"

from . import config  # noqa: F401
from .config import AppConfig, ModelConfig, SessionConfig  # noqa: F401
