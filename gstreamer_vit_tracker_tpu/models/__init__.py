"""Model family: ViT backbone, VitTrack heads, weight persistence."""

from . import heads, import_onnx, vit, vittrack, weights  # noqa: F401
from .vittrack import TrackMaps, forward, init_params, embed_template  # noqa: F401
