"""TPU compute kernels: colorspace, resampling, fused preprocess,
flash attention, and the on-device overlay compositor."""

from . import (attention, colorspace, font, overlay, overlay_nv12,  # noqa: F401
               preprocess, resample)
from .attention import flash_attention, multihead_attention  # noqa: F401

from .colorspace import (  # noqa: F401
    nv12_to_rgb,
    nv12_planes_to_rgb,
    yuy2_to_rgb,
    rgb_from_yuv_f32,
)
from .preprocess import (  # noqa: F401
    CropWindow,
    crop_window,
    preprocess_nv12,
    preprocess_rgb,
)
from .resample import crop_resize, resize_static, sampling_matrix  # noqa: F401
