"""Frame IO: sources, sinks, and the bounded drop-oldest queue."""

from . import gst, mjpeg, queue, sink, source  # noqa: F401
from .gst import PipelineSpec, parse_launch  # noqa: F401
from .mjpeg import MJPEGSource  # noqa: F401
from .queue import FrameQueue  # noqa: F401
from .sink import FileSink, MJPEGSink, MultiSink, NullSink  # noqa: F401
from .source import (FileSource, FlakySource, SyntheticSource,  # noqa: F401
                     V4L2Source)
