"""Device mesh, sharding rules, and multi-chip serving."""

from . import mesh, serving, sharding  # noqa: F401
from .mesh import DATA_AXIS, MODEL_AXIS, factor_mesh, make_mesh  # noqa: F401
from .serving import ShardedStreamTracker  # noqa: F401
from .sharding import shard_batch, shard_params  # noqa: F401
