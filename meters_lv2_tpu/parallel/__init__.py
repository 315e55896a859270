from . import mesh, r128_sharded, timepar  # noqa: F401
from .mesh import make_mesh, shard_batch, shard_time  # noqa: F401
