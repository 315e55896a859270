from . import (  # noqa: F401
    mesh,
    pipeline,
    r128_sharded,
    spectrum_sharded,
    timepar,
)
from .mesh import make_mesh, shard_batch, shard_time  # noqa: F401
