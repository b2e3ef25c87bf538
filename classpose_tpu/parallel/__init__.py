"""Device-mesh utilities: mesh construction, tile-parallel shard_map
inference, data-parallel training collectives."""

from classpose_tpu.parallel.mesh import (
    enable_compilation_cache,
    get_mesh,
    local_device_count,
)

__all__ = ["enable_compilation_cache", "get_mesh", "local_device_count"]
