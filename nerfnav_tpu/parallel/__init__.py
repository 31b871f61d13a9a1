from nerfnav_tpu.parallel.sharding import (
    make_mesh,
    ray_sharding,
    replicated,
    shard_rays,
)

__all__ = ["make_mesh", "ray_sharding", "replicated", "shard_rays"]
