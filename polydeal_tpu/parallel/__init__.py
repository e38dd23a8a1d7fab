from polydeal_tpu.parallel.sharding import (
    make_mesh,
    ShardedSystem,
    shard_block_matrix,
)

__all__ = ["make_mesh", "ShardedSystem", "shard_block_matrix"]
