from vector_db_tpu.parallel.mesh import make_mesh, shard_axis
from vector_db_tpu.parallel.sharded import ShardedFlatIndex, ShardedHNSW

__all__ = ["make_mesh", "shard_axis", "ShardedFlatIndex", "ShardedHNSW"]
