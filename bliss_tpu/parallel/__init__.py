from bliss_tpu.parallel.mesh import (
    analysis_mesh,
    analyze_sharded,
    shard_batch,
    sharded_distance_topk,
)

__all__ = [
    "analysis_mesh",
    "analyze_sharded",
    "shard_batch",
    "sharded_distance_topk",
]
