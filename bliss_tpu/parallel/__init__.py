from bliss_tpu.parallel.mesh import (
    analysis_mesh,
    analyze_sharded,
    analyze_sharded_async,
    shard_batch,
    sharded_distance_topk,
)
from bliss_tpu.parallel.distributed import init_distributed, pod_mesh

__all__ = [
    "analysis_mesh",
    "analyze_sharded",
    "analyze_sharded_async",
    "shard_batch",
    "sharded_distance_topk",
    "init_distributed",
    "pod_mesh",
]
