from bliss_tpu.parallel.mesh import (
    analysis_mesh,
    analyze_sharded,
    shard_batch,
    sharded_distance_topk,
)
from bliss_tpu.parallel.distributed import init_distributed, pod_mesh

__all__ = [
    "analysis_mesh",
    "analyze_sharded",
    "shard_batch",
    "sharded_distance_topk",
    "init_distributed",
    "pod_mesh",
]
