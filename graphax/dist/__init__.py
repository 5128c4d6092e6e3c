"""graphax.dist — mesh/sharding, graph partitioning, halo exchange.

The reference's only parallelism is single-process `nn.DataParallel`
(SURVEY §2.8); this layer is new capability designed for TPU pods:

- :mod:`mesh` — `jax.sharding.Mesh` construction over {data, graph} axes;
  single chip degrades to a trivial mesh.
- :mod:`partition` — host-side edge partitioner: contiguous node blocks,
  owner-computes edge assignment (edges live with the shard that owns their
  aggregation row), per-peer static halo index tables.
- :mod:`sharded` — `shard_map` SpMM/diffusion with two interchangeable
  communication strategies: full `all_gather` of node features (baseline,
  bandwidth N·D) and ragged-static halo `all_to_all` (bandwidth = boundary
  size); plus psum-reduced metrics so early-stop works across shards.
- :mod:`data_parallel` — replicated-model batch parallelism with psum
  gradient reduction (the multimodal workload).
"""

from graphax.dist.mesh import make_mesh, local_mesh
from graphax.dist.partition import EdgePartition, partition_graph
from graphax.dist.sharded import (
    sharded_spmm_allgather, sharded_spmm_halo, sharded_spmm_windowed,
    make_sharded_diffusion_step,
)
from graphax.dist.data_parallel import make_dp_train_step
from graphax.dist.sharded_attention import (
    make_sharded_attention_rhs, distributed_masked_quantile,
    sharded_knn_candidates,
)
from graphax.dist.train_step import make_sharded_grand_trainer
from graphax.dist.model import make_sharded_gnn, normalized_partition
from graphax.dist.trainer import DistTrainer
from graphax.dist.multihost import (
    init_distributed, global_mesh, process_shard_ids, feed_process_local,
    dcn_block_order,
)

__all__ = [
    "make_mesh", "local_mesh", "EdgePartition", "partition_graph",
    "sharded_spmm_allgather", "sharded_spmm_halo", "sharded_spmm_windowed",
    "make_sharded_diffusion_step", "make_dp_train_step",
    "make_sharded_attention_rhs", "distributed_masked_quantile",
    "sharded_knn_candidates", "make_sharded_grand_trainer",
    "make_sharded_gnn", "normalized_partition", "DistTrainer",
    "init_distributed", "global_mesh", "process_shard_ids",
    "feed_process_local", "dcn_block_order",
]
