"""Device-mesh parallelism.

The reference's only parallelism is single-node replica-per-GPU data
parallelism via ``torch_geometric.nn.DataParallel``
(``dirichlet/psignn/main.py:106``).  Here (SURVEY.md §2.5):

* ``dp`` — data parallelism over batched graphs: shard_map over a 1-D device
  mesh, per-device PaddedGraph shards, gradient/loss ``pmean`` over ICI.
* ``partition`` — single-graph parallelism for large meshes: edges sharded
  across devices, per-device partial aggregation + ``psum`` exchange; the
  graph analog of sequence/context parallelism (SURVEY.md §5.7).
* ``partitioned`` — the composed partitioned Ψ-GNN solve: RCM node shards,
  per-layer ppermute halo exchange, and the fixed-point solver running on
  shards with psum'd global stopping norms.
"""

from .dp import (make_mesh, stack_graphs, shard_stacked, dp_value_and_grad,
                 dp_train_step)
from .partition import partition_message_passing, partition_spmv
from .partitioned import (build_partitioned_graph, make_partitioned_function,
                          make_partitioned_loss, make_partitioned_train_step,
                          partitioned_psignn_inference,
                          partitioned_psignn_inference_dp,
                          stack_partitioned_graphs, unpartition)
