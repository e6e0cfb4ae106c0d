"""Pallas TPU kernels for the hot graph ops.

The reference's hot path is torch_scatter/torch_sparse CUDA gather→MLP→
scatter-add (SURVEY.md C8/C10).  TPUs have no fast arbitrary gather inside a
kernel, so the TPU-native formulation turns both the gather and the
scatter-add into *block one-hot matmuls on the MXU* over RCM-bandwidth-
limited windows (the FusedMM SDDMM-then-SpMM framing mapped to systolic
hardware):

* edges are sorted by aggregation node and packed per 128-node block,
* x_j rows are fetched by DMA-ing a bandwidth-bounded window of ``h·W1b``
  and multiplying with a {0,1} edge-selection matrix,
* scatter-add is the transposed one-hot matmul into the block's 128 rows.

``ops.message_passing`` (take + segment_sum) remains the portable fallback
and the CPU test oracle.
"""

from .fused_mp import (pack_mp_blocks, fused_message_passing, MPBlocks,
                       rcm_permutation, pad_mp_blocks, unify_mp_block_shapes)
