"""Graph compute ops: directional message passing, residual losses, metrics.

TPU-first design notes
----------------------
The hot op is edge gather → concat → 2-layer MLP → scatter-add.  The default
path here expresses it as ``take`` + dense matmul + ``segment_sum``, which XLA
fuses well on TPU (the gathers and the scatter-add are the only non-matmul
pieces; the MLP runs on the MXU as one tall-skinny GEMM over all edges).
``psignn_tpu.kernels`` provides a fused Pallas implementation for the same
contract; this module is the reference/fallback and the CPU test oracle.

Reference semantics being reproduced:
* ``Phi_to``  — aggregate at ``edge_index[1]`` with x_i = receiver feats
  (PyG flow='source_to_target', psignn/model.py:334-350)
* ``Phi_from``— aggregate at ``edge_index[0]`` with x_i = sender feats
  (flow='target_to_source', psignn/model.py:352-368)
* self-loops removed for message passing only (model.py:342)
* SpMV residual keeps the diagonal (model.py:157-167)
"""

from __future__ import annotations

import os
from typing import List

import jax
import jax.numpy as jnp

from .graphs import PaddedGraph
from .nn import Params, mlp_apply

USE_PALLAS_MP = os.environ.get("PSIGNN_TPU_PALLAS", "0") == "1"


def gather_concat(h: jax.Array, graph: PaddedGraph, direction: str) -> jax.Array:
    """(E, 2D+edge_dim) per-edge MLP input ``[x_i, x_j, edge_attr]``."""
    if direction == "to":
        xi = jnp.take(h, graph.receivers, axis=0)
        xj = jnp.take(h, graph.senders, axis=0)
    elif direction == "from":
        xi = jnp.take(h, graph.senders, axis=0)
        xj = jnp.take(h, graph.receivers, axis=0)
    else:
        raise ValueError(direction)
    return jnp.concatenate([xi, xj, graph.edge_attr], axis=-1)


def message_passing(mlp_params: List[Params], h: jax.Array,
                    graph: PaddedGraph, direction: str) -> jax.Array:
    """One directional message-passing aggregation (Phi_to / Phi_from).

    Messages on self-loop or padded edges are masked to zero before the
    segment sum, making them exact no-ops.  When the graph carries fused-
    kernel edge packings and PSIGNN_TPU_PALLAS=1, dispatches to the Pallas
    MXU kernel (psignn_tpu.kernels) instead of take+segment_sum.
    """
    blocks = (graph.mp_blocks_to if direction == "to"
              else graph.mp_blocks_from)
    if USE_PALLAS_MP and blocks is not None and len(mlp_params) == 2:
        from .kernels import fused_message_passing
        return fused_message_passing(mlp_params, h, blocks,
                                     latent_dim=h.shape[-1])
    feats = gather_concat(h, graph, direction)
    msg = mlp_apply(mlp_params, feats)
    msg = msg * graph.mp_edge_mask[:, None].astype(msg.dtype)
    agg_index = graph.receivers if direction == "to" else graph.senders
    return jax.ops.segment_sum(msg, agg_index, num_segments=graph.n_node_cap)


def spmv(graph: PaddedGraph, u: jax.Array) -> jax.Array:
    """(N, 1) sparse ``A @ u`` over COO edges (incl. diagonal).

    Matches ``SparseTensor(row, col, a_ij).matmul(u)`` in
    psignn/model.py:157-165: out[i] = sum_j A[i,j] u[j].
    """
    vals = graph.a_ij * jnp.take(u, graph.receivers, axis=0)
    vals = vals * graph.edge_mask[:, None].astype(u.dtype)
    return jax.ops.segment_sum(vals, graph.senders, num_segments=graph.n_node_cap)


def masked_mean(x: jax.Array, mask: jax.Array, count=None) -> jax.Array:
    """Mean of ``x`` over rows where ``mask`` (N,) is True, all columns.

    ``count`` overrides the denominator (true element count); the reference
    divides by the unpadded tensor size, so callers pass
    ``graph.total_nodes * width``.
    """
    m = mask.astype(x.dtype)[:, None] if mask.ndim == 1 else mask.astype(x.dtype)
    total = jnp.sum(x * m)
    denom = jnp.sum(m) * (x.shape[-1] if mask.ndim == 1 else 1)
    if count is not None:
        denom = count
    return total / denom


def mse_masked(a: jax.Array, b: jax.Array, mask: jax.Array) -> jax.Array:
    """MSE over real rows (torch ``nn.MSELoss`` on unpadded data)."""
    return masked_mean(jnp.square(a - b), mask)


def residual_loss(u: jax.Array, graph: PaddedGraph) -> jax.Array:
    """mean((A u - b)^2) over real nodes (psignn/model.py:157-167)."""
    r = spmv(graph, u) - graph.b
    return mse_masked(r, jnp.zeros_like(r), graph.node_mask)


def residual_per_graph(u: jax.Array, graph: PaddedGraph) -> jax.Array:
    """(G,) per-graph mean squared residual, for eval tables
    (test_func.py:26-66 computes metrics per sample)."""
    r = jnp.square(spmv(graph, u) - graph.b)[:, 0]
    r = r * graph.node_mask.astype(r.dtype)
    sums = jax.ops.segment_sum(r, graph.graph_id, num_segments=graph.num_graphs + 1)
    return sums[: graph.num_graphs] / graph.n_nodes.astype(r.dtype)


def mse_per_graph(a: jax.Array, b: jax.Array, graph: PaddedGraph) -> jax.Array:
    d = jnp.square(a - b)[:, 0] * graph.node_mask.astype(a.dtype)
    sums = jax.ops.segment_sum(d, graph.graph_id, num_segments=graph.num_graphs + 1)
    return sums[: graph.num_graphs] / graph.n_nodes.astype(a.dtype)


def mse_masked_stacked(A: jax.Array, b: jax.Array, mask: jax.Array) -> jax.Array:
    """(k,) MSE per leading slice: A (k, N, w) vs b (N, w) over mask rows."""
    m = (mask.astype(A.dtype)[:, None] if mask.ndim == 1
         else mask.astype(A.dtype))
    num = jnp.sum(jnp.square(A - b[None]) * m[None], axis=(1, 2))
    return num / (jnp.sum(m) * (A.shape[-1] if mask.ndim == 1 else 1))


def residual_loss_stacked(U: jax.Array, graph: PaddedGraph) -> jax.Array:
    """(k,) mean((A u_t − b)²): the k per-iteration residuals of an unrolled
    model in ONE gather/segment-sum sweep with k channels.

    The per-iteration formulation (k separate (E, 1) sweeps, reference
    dsgps/model.py:97) is scatter-launch-bound on TPU; stacking the iterates
    as channels amortizes it k-fold for identical math."""
    u2 = U[..., 0].T                                        # (N, k)
    vals = graph.a_ij * jnp.take(u2, graph.receivers, axis=0)
    vals = vals * graph.edge_mask[:, None].astype(u2.dtype)
    Au = jax.ops.segment_sum(vals, graph.senders,
                             num_segments=graph.n_node_cap)  # (N, k)
    r = (Au - graph.b).T[..., None]                          # (k, N, 1)
    return mse_masked_stacked(r, jnp.zeros((graph.n_node_cap, 1), r.dtype),
                              graph.node_mask)


def dss_residual_loss_stacked(U: jax.Array, graph: PaddedGraph) -> jax.Array:
    """(k,) BC-encoded residuals (dss/model.py:129-148) in one stacked sweep
    (see ``residual_loss_stacked``)."""
    B0 = graph.b_prime[:, 0:1]
    B1 = graph.b_prime[:, 1:2]
    B2 = graph.b_prime[:, 2:3]
    u2 = U[..., 0].T                                        # (N, k)
    u_i = jnp.take(u2, graph.senders, axis=0)
    u_j = jnp.take(u2, graph.receivers, axis=0)
    f_bar = graph.a_ij * (u_j - u_i)
    f_bar = f_bar * graph.edge_mask[:, None].astype(u2.dtype)
    f_sum = jax.ops.segment_sum(f_bar, graph.senders,
                                num_segments=graph.n_node_cap)  # (N, k)
    p1 = (1.0 - B1) * (-B0) + B1 * (u2 - B2)
    res = (p1 + f_sum).T[..., None]                          # (k, N, 1)
    return mse_masked_stacked(res, jnp.zeros((graph.n_node_cap, 1), res.dtype),
                              graph.node_mask)


def dss_residual_vector(u: jax.Array, graph: PaddedGraph) -> jax.Array:
    """Per-node BC-encoded residual (dss/model.py:129-148).

    b_prime = [B0, B1, B2]: interior rows (B1=0) contribute ``-B0 + sum_j
    a_ij (u_j - u_i)``; Dirichlet rows (B1=1) contribute ``(u - B2)`` (a_ij is
    the off-diagonal-only A', so the flux sum vanishes there).
    """
    B0 = graph.b_prime[:, 0:1]
    B1 = graph.b_prime[:, 1:2]
    B2 = graph.b_prime[:, 2:3]
    p1 = (1.0 - B1) * (-B0) + B1 * (u - B2)
    u_i = jnp.take(u, graph.senders, axis=0)
    u_j = jnp.take(u, graph.receivers, axis=0)
    f_bar = graph.a_ij * (u_j - u_i)
    f_bar = f_bar * graph.edge_mask[:, None].astype(u.dtype)
    f_sum = jax.ops.segment_sum(f_bar, graph.senders, num_segments=graph.n_node_cap)
    return p1 + f_sum


def dss_residual_loss(u: jax.Array, graph: PaddedGraph) -> jax.Array:
    """Mean-square of the BC-encoded residual (dss/model.py:129-148)."""
    res = dss_residual_vector(u, graph)
    return mse_masked(res, jnp.zeros_like(res), graph.node_mask)
