"""Single-graph partition parallelism: edge-sharded message passing.

The scaling axis of this workload is mesh size (SURVEY.md §5.7): one large
mesh can exceed a single chip's appetite.  The graph analog of
sequence/context parallelism is to shard the *edges* of one graph across the
device mesh: each device gathers/MLPs/aggregates only its own edge shard into
a full-size partial node accumulator, and partials are summed over ICI with
``psum`` — correctness is exact because segment-sum is associative.

Phase 1 (this module) exchanges full node accumulators (an all-reduce).
Phase 2 — spatial node partitioning with neighbor-only ``ppermute`` halo
exchange overlapping local aggregation — is the planned optimization once
multi-chip benchmarking is available (BASELINE.md ≥80 % scaling target).
"""

from __future__ import annotations

from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..nn import mlp_apply


def pad_edges_for_sharding(arrs: dict, n_devices: int) -> dict:
    """Pad 1-D/2-D edge arrays so the edge count divides n_devices.

    Padded entries get mask False and index 0 (no-ops downstream).
    """
    e = arrs["senders"].shape[0]
    pad = (-e) % n_devices
    if pad == 0:
        return dict(arrs)
    out = {}
    for k, v in arrs.items():
        if v.ndim == 1:
            out[k] = np.concatenate([v, np.zeros((pad,), v.dtype)])
        else:
            out[k] = np.concatenate([v, np.zeros((pad,) + v.shape[1:], v.dtype)])
    out["edge_mask"][e:] = False
    return out


def partition_message_passing(mesh: Mesh, axis: str = "x") -> Callable:
    """Build an edge-sharded directional message passing op.

    Returns ``mp(mlp_params, h, senders, receivers, edge_attr, edge_mask,
    direction)`` where the edge arrays are sharded over ``axis`` and
    ``h`` / params are replicated; output is the fully-reduced (N, D)
    aggregation identical to ``ops.message_passing``.
    """

    def mp(mlp_params, h, senders, receivers, edge_attr, edge_mask, direction):
        n_node_cap = h.shape[0]

        def local(p, hh, s, r, ea, em):
            if direction == "to":
                xi, xj, agg = jnp.take(hh, r, axis=0), jnp.take(hh, s, axis=0), r
            else:
                xi, xj, agg = jnp.take(hh, s, axis=0), jnp.take(hh, r, axis=0), s
            feats = jnp.concatenate([xi, xj, ea], axis=-1)
            msg = mlp_apply(p, feats)
            msg = msg * (em & (s != r))[:, None].astype(msg.dtype)
            out = jax.ops.segment_sum(msg, agg, num_segments=n_node_cap)
            return jax.lax.psum(out, axis)

        return shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis)),
            out_specs=P())(mlp_params, h, senders, receivers, edge_attr,
                           edge_mask)

    return mp


def partition_spmv(mesh: Mesh, axis: str = "x") -> Callable:
    """Edge-sharded sparse A @ u (full COO incl. diagonal), psum-reduced."""

    def spmv(u, senders, receivers, a_ij, edge_mask):
        n_node_cap = u.shape[0]

        def local(uu, s, r, a, em):
            vals = a * jnp.take(uu, r, axis=0)
            vals = vals * em[:, None].astype(uu.dtype)
            out = jax.ops.segment_sum(vals, s, num_segments=n_node_cap)
            return jax.lax.psum(out, axis)

        return shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
            out_specs=P())(u, senders, receivers, a_ij, edge_mask)

    return spmv
