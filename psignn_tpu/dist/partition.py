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

from typing import Callable, Optional

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


def _pack_partition_edges(agg: np.ndarray, oth_idx: np.ndarray,
                          ea: np.ndarray, part: np.ndarray,
                          n_parts: int, n_loc: int) -> dict:
    """Pack one edge set into (n_parts, e_cap) rows keyed by the aggregation
    partition.  ``oth_idx`` is the already-localized source index (into the
    local block or the extended window, caller's choice)."""
    counts = np.bincount(part, minlength=n_parts)
    e_cap = max(8, int(-(-counts.max() // 8) * 8))
    agg_l = np.zeros((n_parts, e_cap), np.int32)
    oth_l = np.zeros((n_parts, e_cap), np.int32)
    ea_p = np.zeros((n_parts, e_cap, ea.shape[1]), np.float32)
    mask = np.zeros((n_parts, e_cap), np.float32)
    fill = np.zeros(n_parts, np.int64)
    for e in range(len(agg)):
        p = part[e]
        k = fill[p]
        fill[p] += 1
        agg_l[p, k] = agg[e] - p * n_loc
        oth_l[p, k] = oth_idx[e]
        ea_p[p, k] = ea[e]
        mask[p, k] = 1.0
    return dict(agg_local=agg_l, oth_local=oth_l, edge_attr=ea_p, mask=mask)


def build_halo_partition(senders: np.ndarray, receivers: np.ndarray,
                         edge_attr: np.ndarray, n_nodes: int,
                         n_parts: int, halo: Optional[int] = None,
                         split_interior: bool = False) -> dict:
    """1-D spatial partition with halo metadata for ``halo_message_passing``.

    Nodes must already be RCM-ordered (kernels.rcm_permutation) so that every
    edge connects nodes within ``halo`` positions — then all cross-partition
    edges touch only adjacent partitions and a strip exchange of width
    ``halo`` with the left/right neighbors suffices (the ppermute halo
    exchange of SURVEY.md §5.7, replacing the phase-1 full psum).

    Returns per-partition edge arrays (leading axis ``n_parts``) with
    aggregation indices local to the partition and source indices local to
    the extended window [left halo | local | right halo].

    With ``split_interior=True`` each direction is returned as
    ``{"int": pack, "bnd": pack}``: interior edges (both endpoints in the
    same partition, source indexed into the LOCAL block) and boundary edges
    (source indexed into the extended window).  The split lets the consumer
    start the halo ppermutes, aggregate the interior edges while the
    exchange is in flight, and only then touch the received strips —
    exchange/compute overlap (SURVEY.md §2.5 SP/CP row).
    """
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    bw = int(np.abs(senders - receivers).max()) if len(senders) else 1
    n_loc = -(-n_nodes // n_parts)
    n_loc = -(-n_loc // 8) * 8                 # sublane-friendly chunks
    halo = halo or -(-bw // 8) * 8
    if halo > n_loc:
        raise ValueError(f"halo {halo} exceeds partition size {n_loc}; "
                         "use fewer parts or re-order nodes (RCM)")
    n_pad = n_loc * n_parts

    keep = senders != receivers
    s, r = senders[keep], receivers[keep]
    ea = np.asarray(edge_attr)[keep]

    out = {"n_loc": n_loc, "halo": halo, "n_parts": n_parts,
           "n_nodes_pad": n_pad}
    for direction in ("to", "from"):
        agg = r if direction == "to" else s
        oth = s if direction == "to" else r
        part = agg // n_loc
        ext = oth - (part * n_loc - halo)      # extended-window index
        if len(ext) and not ((ext >= 0) & (ext < n_loc + 2 * halo)).all():
            raise ValueError("edge exceeds halo window; increase halo")
        if split_interior:
            interior = (oth // n_loc) == part
            out[direction] = {
                "int": _pack_partition_edges(
                    agg[interior], (oth - part * n_loc)[interior],
                    ea[interior], part[interior], n_parts, n_loc),
                "bnd": _pack_partition_edges(
                    agg[~interior], ext[~interior], ea[~interior],
                    part[~interior], n_parts, n_loc),
            }
        else:
            out[direction] = _pack_partition_edges(
                agg, ext, ea, part, n_parts, n_loc)
    return out


def halo_message_passing(mesh: Mesh, axis: str = "x") -> Callable:
    """Directional message passing over a halo partition.

    ``mp(mlp_params, h_parts, part, direction)`` where ``h_parts`` is
    (n_parts, n_loc, D) sharded over ``axis`` and ``part`` is the output of
    ``build_halo_partition`` (edge arrays sharded likewise).  Communication
    is two neighbor ``ppermute`` strips of width ``halo`` per call —
    O(halo·D) per device instead of the full psum of the phase-1 path.
    """

    def mp(mlp_params, h_parts, part_edges, n_loc: int, halo: int,
           n_parts: int, direction: str):
        ed = part_edges[direction]

        def local(p, h, agg_l, oth_l, ea, m):
            h = h.reshape(h.shape[1:])          # (n_loc, D)
            agg_l = agg_l.reshape(agg_l.shape[1:])
            oth_l = oth_l.reshape(oth_l.shape[1:])
            ea = ea.reshape(ea.shape[1:])
            m = m.reshape(m.shape[1:])

            # halo exchange: my top strip goes to my right neighbor's left
            # halo; my bottom strip to my left neighbor's right halo.
            fwd = [(i, (i + 1) % n_parts) for i in range(n_parts)]
            bwd = [(i, (i - 1) % n_parts) for i in range(n_parts)]
            left = jax.lax.ppermute(h[-halo:], axis, fwd)   # from left nbr
            right = jax.lax.ppermute(h[:halo], axis, bwd)   # from right nbr
            idx = jax.lax.axis_index(axis)
            left = jnp.where(idx == 0, jnp.zeros_like(left), left)
            right = jnp.where(idx == n_parts - 1,
                              jnp.zeros_like(right), right)
            h_ext = jnp.concatenate([left, h, right], axis=0)

            xi = jnp.take(h, agg_l, axis=0)
            xj = jnp.take(h_ext, oth_l, axis=0)
            feats = jnp.concatenate([xi, xj, ea], axis=-1)
            msg = mlp_apply(p, feats) * m[:, None]
            out = jax.ops.segment_sum(msg, agg_l, num_segments=h.shape[0])
            return out[None]

        P_ = P
        return shard_map(
            local, mesh=mesh,
            in_specs=(P_(), P_(axis), P_(axis), P_(axis), P_(axis), P_(axis)),
            out_specs=P_(axis), check_vma=False)(
                mlp_params, h_parts,
                jnp.asarray(ed["agg_local"]), jnp.asarray(ed["oth_local"]),
                jnp.asarray(ed["edge_attr"]), jnp.asarray(ed["mask"]))

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
