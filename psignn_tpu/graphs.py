"""Fixed-shape batched mesh graphs for XLA.

The reference represents each linear system ``A u = b`` as a PyTorch-Geometric
``Data`` object (one ragged graph per sample) and batches by concatenation
(``dirichlet/psignn/utilities/reader.py:112-116``).  XLA requires static
shapes, so this module batches by *concatenation + padding to bucketed
capacities*: all node arrays are padded to ``n_node_cap`` rows and all edge
arrays to ``n_edge_cap`` rows, with boolean masks making padded rows exact
no-ops in every downstream op (message passing, SpMV residual, losses, and
solver residual norms).

Conventions
-----------
* ``senders[e], receivers[e]`` are the COO row/col of the ``e``-th nonzero of
  ``A`` (the reference builds ``edge_index`` from ``scipy.sparse.find``,
  reader.py:82-85), so ``A[senders[e], receivers[e]] = a_ij[e]``.
* Padded edges have ``senders = receivers = 0`` and ``edge_mask = False``;
  padded nodes have ``node_mask = False`` and ``graph_id = num_graphs`` (an
  extra, ignored segment).
* All float features on padded rows are zero, and models must keep them zero
  (mask the update function output) so global residual norms match an
  unpadded computation bit-for-bit.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bucket_size(n: int, multiple: int = 256, min_size: int = 256) -> int:
    """Round ``n`` up to a bucket capacity to limit jit recompiles.

    Buckets are multiples of ``multiple`` up to 4096 and multiples of 1024
    above that — coarse enough to keep the number of distinct compiled
    shapes small across a mesh-size sweep, fine enough that padding never
    exceeds ~9 % of live rows (the previous power-of-two buckets above 4 k
    cost up to +47 % node-array and Broyden rank-buffer HBM traffic on the
    11 k-node headline mesh).
    """
    n = max(n, min_size)
    if n <= 4096:
        return _round_up(n, multiple)
    return _round_up(n, 1024)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PaddedGraph:
    """A batch of mesh graphs packed into fixed-shape arrays.

    Node arrays have leading dim ``n_node_cap``; edge arrays ``n_edge_cap``.
    Field set mirrors the union of the reference readers
    (psignn ``reader.py:112-116``, dss ``dss/utilities/reader.py:89-93``,
    mixed ``mixed/psignn/utilities/reader.py:118-124``); unused fields are
    None for a given model family.
    """

    # --- node data ---
    x: jax.Array                 # (N, 1) initial condition (0 interior, b on Dirichlet)
    b: jax.Array                 # (N, 1) RHS of A u = b   (reference `y`)
    sol: jax.Array               # (N, 1) FEM ground truth (report-only)
    prb_data: jax.Array          # (N, 2|3) normalized problem data [f, g(, h)]
    tags: jax.Array              # (N, 1) binary or (N, 3) one-hot node type
    pos: jax.Array               # (N, 2) vertex coordinates
    node_mask: jax.Array         # (N,) bool, True for real nodes
    graph_id: jax.Array          # (N,) int32 segment id; padded rows = num_graphs

    # --- edge data (COO over nonzeros of A, destination unsorted) ---
    senders: jax.Array           # (E,) int32 row index i
    receivers: jax.Array         # (E,) int32 col index j
    a_ij: jax.Array              # (E, 1) matrix value A[i, j]
    edge_attr: jax.Array         # (E, 3) normalized [dx, dy, |d|]
    edge_mask: jax.Array         # (E,) bool, True for real edges

    # --- per-graph counts ---
    n_nodes: jax.Array           # (G,) int32 true node counts
    n_edges: jax.Array           # (G,) int32 true edge counts

    # --- optional per-family extras ---
    b_prime: Optional[jax.Array] = None        # (N, 3) DSS BC-encoded RHS
    b_prime_norm: Optional[jax.Array] = None   # (N, 3) normalized
    a_ij_norm: Optional[jax.Array] = None      # (E, 1) normalized off-diag values (DSS)
    unit_normal_vector: Optional[jax.Array] = None  # (N, 2) mixed-BC normals

    # --- optional fused-kernel edge packings (psignn_tpu.kernels) ---
    mp_blocks_to: Optional[Any] = None    # MPBlocks, aggregation at receivers
    mp_blocks_from: Optional[Any] = None  # MPBlocks, aggregation at senders

    # --- static metadata ---
    num_graphs: int = dataclasses.field(metadata=dict(static=True), default=1)

    @property
    def n_node_cap(self) -> int:
        return self.x.shape[0]

    @property
    def n_edge_cap(self) -> int:
        return self.senders.shape[0]

    @property
    def total_nodes(self) -> jax.Array:
        """True (unpadded) node count across the batch."""
        return jnp.sum(self.n_nodes)

    @property
    def fnode_mask(self) -> jax.Array:
        return self.node_mask.astype(self.x.dtype)[:, None]

    @property
    def mp_edge_mask(self) -> jax.Array:
        """Edge mask with self-loops removed — message passing always strips
        self-loops (reference ``psignn/model.py:342``) while the SpMV residual
        keeps the diagonal."""
        return self.edge_mask & (self.senders != self.receivers)

    @property
    def dirichlet_mask(self) -> jax.Array:
        """(N, 1) float mask of Dirichlet nodes.

        Dirichlet variant: ``tags == 1`` (model.py:281); mixed variant:
        one-hot column 1 (``mixed/psignn/model.py:218``)."""
        if self.tags.shape[-1] == 1:
            m = self.tags[:, 0] == 1
        else:
            m = self.tags[:, 1] == 1
        return (m & self.node_mask).astype(self.x.dtype)[:, None]

    @property
    def neumann_mask(self) -> jax.Array:
        """(N, 1) float mask of Neumann nodes (mixed variant one-hot col 2,
        ``mixed/psignn/model.py:219``)."""
        if self.tags.shape[-1] != 3:
            raise ValueError("neumann_mask requires 3-column one-hot tags")
        m = (self.tags[:, 2] == 1) & self.node_mask
        return m.astype(self.x.dtype)[:, None]


def batch_graphs(
    samples: Sequence[Dict[str, np.ndarray]],
    n_node_cap: Optional[int] = None,
    n_edge_cap: Optional[int] = None,
    node_multiple: int = 256,
    edge_multiple: int = 1024,
    dtype=np.float32,
    pack_kernel_blocks: bool = False,
    pack_quantized: bool = False,
) -> PaddedGraph:
    """Pack a list of per-sample numpy dicts into one PaddedGraph.

    Each sample dict must provide ``x, b, sol, prb_data, tags, pos,
    senders, receivers, a_ij, edge_attr`` and may provide the optional
    extras. Index arrays are per-sample local; they are offset on concat.
    """
    g = len(samples)
    tot_n = sum(int(s["x"].shape[0]) for s in samples)
    tot_e = sum(int(s["senders"].shape[0]) for s in samples)
    cap_n = n_node_cap or bucket_size(tot_n, node_multiple)
    cap_e = n_edge_cap or bucket_size(tot_e, edge_multiple)
    if cap_n < tot_n or cap_e < tot_e:
        raise ValueError(
            f"caps too small: nodes {tot_n}>{cap_n} or edges {tot_e}>{cap_e}")

    def node_feat(key, width):
        out = np.zeros((cap_n, width), dtype=dtype)
        off = 0
        for s in samples:
            n = s[key].shape[0]
            out[off:off + n] = np.asarray(s[key], dtype=dtype).reshape(n, width)
            off += n
        return out

    def edge_feat(key, width):
        out = np.zeros((cap_e, width), dtype=dtype)
        off = 0
        for s in samples:
            e = s[key].shape[0]
            out[off:off + e] = np.asarray(s[key], dtype=dtype).reshape(e, width)
            off += e
        return out

    has = lambda k: all(k in s and s[k] is not None for s in samples)

    senders = np.zeros((cap_e,), dtype=np.int32)
    receivers = np.zeros((cap_e,), dtype=np.int32)
    edge_mask = np.zeros((cap_e,), dtype=bool)
    node_mask = np.zeros((cap_n,), dtype=bool)
    graph_id = np.full((cap_n,), g, dtype=np.int32)
    n_nodes = np.zeros((g,), dtype=np.int32)
    n_edges = np.zeros((g,), dtype=np.int32)

    noff = eoff = 0
    for i, s in enumerate(samples):
        n = int(s["x"].shape[0])
        e = int(s["senders"].shape[0])
        senders[eoff:eoff + e] = np.asarray(s["senders"], np.int32) + noff
        receivers[eoff:eoff + e] = np.asarray(s["receivers"], np.int32) + noff
        edge_mask[eoff:eoff + e] = True
        node_mask[noff:noff + n] = True
        graph_id[noff:noff + n] = i
        n_nodes[i] = n
        n_edges[i] = e
        noff += n
        eoff += e

    tag_w = int(np.asarray(samples[0]["tags"]).reshape(samples[0]["tags"].shape[0], -1).shape[1])
    prb_w = int(np.asarray(samples[0]["prb_data"]).reshape(samples[0]["prb_data"].shape[0], -1).shape[1])

    mp_to = mp_from = None
    if pack_kernel_blocks:
        from .kernels import pack_mp_blocks
        # dss graphs carry their message-passing edge feature in a_ij_norm
        # (1-dim, dss/utilities/reader.py:89-93); others use edge_attr (3-dim)
        if has("a_ij_norm"):
            ea_for_pack = edge_feat("a_ij_norm", 1)
        else:
            ea_for_pack = edge_feat("edge_attr", 3)
        mp_to = pack_mp_blocks(senders, receivers, ea_for_pack, edge_mask,
                               cap_n, "to", quantize=pack_quantized)
        mp_from = pack_mp_blocks(senders, receivers, ea_for_pack, edge_mask,
                                 cap_n, "from", quantize=pack_quantized)

    return PaddedGraph(
        mp_blocks_to=mp_to,
        mp_blocks_from=mp_from,
        x=jnp.asarray(node_feat("x", 1)),
        b=jnp.asarray(node_feat("b", 1)),
        sol=jnp.asarray(node_feat("sol", 1)),
        prb_data=jnp.asarray(node_feat("prb_data", prb_w)),
        tags=jnp.asarray(node_feat("tags", tag_w)),
        pos=jnp.asarray(node_feat("pos", 2)),
        node_mask=jnp.asarray(node_mask),
        graph_id=jnp.asarray(graph_id),
        senders=jnp.asarray(senders),
        receivers=jnp.asarray(receivers),
        a_ij=jnp.asarray(edge_feat("a_ij", 1)),
        edge_attr=jnp.asarray(edge_feat("edge_attr", 3)),
        edge_mask=jnp.asarray(edge_mask),
        n_nodes=jnp.asarray(n_nodes),
        n_edges=jnp.asarray(n_edges),
        b_prime=jnp.asarray(node_feat("b_prime", 3)) if has("b_prime") else None,
        b_prime_norm=jnp.asarray(node_feat("b_prime_norm", 3)) if has("b_prime_norm") else None,
        a_ij_norm=jnp.asarray(edge_feat("a_ij_norm", 1)) if has("a_ij_norm") else None,
        unit_normal_vector=(jnp.asarray(node_feat("unit_normal_vector", 2))
                            if has("unit_normal_vector") else None),
        num_graphs=g,
    )
