"""Dataset readers: reference-format .npy archives → PaddedGraph batches.

Reproduces the six near-identical PyG readers
(``*/{psignn,dsgps,dss}/utilities/reader.py``) as one parameterized loader:

* ``family='psignn'|'dsgps'`` — full system (A incl. diagonal), fields
  x/b/sol/prb_data/tags/pos/edge_attr/a_ij (psignn reader.py:112-116)
* ``family='dss'`` — off-diagonal system A' + BC-encoded b'
  (dss/utilities/reader.py:89-93)
* ``variant='dirichlet'|'mixed'`` — mixed adds unit_normal_vector and 3-col
  one-hot tags (mixed/psignn/utilities/reader.py:118-124)

Normalization constants are the hard-coded reference statistics
(psignn reader.py:73-77, dss reader.py:63-67, mixed reader.py:74-81);
pass ``stats='auto'`` to compute them from the loaded data instead.

Split semantics (quirks preserved):
* psignn/dsgps: sequential 60/20/20 as train | val | test ordered
  [0:.6 | .6:.8 | .8:1] (reader.py:120-121 splits test off first)
* dss: train | test | val ordered [0:.6 | .6:.8 | .8:1]
  (dss reader.py:97-98 splits val off first)
* mixed: shuffled split, seeded (mixed reader.py:128-129 uses shuffle=True)
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np
import scipy.sparse as sp

from ..graphs import PaddedGraph, batch_graphs

# ---- reference normalization constants --------------------------------------

REF_STATS = {
    ("dirichlet", "psignn"): dict(
        prb_mean=[0.0464, -0.0006], prb_std=[9.6267, 3.2935],
        dist_mean=[0.0, 0.0, 0.0655], dist_std=[0.0507, 0.0507, 0.0293],
    ),
    ("dirichlet", "dss"): dict(
        aij_mean=-0.5838, aij_std=0.0924,
        bprime_mean=[0.0002, 0.1435, -0.0006],
        bprime_std=[0.0507, 0.3506, 3.2935],
    ),
    ("mixed", "psignn"): dict(
        prb_mean=[-0.4319, 0.0289, -0.0189], prb_std=[8.4245, 2.1942, 2.8585],
        dist_mean=[0.0, 0.0, 0.0572], dist_std=[0.0445, 0.0443, 0.0258],
        normal_mean=[0.0007, -0.0004], normal_std=[0.2773, 0.2959],
    ),
}
REF_STATS[("dirichlet", "dsgps")] = REF_STATS[("dirichlet", "psignn")]
REF_STATS[("mixed", "dsgps")] = REF_STATS[("mixed", "psignn")]


GraphSample = Dict[str, np.ndarray]


def _load(path_data: str, name: str) -> np.ndarray:
    return np.load(os.path.join(path_data, name + ".npy"), allow_pickle=True)


def _coo(A) -> tuple:
    c = sp.find(A)
    return c[0].astype(np.int32), c[1].astype(np.int32), c[2].astype(np.float32)


def load_dataset(path_data: str, family: str = "psignn",
                 variant: str = "dirichlet",
                 stats: str = "reference",
                 dtype=np.float32) -> List[GraphSample]:
    """Load all samples from a reference-format data directory into
    per-sample numpy dicts ready for ``batch_graphs``."""
    if family in ("psignn", "dsgps"):
        samples = _load_psignn_like(path_data, variant, stats, dtype)
    elif family == "dss":
        samples = _load_dss(path_data, variant, stats, dtype)
    else:
        raise ValueError(family)
    return samples


def _norm_stats(arrs, axis=0):
    stacked = np.vstack(arrs)
    return stacked.mean(axis=axis), stacked.std(axis=axis)


def _load_psignn_like(path_data, variant, stats, dtype):
    A_list = _load(path_data, "A_sparse_matrix")
    b_list = _load(path_data, "b_matrix")
    sol_list = _load(path_data, "sol")
    prb_list = _load(path_data, "prb_data")
    tags_list = _load(path_data, "tags")
    pos_list = _load(path_data, "coordinates")
    dist_list = _load(path_data, "distance")
    normal_list = (_load(path_data, "unit_normal_vector")
                   if variant == "mixed" else None)

    if stats == "reference":
        st = REF_STATS[(variant, "psignn")]
        prb_mean = np.array(st["prb_mean"]); prb_std = np.array(st["prb_std"])
        dist_mean = np.array(st["dist_mean"]); dist_std = np.array(st["dist_std"])
        if variant == "mixed":
            nrm_mean = np.array(st["normal_mean"]); nrm_std = np.array(st["normal_std"])
    else:
        prb_mean, prb_std = _norm_stats(prb_list)
        dist_mean, dist_std = _norm_stats(dist_list)
        dist_mean[0] = dist_mean[1] = 0.0  # centered offsets stay centered
        if variant == "mixed":
            nrm_mean, nrm_std = _norm_stats(normal_list)

    samples = []
    for i in range(len(A_list)):
        s, r, v = _coo(A_list[i])
        b = np.asarray(b_list[i], dtype).reshape(-1, 1)
        sol = np.asarray(sol_list[i], dtype).reshape(-1, 1)
        tags = np.asarray(tags_list[i], dtype)
        tags = tags.reshape(len(sol), -1)
        prb = ((np.asarray(prb_list[i]) - prb_mean) / prb_std).astype(dtype)
        ea = ((np.asarray(dist_list[i]) - dist_mean) / dist_std).astype(dtype)
        pos = np.asarray(pos_list[i], dtype)

        # initial condition: x=0 interior, x=b on Dirichlet boundary
        # (reader.py:107-110; mixed uses one-hot col 1, mixed reader.py:117-119)
        x = np.zeros_like(sol)
        bnd = tags[:, 0] == 1 if tags.shape[1] == 1 else tags[:, 1] == 1
        x[bnd] = b[bnd]

        d = dict(x=x, b=b, sol=sol, prb_data=prb, tags=tags, pos=pos,
                 senders=s, receivers=r, a_ij=v.reshape(-1, 1),
                 edge_attr=ea)
        if variant == "mixed":
            d["unit_normal_vector"] = (
                (np.asarray(normal_list[i]) - nrm_mean) / nrm_std).astype(dtype)
        samples.append(d)
    return samples


def _load_dss(path_data, variant, stats, dtype):
    A_list = _load(path_data, "A_prime")
    bp_list = _load(path_data, "b_prime")
    sol_list = _load(path_data, "sol")
    pos_list = _load(path_data, "coordinates")
    tags_list = _load(path_data, "tags")

    if stats == "reference":
        st = REF_STATS[("dirichlet", "dss")]
        aij_mean, aij_std = st["aij_mean"], st["aij_std"]
        bp_mean = np.array(st["bprime_mean"]); bp_std = np.array(st["bprime_std"])
    else:
        all_aij = np.hstack([sp.find(A)[2] for A in A_list])
        aij_mean, aij_std = all_aij.mean(), all_aij.std()
        bp_mean, bp_std = _norm_stats(bp_list)

    samples = []
    for i in range(len(A_list)):
        s, r, v = _coo(A_list[i])
        sol = np.asarray(sol_list[i], dtype).reshape(-1, 1)
        bp = np.asarray(bp_list[i], dtype)
        tags = np.asarray(tags_list[i], dtype).reshape(len(sol), -1)
        pos = np.asarray(pos_list[i], dtype)
        samples.append(dict(
            # dss reader stores x = sol (dss reader.py:89) — MSE is vs batch.x
            x=sol, b=np.zeros_like(sol), sol=sol,
            prb_data=np.zeros((len(sol), 2), dtype),
            tags=tags, pos=pos,
            senders=s, receivers=r, a_ij=v.reshape(-1, 1),
            a_ij_norm=((v - aij_mean) / aij_std).reshape(-1, 1).astype(dtype),
            b_prime=bp,
            b_prime_norm=((bp - bp_mean) / bp_std).astype(dtype),
            edge_attr=np.zeros((len(s), 3), dtype),
        ))
    return samples


def split_dataset(samples: Sequence, family: str = "psignn",
                  variant: str = "dirichlet", seed: int = 1234):
    """60/20/20 split with the reference's per-family ordering quirks."""
    n = len(samples)
    idx = np.arange(n)
    if variant == "mixed":
        rng = np.random.RandomState(seed)
        rng.shuffle(idx)
    n_train = n - int(n * 0.2) - int((n - int(n * 0.2)) * 0.25)
    n_mid = int((n - int(n * 0.2)) * 0.25)
    a = [samples[i] for i in idx[:n_train]]
    b = [samples[i] for i in idx[n_train:n_train + n_mid]]
    c = [samples[i] for i in idx[n_train + n_mid:]]
    if family == "dss":
        # dss ordering: train | test | val
        return a, c, b
    return a, b, c  # train, val, test


def psignn_sample_from_fem(s: Dict[str, np.ndarray], stats: str = "reference",
                           variant: str = "dirichlet",
                           dtype=np.float32) -> GraphSample:
    """Convert one ``data.fem.solve_poisson`` output dict into a
    psignn/dsgps-format graph sample (the on-the-fly path used by the
    growing-geometry benchmark, tests/special_geo/spec_geo.py:139-224)."""
    st = REF_STATS[(variant, "psignn")]
    prb_mean = np.array(st["prb_mean"]); prb_std = np.array(st["prb_std"])
    dist_mean = np.array(st["dist_mean"]); dist_std = np.array(st["dist_std"])
    c = sp.find(s["A"])
    b = np.asarray(s["b"], dtype).reshape(-1, 1)
    sol = np.asarray(s["sol"], dtype).reshape(-1, 1)
    tags = np.asarray(s["tags"], dtype).reshape(len(sol), -1)
    x = np.zeros_like(sol)
    bnd = tags[:, 0] == 1 if tags.shape[1] == 1 else tags[:, 1] == 1
    x[bnd] = b[bnd]
    return dict(
        x=x, b=b, sol=sol,
        prb_data=((s["prb_data"] - prb_mean) / prb_std).astype(dtype),
        tags=tags, pos=np.asarray(s["coordinates"], dtype),
        senders=c[0].astype(np.int32), receivers=c[1].astype(np.int32),
        a_ij=c[2].reshape(-1, 1).astype(dtype),
        edge_attr=((s["distance"] - dist_mean) / dist_std).astype(dtype))


def dss_sample_from_fem(s: Dict[str, np.ndarray], stats: str = "reference",
                        dtype=np.float32) -> GraphSample:
    """Convert one FEM sample into a DSS-format graph (A′ + b′ encoding,
    generate_data.py:100-143 applied on the fly)."""
    st = REF_STATS[("dirichlet", "dss")]
    A_d = s["A"].toarray()
    b = np.asarray(s["b"], dtype).reshape(-1, 1)
    row, _ = np.where(A_d == 1)
    np.fill_diagonal(A_d, 0.0)
    bp = np.c_[b[:, 0], np.zeros(len(b)), np.zeros(len(b))].astype(dtype)
    bp[row, 2] = bp[row, 0]
    bp[row, 1] = 1.0
    bp[row, 0] = 0.0
    sA = sp.csr_matrix(A_d)
    c = sp.find(sA)
    sol = np.asarray(s["sol"], dtype).reshape(-1, 1)
    tags = np.asarray(s["tags"], dtype).reshape(len(sol), -1)
    v = c[2].astype(dtype)
    return dict(
        x=sol, b=np.zeros_like(sol), sol=sol,
        prb_data=np.zeros((len(sol), 2), dtype), tags=tags,
        pos=np.asarray(s["coordinates"], dtype),
        senders=c[0].astype(np.int32), receivers=c[1].astype(np.int32),
        a_ij=v.reshape(-1, 1),
        a_ij_norm=((v - st["aij_mean"]) / st["aij_std"]).reshape(-1, 1).astype(dtype),
        b_prime=bp,
        b_prime_norm=((bp - np.array(st["bprime_mean"]))
                      / np.array(st["bprime_std"])).astype(dtype),
        edge_attr=np.zeros((len(c[0]), 3), dtype))


@dataclasses.dataclass
class GraphLoader:
    """Minibatch iterator producing fixed-shape PaddedGraph batches.

    Replaces PyG ``DataListLoader`` + ``DataParallel`` scatter
    (main.py:70-77): batches are concatenated+padded to bucketed caps so jit
    sees a small number of distinct shapes.
    """

    samples: List[GraphSample]
    batch_size: int = 50
    shuffle: bool = False
    seed: int = 0
    n_node_cap: Optional[int] = None
    n_edge_cap: Optional[int] = None
    drop_last: bool = False
    rcm: bool = False                 # RCM-permute each sample's nodes
    pack_kernel_blocks: bool = False  # attach fused-MP edge packings
    # Build all batches once and keep them on device.  Removes the per-step
    # host->device upload (dominant on remote-device tunnels) at the cost of
    # fixed batch composition: epochs reshuffle batch ORDER, not membership
    # (the reference reshuffles samples per epoch; composition is frozen
    # after the first shuffle here).
    cache_batches: bool = False
    # Data parallelism: split every batch into n_devices per-device
    # PaddedGraphs stacked on a leading 'dp' axis (consumed by dist.dp).
    n_devices: int = 0
    # Per-graph stacking: each batch is a (G, n_cap, ...) stack of
    # single-graph PaddedGraphs (consumed by models.psignn_forward_stacked
    # — per-graph adaptive stopping instead of one joint batch norm).
    stacked: bool = False

    def __post_init__(self):
        self._epoch = 0
        self._cached = None
        if self.rcm:
            from ..kernels import rcm_permutation
            from ..kernels.fused_mp import apply_node_permutation
            out = []
            for s in self.samples:
                perm = rcm_permutation(s["senders"], s["receivers"],
                                       s["x"].shape[0])
                out.append(apply_node_permutation(s, perm))
            self.samples = out
        if self.n_node_cap is None:
            # one global cap across all batches → a single compiled shape.
            # Upper-bound any possible chunk (shuffling re-deals membership
            # each epoch) by the sum of the `per` largest samples; with DP
            # the unit is a per-device shard, not the whole batch; with
            # per-graph stacking the unit is a single graph.
            per = (1 if self.stacked
                   else self.batch_size if self.n_devices <= 1
                   else -(-self.batch_size // self.n_devices))
            nodes = sorted((s["x"].shape[0] for s in self.samples),
                           reverse=True)
            edges = sorted((len(s["senders"]) for s in self.samples),
                           reverse=True)
            from ..graphs import bucket_size
            self.n_node_cap = bucket_size(sum(nodes[:per]) + 1)
            self.n_edge_cap = bucket_size(sum(edges[:per]) + 1)

    def __len__(self):
        n = len(self.samples)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[PaddedGraph]:
        if self.cache_batches:
            if self._cached is None:
                import jax
                self._cached = [
                    jax.tree.map(jax.device_put, g)
                    for g in self._build_epoch(self.seed)]
            order = np.arange(len(self._cached))
            # first epoch preserves build order (== the uncached loader);
            # later epochs reshuffle batch order
            if self.shuffle and self._epoch > 0:
                np.random.RandomState(self.seed + self._epoch).shuffle(order)
            self._epoch += 1
            for i in order:
                yield self._cached[i]
            return
        self._epoch += 1
        yield from self._build_epoch(self.seed + self._epoch - 1)

    def _build_epoch(self, shuffle_seed: int) -> Iterator[PaddedGraph]:
        order = np.arange(len(self.samples))
        if self.shuffle:
            rng = np.random.RandomState(shuffle_seed)
            rng.shuffle(order)
        for i in range(0, len(self.samples), self.batch_size):
            sel = order[i:i + self.batch_size]
            if self.drop_last and len(sel) < self.batch_size:
                return
            chunk = [self.samples[j] for j in sel]
            if self.stacked:
                yield self._build_stacked(chunk)
                continue
            if self.n_devices > 1:
                yield self._build_sharded(chunk)
                continue
            yield batch_graphs(chunk, n_node_cap=self.n_node_cap,
                               n_edge_cap=self.n_edge_cap,
                               pack_kernel_blocks=self.pack_kernel_blocks,
                               pack_quantized=True)

    def _build_stacked(self, chunk) -> PaddedGraph:
        """(G, n_cap, ...) stack of single-graph PaddedGraphs — each graph
        padded to the SAME per-graph caps so every batch (incl. the final
        partial one, padded by cyclic repetition) shares one jit shape.
        Consumed by ``psignn_forward_stacked``: the vmapped DEQ gives each
        mesh its own stopping test (SURVEY.md hard-part #1)."""
        import jax
        import jax.numpy as jnp
        if len(chunk) < self.batch_size:
            chunk = [chunk[i % len(chunk)]
                     for i in range(self.batch_size)]
        gs = [batch_graphs([s], n_node_cap=self.n_node_cap,
                           n_edge_cap=self.n_edge_cap,
                           pack_kernel_blocks=self.pack_kernel_blocks,
                           pack_quantized=True)
              for s in chunk]
        if self.pack_kernel_blocks:
            from ..kernels import unify_mp_block_shapes
            gs = unify_mp_block_shapes(gs)
        return jax.tree.map(lambda *xs: jnp.stack(xs), *gs)

    def _build_sharded(self, chunk) -> PaddedGraph:
        """Split a batch across n_devices shards, stacked on a leading axis.

        Batches whose size does not divide n_devices are PADDED with
        zero-node samples up to ``ceil(batch_size / n)·n`` (never dropped);
        masked empty graphs are exact no-ops in every loss.  Real samples
        are dealt round-robin so every shard keeps at least one real sample
        (shard losses are masked means — an all-empty shard would be 0/0).
        If the final chunk has fewer samples than devices, samples are
        repeated cyclically (a duplicate weighs that sample twice in the
        replica-mean for that one step; still strictly better than dropping).
        """
        import jax
        import jax.numpy as jnp
        n_dev = self.n_devices
        target = -(-self.batch_size // n_dev) * n_dev
        if len(chunk) < n_dev:
            chunk = [chunk[i % len(chunk)] for i in range(n_dev)]
        empty = _empty_sample(chunk[0])
        chunk = list(chunk) + [empty] * (target - len(chunk))
        shards = [chunk[d::n_dev] for d in range(n_dev)]
        gs = [batch_graphs(s, n_node_cap=self.n_node_cap,
                           n_edge_cap=self.n_edge_cap,
                           pack_kernel_blocks=self.pack_kernel_blocks,
                           pack_quantized=True)
              for s in shards]
        if self.pack_kernel_blocks:
            from ..kernels import unify_mp_block_shapes
            gs = unify_mp_block_shapes(gs)
        return jax.tree.map(lambda *xs: jnp.stack(xs), *gs)


def prefetch(iterable, depth: int = 2):
    """Run an iterator in a background thread with a bounded queue.

    Batch building (numpy packing + RCM/kernel packing) is host work that
    otherwise serializes with device dispatch; a depth-2 prefetch overlaps
    it with the device's execution of the previous steps (numpy releases
    the GIL on large-array ops)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    END = object()
    err = []

    def worker():
        try:
            for x in iterable:
                q.put(x)
        except BaseException as e:  # propagate to consumer
            err.append(e)
        finally:
            q.put(END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        x = q.get()
        if x is END:
            break
        yield x
    if err:
        raise err[0]


def _empty_sample(template: GraphSample) -> GraphSample:
    """A zero-node, zero-edge sample with the template's field widths."""
    out = {}
    for k, v in template.items():
        v = np.asarray(v)
        out[k] = np.zeros((0,) + v.shape[1:], v.dtype)
    return out
