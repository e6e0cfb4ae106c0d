"""Fused message passing as block one-hot MXU matmuls.

Computes the same contract as ``ops.message_passing`` (reference Phi_to /
Phi_from, psignn/model.py:334-368): for every edge, the 2-layer MLP of
``[x_i, x_j, edge_attr]`` scatter-added at the aggregation node — but with
no gather/scatter primitives at all (Mosaic has no fast arbitrary gather):

1. Split the first MLP layer by input rows: ``W1 = [W1a; W1b; W1c]`` so the
   pre-activation is ``h[agg]·W1a + h[oth]·W1b + ea·W1c + b1``.  The two
   ``h·W1*`` products are dense (N, Dh) matmuls done once per call.
2. Edges are sorted by aggregation node and packed per 128-node block.
   Inside the kernel, a {0,1} selection matrix built from
   ``broadcasted_iota`` comparisons fetches rows (gather = one-hot @ rows)
   and its transpose accumulates messages (scatter-add = one-hotᵀ @ msgs) —
   both on the MXU, duplicate indices handled by the matmul reduction.
3. ``x_j`` rows come from a bandwidth-bounded window of ``h·W1b`` DMA-ed to
   VMEM per block; RCM node ordering keeps the window small (O(√N) for 2-D
   meshes).

Pack once per graph (``pack_mp_blocks``), reuse across all fixed-point
iterations — only ``h`` changes per iteration.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn import Params

BLOCK_N = 128   # aggregation nodes per output block
BLOCK_E = 128   # edges per inner MXU step


def rcm_permutation(senders: np.ndarray, receivers: np.ndarray,
                    n_nodes: int) -> np.ndarray:
    """Reverse-Cuthill-McKee node ordering (list of old indices in new
    order).  Bandwidth-minimizing orderings keep the kernel's x_j windows
    small; apply with ``apply_node_permutation``."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee
    # symmetrize the pattern: Dirichlet rows of the assembled system are
    # identity rows (columns keep their entries), and RCM's BFS cannot
    # traverse out of such sinks — ordering quality collapses without this
    rows = np.concatenate([senders, receivers])
    cols = np.concatenate([receivers, senders])
    A = sp.coo_matrix((np.ones(len(rows)), (rows, cols)),
                      shape=(n_nodes, n_nodes)).tocsr()
    return np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))


def apply_node_permutation(sample: Dict[str, np.ndarray],
                           perm: np.ndarray) -> Dict[str, np.ndarray]:
    """Permute a per-sample dict's node arrays and remap edge endpoints."""
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    out = dict(sample)
    n = len(perm)
    for k, v in sample.items():
        if k in ("senders", "receivers"):
            out[k] = inv[np.asarray(v)].astype(np.int32)
        elif hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1 \
                and v.shape[0] == n:
            out[k] = np.asarray(v)[perm]
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MPBlocks:
    """Edge data packed per 128-aggregation-node block (one direction)."""
    agg_local: jax.Array    # (n_blocks, E_cap) int32 in [0, BLOCK_N)
    oth_local: jax.Array    # (n_blocks, E_cap) int32 in [0, window)
    edge_attr: jax.Array    # (n_blocks, E_cap, edge_dim) float32
    mask: jax.Array         # (n_blocks, E_cap) float32
    win_start: jax.Array    # (n_blocks,) int32 row offsets into h
    window: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_node_cap: int = dataclasses.field(metadata=dict(static=True), default=0)


def pack_mp_blocks(senders: np.ndarray, receivers: np.ndarray,
                   edge_attr: np.ndarray, edge_mask: np.ndarray,
                   n_node_cap: int, direction: str,
                   window: Optional[int] = None,
                   quantize: bool = False) -> MPBlocks:
    """Sort+pack edges by aggregation node for the fused kernel.

    ``direction='to'`` aggregates at receivers (x_i = receiver),
    ``'from'`` at senders — matching ops.message_passing.  Self-loop and
    masked edges are dropped here (exact no-ops in the fallback too).

    ``quantize=True`` rounds the data-dependent shapes (n_blocks, e_cap,
    window) up to coarse buckets so reshuffled training batches share one
    compiled program instead of recompiling the pallas_call per batch."""
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    edge_attr = np.asarray(edge_attr)
    keep = np.asarray(edge_mask) & (senders != receivers)
    agg = (receivers if direction == "to" else senders)[keep]
    oth = (senders if direction == "to" else receivers)[keep]
    ea = edge_attr[keep]

    assert n_node_cap % BLOCK_N == 0, n_node_cap
    n_blocks = n_node_cap // BLOCK_N
    order = np.argsort(agg, kind="stable")
    agg, oth, ea = agg[order], oth[order], ea[order]
    blk = agg // BLOCK_N
    counts = np.bincount(blk, minlength=n_blocks)
    e_cap = max(BLOCK_E, int(-(-counts.max() // BLOCK_E) * BLOCK_E))
    # drop trailing all-padding blocks from the kernel grid: batching packs
    # real graphs first, so blocks past the last live aggregation node carry
    # no edges — running them costs a full window DMA + n_sub masked matmul
    # steps each (32 % of grid steps on the 11 k-node headline mesh)
    n_blocks = max(1, int(np.max(np.nonzero(counts)[0])) + 1) \
        if counts.any() else 1
    if quantize:
        e_cap = int(-(-e_cap // 256) * 256)
        n_blocks = min(n_node_cap // BLOCK_N, -(-n_blocks // 8) * 8)

    edge_dim = ea.shape[1]
    agg_local = np.zeros((n_blocks, e_cap), np.int32)
    oth_global = np.zeros((n_blocks, e_cap), np.int32)
    ea_pack = np.zeros((n_blocks, e_cap, edge_dim), np.float32)
    mask = np.zeros((n_blocks, e_cap), np.float32)
    win_start = np.zeros((n_blocks,), np.int32)

    starts = np.concatenate([[0], np.cumsum(counts)])
    max_need = BLOCK_N
    for i in range(n_blocks):
        lo, hi = starts[i], starts[i + 1]
        c = hi - lo
        if c == 0:
            continue
        agg_local[i, :c] = agg[lo:hi] - i * BLOCK_N
        oth_global[i, :c] = oth[lo:hi]
        ea_pack[i, :c] = ea[lo:hi]
        mask[i, :c] = 1.0
        o_min = int(oth[lo:hi].min())
        o_max = int(oth[lo:hi].max())
        ws = (o_min // BLOCK_N) * BLOCK_N
        win_start[i] = ws
        max_need = max(max_need, o_max - ws + 1)

    W = window or int(-(-max_need // BLOCK_N) * BLOCK_N)
    if quantize and window is None:
        W = int(-(-W // 256) * 256)
    if W < max_need:
        raise ValueError(f"window {W} < required {max_need}; "
                         "re-order nodes (RCM) or raise window")
    W = min(W, n_node_cap)
    win_start = np.minimum(win_start, n_node_cap - W).astype(np.int32)
    oth_local = (oth_global - win_start[:, None]).astype(np.int32)
    oth_local = np.where(mask > 0, oth_local, 0).astype(np.int32)

    return MPBlocks(
        agg_local=jnp.asarray(agg_local), oth_local=jnp.asarray(oth_local),
        edge_attr=jnp.asarray(ea_pack), mask=jnp.asarray(mask),
        win_start=jnp.asarray(win_start), window=W, n_node_cap=n_node_cap)


def pad_mp_blocks(b: MPBlocks, n_blocks: int, e_cap: int,
                  window: int) -> MPBlocks:
    """Pad an MPBlocks packing to larger (n_blocks, e_cap, window) caps.

    Needed to stack per-device packings on a DP axis: MPBlocks shapes are
    data-dependent, so shards of one batch must be unified to common caps
    (padded blocks/edges carry mask 0 → exact no-ops in the kernel).
    Growing the window keeps ``win_start`` valid by shifting windows that
    would overrun ``n_node_cap`` left and offsetting ``oth_local`` to match.
    """
    nb0, ec0 = b.agg_local.shape
    n_cap = b.n_node_cap
    W = min(window, n_cap)
    if (n_blocks, ec0, W) == (nb0, e_cap, b.window) and e_cap == ec0:
        return b
    assert n_blocks >= nb0 and e_cap >= ec0 and W >= b.window, \
        (n_blocks, nb0, e_cap, ec0, W, b.window)
    new_ws = jnp.minimum(b.win_start, n_cap - W)
    delta = (b.win_start - new_ws).astype(jnp.int32)
    oth = b.oth_local + delta[:, None] * (b.mask > 0)

    def pad2(x):
        return jnp.pad(x, ((0, n_blocks - nb0), (0, e_cap - ec0)))

    return MPBlocks(
        agg_local=pad2(b.agg_local), oth_local=pad2(oth.astype(jnp.int32)),
        edge_attr=jnp.pad(b.edge_attr,
                          ((0, n_blocks - nb0), (0, e_cap - ec0), (0, 0))),
        mask=pad2(b.mask),
        win_start=jnp.pad(new_ws, (0, n_blocks - nb0)).astype(jnp.int32),
        window=W, n_node_cap=n_cap)


def unify_mp_block_shapes(graphs):
    """Pad every graph's mp_blocks_to/from to common caps so the graphs can
    be stacked on a leading device axis (dist.dp)."""
    import dataclasses as _dc
    out = list(graphs)
    for attr in ("mp_blocks_to", "mp_blocks_from"):
        bs = [getattr(g, attr) for g in out]
        if any(b is None for b in bs):
            continue
        nb = max(b.agg_local.shape[0] for b in bs)
        ec = max(b.agg_local.shape[1] for b in bs)
        W = max(b.window for b in bs)
        out = [_dc.replace(g, **{attr: pad_mp_blocks(getattr(g, attr),
                                                     nb, ec, W)})
               for g in out]
    return out


def mp_from_blocks(mlp_params: List[Params], h: jax.Array,
                   blocks: MPBlocks) -> jax.Array:
    """Pure-XLA evaluation of the exact same math as the fused kernel,
    reconstructed from the packed block data (used as the differentiation
    oracle for the kernel's custom VJP and in tests)."""
    from ..nn import mlp_apply
    n_blocks, e_cap = blocks.agg_local.shape
    blk = jnp.arange(n_blocks, dtype=jnp.int32)[:, None]
    agg = (blk * BLOCK_N + blocks.agg_local).reshape(-1)
    oth = (blocks.win_start[:, None] + blocks.oth_local).reshape(-1)
    ea = blocks.edge_attr.reshape(-1, blocks.edge_attr.shape[-1])
    m = blocks.mask.reshape(-1)
    xi = jnp.take(h, agg, axis=0)
    xj = jnp.take(h, oth, axis=0)
    msg = mlp_apply(mlp_params, jnp.concatenate([xi, xj, ea], axis=-1))
    msg = msg * m[:, None]
    return jax.ops.segment_sum(msg, agg, num_segments=blocks.n_node_cap)


def fused_message_passing(mlp_params: List[Params], h: jax.Array,
                          blocks: MPBlocks, latent_dim: int,
                          interpret: bool = False) -> jax.Array:
    """Differentiable fused message passing: Pallas MXU kernels both ways.

    Forward and first-order backward (the DEQ implicit solve's hot VJP)
    run as Pallas kernels; the backward carries its own custom_vjp that
    differentiates the XLA oracle, so second-order uses (grad of the
    Hutchinson jac loss through ``jax.vjp``, psignn/model.py:416-435)
    stay exact."""

    @jax.custom_vjp
    def _mp_bwd(params, hh, g):
        return _fused_mp_bwd_kernel(params, hh, blocks, g, latent_dim,
                                    interpret)

    def _mp_bwd_fwd(params, hh, g):
        return _mp_bwd(params, hh, g), (params, hh, g)

    def _mp_bwd_bwd(res, cot):
        params, hh, g = res
        def oracle_vjp(p, x, gg):
            _, vjp_fn = jax.vjp(lambda pp, xx: mp_from_blocks(pp, xx, blocks),
                                p, x)
            return vjp_fn(gg)
        _, vjp2 = jax.vjp(oracle_vjp, params, hh, g)
        return vjp2(cot)

    _mp_bwd.defvjp(_mp_bwd_fwd, _mp_bwd_bwd)

    @jax.custom_vjp
    def _mp(params, hh):
        return _fused_mp_kernel(params, hh, blocks, latent_dim, interpret)

    def _fwd(params, hh):
        return _mp(params, hh), (params, hh)

    def _bwd(res, g):
        params, hh = res
        return _mp_bwd(params, hh, g)

    _mp.defvjp(_fwd, _bwd)
    return _mp(mlp_params, h)


def _fused_mp_kernel(mlp_params: List[Params], h: jax.Array,
                     blocks: MPBlocks, latent_dim: int,
                     interpret: bool = False) -> jax.Array:
    """Drop-in fused replacement for ``ops.message_passing``.

    ``mlp_params`` is the 2-layer Phi MLP [Linear(2D+edge_dim→Dh),
    Linear(Dh→D)] with ReLU between, as in the reference.

    Everything runs in a *transposed* layout — features on sublanes,
    nodes/edges on lanes — so the dynamic window slice of h·W1b and the
    per-sub-block edge slices land on 128-lane boundaries (Mosaic rejects
    slicing a 10-wide feature axis against its 128-lane tiling).
    """
    D = latent_dim
    w1 = mlp_params[0]["w"]
    b1 = mlp_params[0]["b"]
    w2 = mlp_params[1]["w"]
    b2 = mlp_params[1]["b"]
    w1a, w1b, w1c = w1[:D], w1[D:2 * D], w1[2 * D:]
    dh = w1.shape[1]
    d_out = w2.shape[1]
    edge_dim = w1.shape[0] - 2 * D

    hi_prec = jax.lax.Precision.HIGHEST
    # pad the feature (sublane) dim to a multiple of 8 so VMEM slices of the
    # transposed activations stay tile-aligned; zero rows are exact no-ops
    dh_pad = -(-dh // 8) * 8
    pad = dh_pad - dh
    haT = jnp.pad(jnp.dot(h, w1a, precision=hi_prec).T,
                  ((0, pad), (0, 0)))                # (Dh_pad, N)
    hbT = jnp.pad(jnp.dot(h, w1b, precision=hi_prec).T,
                  ((0, pad), (0, 0)))                # (Dh_pad, N)
    w1cT = jnp.pad(w1c.T, ((0, pad), (0, 0)))        # (Dh_pad, edge_dim)
    b1c = jnp.pad(b1.reshape(-1, 1), ((0, pad), (0, 0)))   # (Dh_pad, 1)
    w2T = jnp.pad(w2.T, ((0, 0), (0, pad)))          # (D, Dh_pad)
    b2c = b2.reshape(-1, 1)                          # (D, 1)

    n_blocks, e_cap = blocks.agg_local.shape
    W = blocks.window

    # (n_blocks, 1, E_cap): the singleton middle axis satisfies Mosaic's
    # block-shape tiling rule (last two dims must divide (8, 128) or equal
    # the array dims) while keeping one whole edge row per grid step
    aggl2 = blocks.agg_local[:, None, :]
    othl2 = blocks.oth_local[:, None, :]
    mask2 = blocks.mask[:, None, :]
    eaT3 = jnp.swapaxes(blocks.edge_attr, 1, 2)      # (n_blocks, edge_dim, E_cap)

    def kernel(ws_ref, haT_ref, aggl_ref, othl_ref, eaT_ref, mask_ref,
               w1cT_ref, b1_ref, w2T_ref, b2_ref, hbT_ref, outT_ref,
               hbT_wins, sems):
        # double-buffered window pipeline: the hbT window DMA for block i+1
        # is issued before computing block i, hiding the per-step DMA
        # latency that otherwise serializes the grid (the kernel is
        # grid/DMA-latency bound, not MXU bound — docs/PERF.md)
        i = pl.program_id(0)
        n = pl.num_programs(0)
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        def win_copy(block_idx, buf_slot):
            ws = pl.multiple_of(ws_ref[block_idx], BLOCK_N)  # pack quantizes
            return pltpu.make_async_copy(hbT_ref.at[:, pl.ds(ws, W)],
                                         hbT_wins.at[buf_slot],
                                         sems.at[buf_slot])

        @pl.when(i == 0)
        def _first():
            win_copy(0, slot).start()

        @pl.when(i + 1 < n)
        def _prefetch():
            win_copy(i + 1, nxt).start()

        win_copy(i, slot).wait()
        hbT_win = hbT_wins.at[slot]

        f32 = jnp.float32
        # full f32 matmuls: Mosaic's default MXU precision is one-pass bf16,
        # which truncates the h-side values to ~3 significant digits (0.4 %
        # relative error measured on-chip) — enough to cap the DEQ residual
        # floor.  The one-hot operands are exact either way; HIGHEST costs
        # only ~6x the kernel's (tiny) MXU time.
        hi = jax.lax.Precision.HIGHEST

        # one full-width dot per stage (not an inner 128-edge sub-loop): the
        # kernel's cost is per-instruction issue overhead, not FLOPs — five
        # (·, e_cap) dots per block beat 5·(e_cap/128) tiny ones 6x
        agg_l = aggl_ref[0, 0]                          # (E_cap,)
        oth_l = othl_ref[0, 0]                          # (E_cap,)
        m = mask_ref[0, 0]                              # (E_cap,)
        eaT = eaT_ref[0]                                # (edge_dim, E_cap)

        iota_n = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_N, e_cap), 0)
        S = (iota_n == agg_l[None, :]).astype(f32)      # (BN, E_cap)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, e_cap), 0)
        GT = (iota_w == oth_l[None, :]).astype(f32)     # (W, E_cap)

        xiT = jnp.dot(haT_ref[:], S, preferred_element_type=f32,
                      precision=hi)
        xjT = jnp.dot(hbT_win[:], GT, preferred_element_type=f32,
                      precision=hi)
        preT = (xiT + xjT
                + jnp.dot(w1cT_ref[:], eaT, preferred_element_type=f32,
                          precision=hi)
                + b1_ref[:])
        msgT = (jnp.dot(w2T_ref[:], jnp.maximum(preT, 0.0),
                        preferred_element_type=f32, precision=hi)
                + b2_ref[:])
        msgT = msgT * m[None, :]
        outT_ref[:] = jnp.dot(msgT, S.T, preferred_element_type=f32,
                              precision=hi)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((dh_pad, BLOCK_N), lambda i, ws: (0, i)),  # haT blk
            pl.BlockSpec((1, 1, e_cap), lambda i, ws: (i, 0, 0)),
            pl.BlockSpec((1, 1, e_cap), lambda i, ws: (i, 0, 0)),
            pl.BlockSpec((1, edge_dim, e_cap), lambda i, ws: (i, 0, 0)),
            pl.BlockSpec((1, 1, e_cap), lambda i, ws: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w1cT
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b1 col
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w2T
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b2 col
            pl.BlockSpec(memory_space=pl.ANY),       # hbT (manual DMA)
        ],
        out_specs=pl.BlockSpec((d_out, BLOCK_N), lambda i, ws: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((2, dh_pad, W), jnp.float32),   # double-buffered
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # the grid covers only live blocks (trailing padding blocks are dropped
    # at pack time); rows past the live region are zero by construction
    outT = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((d_out, n_blocks * BLOCK_N),
                                       jnp.float32),
        interpret=interpret,
    )(blocks.win_start, haT, aggl2, othl2, eaT3, mask2,
      w1cT, b1c, w2T, b2c, hbT)
    return jnp.pad(outT, ((0, 0), (0, blocks.n_node_cap - n_blocks * BLOCK_N))).T


def _fused_mp_bwd_kernel(mlp_params: List[Params], h: jax.Array,
                         blocks: MPBlocks, g: jax.Array, latent_dim: int,
                         interpret: bool = False):
    """Dedicated backward kernel: given the output cotangent ``g``
    (n_node_cap, d_out), produce (param grads, dh) of the fused MP.

    Recomputes the pre-activations per block (same window DMA as the
    forward — cheaper than saving (Dh, E) activations to HBM), then runs
    the reverse chain as the same one-hot MXU dots with swapped
    contraction sides.  Per-block outputs: ``dhaT`` columns are disjoint
    (standard blocked output); ``dhbT`` windows overlap across blocks so
    each block emits its (Dh, W) window and a segment-sum outside combines
    them; parameter grads accumulate in VMEM across the sequential grid."""
    D = latent_dim
    w1 = mlp_params[0]["w"]
    b1 = mlp_params[0]["b"]
    w2 = mlp_params[1]["w"]
    b2 = mlp_params[1]["b"]
    w1a, w1b, w1c = w1[:D], w1[D:2 * D], w1[2 * D:]
    dh_w = w1.shape[1]
    d_out = w2.shape[1]
    edge_dim = w1.shape[0] - 2 * D

    hi_prec = jax.lax.Precision.HIGHEST
    dh_pad = -(-dh_w // 8) * 8
    pad = dh_pad - dh_w
    haT = jnp.pad(jnp.dot(h, w1a, precision=hi_prec).T, ((0, pad), (0, 0)))
    hbT = jnp.pad(jnp.dot(h, w1b, precision=hi_prec).T, ((0, pad), (0, 0)))
    w1cT = jnp.pad(w1c.T, ((0, pad), (0, 0)))
    b1c = jnp.pad(b1.reshape(-1, 1), ((0, pad), (0, 0)))
    w2T = jnp.pad(w2.T, ((0, 0), (0, pad)))          # (d_out, Dh_pad)

    n_blocks, e_cap = blocks.agg_local.shape
    W = blocks.window
    rows = n_blocks * BLOCK_N

    aggl2 = blocks.agg_local[:, None, :]
    othl2 = blocks.oth_local[:, None, :]
    mask2 = blocks.mask[:, None, :]
    eaT3 = jnp.swapaxes(blocks.edge_attr, 1, 2)
    gT = g.T[:, :rows]                               # (d_out, rows)

    f32 = jnp.float32
    hi = jax.lax.Precision.HIGHEST

    def mm(a, b):    # (m,k)@(k,n)
        return jnp.dot(a, b, preferred_element_type=f32, precision=hi)

    def mm_nt(a, b):  # (m,k),(n,k) -> (m,n)
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=hi)

    def mm_tn(a, b):  # (k,m),(k,n) -> (m,n)
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())),
            preferred_element_type=f32, precision=hi)

    def kernel(ws_ref, haT_ref, gT_ref, aggl_ref, othl_ref, eaT_ref,
               mask_ref, w1cT_ref, b1_ref, w2T_ref, hbT_ref,
               dhaT_ref, dwin_ref, dw2T_ref, db2_ref, dw1cT_ref, db1_ref,
               hbT_wins, sems):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        def win_copy(block_idx, buf_slot):
            ws = pl.multiple_of(ws_ref[block_idx], BLOCK_N)
            return pltpu.make_async_copy(hbT_ref.at[:, pl.ds(ws, W)],
                                         hbT_wins.at[buf_slot],
                                         sems.at[buf_slot])

        @pl.when(i == 0)
        def _first():
            win_copy(0, slot).start()

        @pl.when(i + 1 < n)
        def _prefetch():
            win_copy(i + 1, nxt).start()

        win_copy(i, slot).wait()
        hbT_win = hbT_wins.at[slot]

        @pl.when(i == 0)
        def _init_accs():
            dw2T_ref[:] = jnp.zeros_like(dw2T_ref)
            db2_ref[:] = jnp.zeros_like(db2_ref)
            dw1cT_ref[:] = jnp.zeros_like(dw1cT_ref)
            db1_ref[:] = jnp.zeros_like(db1_ref)

        agg_l = aggl_ref[0, 0]
        oth_l = othl_ref[0, 0]
        m = mask_ref[0, 0]
        eaT = eaT_ref[0]

        iota_n = jax.lax.broadcasted_iota(jnp.int32, (BLOCK_N, e_cap), 0)
        S = (iota_n == agg_l[None, :]).astype(f32)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, e_cap), 0)
        GT = (iota_w == oth_l[None, :]).astype(f32)

        # forward recompute up to the ReLU mask
        preT = (mm(haT_ref[:], S) + mm(hbT_win[:], GT)
                + mm(w1cT_ref[:], eaT) + b1_ref[:])
        rT = jnp.maximum(preT, 0.0)

        # reverse chain (padding edges have m=0 -> all cotangents zero)
        dmsgT = mm(gT_ref[:], S) * m[None, :]            # (d_out, E)
        db2_ref[:] += jnp.sum(dmsgT, axis=1, keepdims=True)
        dw2T_ref[:] += mm_nt(dmsgT, rT)                  # (d_out, Dh_pad)
        dpreT = mm_tn(w2T_ref[:], dmsgT)                 # (Dh_pad, E)
        dpreT = dpreT * (preT > 0).astype(f32)
        db1_ref[:] += jnp.sum(dpreT, axis=1, keepdims=True)
        dw1cT_ref[:] += mm_nt(dpreT, eaT)                # (Dh_pad, edge_dim)
        dhaT_ref[:] = mm_nt(dpreT, S)                    # (Dh_pad, BN)
        dwin_ref[0] = mm_nt(dpreT, GT)                   # (Dh_pad, W)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((dh_pad, BLOCK_N), lambda i, ws: (0, i)),  # haT
            pl.BlockSpec((d_out, BLOCK_N), lambda i, ws: (0, i)),   # gT
            pl.BlockSpec((1, 1, e_cap), lambda i, ws: (i, 0, 0)),
            pl.BlockSpec((1, 1, e_cap), lambda i, ws: (i, 0, 0)),
            pl.BlockSpec((1, edge_dim, e_cap), lambda i, ws: (i, 0, 0)),
            pl.BlockSpec((1, 1, e_cap), lambda i, ws: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w1cT
            pl.BlockSpec(memory_space=pltpu.VMEM),   # b1 col
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w2T
            pl.BlockSpec(memory_space=pl.ANY),       # hbT (manual DMA)
        ],
        out_specs=[
            pl.BlockSpec((dh_pad, BLOCK_N), lambda i, ws: (0, i)),  # dhaT
            pl.BlockSpec((1, dh_pad, W), lambda i, ws: (i, 0, 0)),  # dwin
            pl.BlockSpec((d_out, dh_pad), lambda i, ws: (0, 0)),    # dw2T
            pl.BlockSpec((d_out, 1), lambda i, ws: (0, 0)),         # db2
            pl.BlockSpec((dh_pad, edge_dim), lambda i, ws: (0, 0)), # dw1cT
            pl.BlockSpec((dh_pad, 1), lambda i, ws: (0, 0)),        # db1
        ],
        scratch_shapes=[
            pltpu.VMEM((2, dh_pad, W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    dhaT, dwin, dw2T, db2c, dw1cT, db1c = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((dh_pad, rows), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, dh_pad, W), jnp.float32),
            jax.ShapeDtypeStruct((d_out, dh_pad), jnp.float32),
            jax.ShapeDtypeStruct((d_out, 1), jnp.float32),
            jax.ShapeDtypeStruct((dh_pad, edge_dim), jnp.float32),
            jax.ShapeDtypeStruct((dh_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(blocks.win_start, haT, gT, aggl2, othl2, eaT3, mask2,
      w1cT, b1c, w2T, hbT)

    n_cap = blocks.n_node_cap
    # combine the overlapping dhbT windows: segment-sum over global columns
    cols = (blocks.win_start[:, None]
            + jnp.arange(W, dtype=jnp.int32)[None, :]).reshape(-1)
    dhb_rows = jax.ops.segment_sum(
        jnp.swapaxes(dwin, 1, 2).reshape(n_blocks * W, dh_pad),
        cols, num_segments=n_cap)                     # (n_cap, Dh_pad)
    dha_rows = jnp.pad(dhaT.T, ((0, n_cap - rows), (0, 0)))

    dpre_a = dha_rows[:, :dh_w]
    dpre_b = dhb_rows[:, :dh_w]
    dh_out = (jnp.dot(dpre_a, w1a.T, precision=hi_prec)
              + jnp.dot(dpre_b, w1b.T, precision=hi_prec))
    dW1 = jnp.concatenate([
        jnp.dot(h.T, dpre_a, precision=hi_prec),
        jnp.dot(h.T, dpre_b, precision=hi_prec),
        dw1cT[:dh_w].T,
    ], axis=0)
    dparams = [
        {"w": dW1.astype(w1.dtype), "b": db1c[:dh_w, 0].astype(b1.dtype)},
        {"w": dw2T.T[:dh_w].astype(w2.dtype), "b": db2c[:, 0].astype(b2.dtype)},
    ]
    return dparams, dh_out.astype(h.dtype)
