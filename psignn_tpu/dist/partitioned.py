"""Partitioned Ψ-GNN solve: one large mesh sharded across the device mesh.

This composes the pieces SURVEY.md §5.7 calls for into one path (the graph
analog of sequence/context parallelism):

* nodes are 1-D spatially partitioned after RCM ordering (n_parts shards of
  n_loc rows each); every edge then connects nodes within ``halo`` positions,
  so each message-passing step needs only a two-neighbor ``ppermute`` strip
  exchange (``build_halo_partition``, dist/partition.py);
* the full DEQ update function (``models/psignn.py:101-139``, reference
  ``dirichlet/psignn/model.py:263-300``) runs per shard on local rows with
  one halo exchange per layer shared by its 2–3 directional aggregations;
* the fixed-point solver (broyden/picard/anderson) runs INSIDE ``shard_map``
  on the local shard of the global state with ``reduce=psum``: stopping
  norms, secant products, and rank-update coefficients are global
  (reference stopping test: ``dirichlet/psignn/utilities/solver.py:162-183``),
  so the partitioned solve takes the same iterates as the single-device one;
* the residual ``‖A u − b‖²`` is a partitioned SpMV: halo-aggregated
  off-diagonal flux + local diagonal, masked-mean psum-reduced
  (reference ``psignn/model.py:157-167``).

Exactness: segment-sum is associative and padded rows stay zero, so the only
deviation from the single-device path is float reduction order inside psum.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..deq import _solver_kwargs
from ..nn import layer_norm_apply, linear_apply, mlp_apply
from ..solvers import get_solver
from .partition import build_halo_partition


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PartitionedGraph:
    """One mesh partitioned into n_parts row shards (leading axis n_parts).

    Node arrays are (n_parts, n_loc, w); edge dicts hold the
    ``build_halo_partition`` packing per direction; ``spmv`` is the same
    packing over the off-diagonal entries of A with a_ij as the edge value,
    aggregated at senders (A's rows)."""

    x: jax.Array
    b: jax.Array
    sol: jax.Array
    prb_data: jax.Array
    dir_mask: jax.Array          # (n_parts, n_loc, 1) float
    node_mask: jax.Array         # (n_parts, n_loc, 1) float
    diag: jax.Array              # (n_parts, n_loc, 1) diagonal of A
    mp_to: Dict[str, jax.Array]
    mp_from: Dict[str, jax.Array]
    spmv: Dict[str, jax.Array]
    unit_normal_vector: Optional[jax.Array] = None
    neu_mask: Optional[jax.Array] = None
    # fused-kernel packings (kernels.fused_mp.MPBlocks, leading n_parts
    # axis) over the EXTENDED window [halo | local | halo]: aggregation
    # rows live at [halo, halo+n_loc), sources anywhere in the window.
    # Built by build_partitioned_graph(pallas=True); None = XLA path.
    mp_blocks_to: Optional[object] = None
    mp_blocks_from: Optional[object] = None
    n_loc: int = dataclasses.field(metadata=dict(static=True), default=0)
    halo: int = dataclasses.field(metadata=dict(static=True), default=0)
    n_parts: int = dataclasses.field(metadata=dict(static=True), default=1)
    n_ext_cap: int = dataclasses.field(metadata=dict(static=True), default=0)


def _part_nodes(arr: np.ndarray, n_parts: int, n_loc: int) -> np.ndarray:
    arr = np.asarray(arr, np.float32)
    if arr.ndim == 1:
        arr = arr[:, None]
    out = np.zeros((n_parts * n_loc, arr.shape[1]), np.float32)
    out[: arr.shape[0]] = arr
    return out.reshape(n_parts, n_loc, arr.shape[1])


def _shard_mp_blocks(s, r, ea, n_parts, n_loc, halo, n_ext_cap, direction):
    """Per-shard MPBlocks over the extended-window node space.

    For shard p, an edge aggregating at global row ``agg`` (with
    ``agg // n_loc == p``) maps to extended coordinates
    ``agg_ext = agg - p*n_loc + halo`` / ``oth_ext = oth - (p*n_loc - halo)``
    — the same affine map for both endpoints, so self-loops stay
    self-loops and pack_mp_blocks' self-loop drop matches the XLA packs'.
    Shards are padded to common (n_blocks, e_cap, window) caps and stacked
    on a leading n_parts axis (shard_map shards it with the graph)."""
    from ..kernels.fused_mp import pack_mp_blocks, pad_mp_blocks

    agg = r if direction == "to" else s
    oth = s if direction == "to" else r
    part = agg // n_loc
    shards = []
    for p in range(n_parts):
        sel = part == p
        agg_ext = (agg[sel] - p * n_loc + halo).astype(np.int32)
        oth_ext = (oth[sel] - (p * n_loc - halo)).astype(np.int32)
        snd, rcv = ((oth_ext, agg_ext) if direction == "to"
                    else (agg_ext, oth_ext))
        shards.append(pack_mp_blocks(
            snd, rcv, ea[sel], np.ones(sel.sum(), bool),
            n_node_cap=n_ext_cap, direction=direction))
    nb = max(b.agg_local.shape[0] for b in shards)
    ec = max(b.agg_local.shape[1] for b in shards)
    W = max(b.window for b in shards)
    shards = [pad_mp_blocks(b, nb, ec, W) for b in shards]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *shards)


def build_partitioned_graph(sample: Dict[str, np.ndarray], n_parts: int,
                            halo: Optional[int] = None,
                            pallas: bool = False) -> PartitionedGraph:
    """Partition one RCM-ordered psignn sample (reader format) for the
    partitioned solve.  ``sample`` must already be RCM-permuted
    (kernels.rcm_permutation + apply_node_permutation) so the bandwidth —
    hence the halo width — is O(√N).  ``pallas=True`` additionally packs
    per-shard fused-kernel blocks (MXU message passing inside each shard,
    VERDICT r4 weak #6)."""
    s = np.asarray(sample["senders"])
    r = np.asarray(sample["receivers"])
    n_nodes = int(np.asarray(sample["x"]).shape[0])

    part = build_halo_partition(s, r, np.asarray(sample["edge_attr"]),
                                n_nodes, n_parts, halo=halo,
                                split_interior=True)
    n_loc, halo_w = part["n_loc"], part["halo"]
    # SpMV packing: off-diagonal entries, value = a_ij, aggregated at
    # senders (direction 'from' in build_halo_partition terms)
    spart = build_halo_partition(s, r, np.asarray(sample["a_ij"]),
                                 n_nodes, n_parts, halo=halo_w)
    assert spart["n_loc"] == n_loc and spart["halo"] == halo_w

    a = np.asarray(sample["a_ij"]).reshape(-1)
    diag = np.zeros((n_nodes,), np.float32)
    on_diag = s == r
    diag[s[on_diag]] = a[on_diag]

    tags = np.asarray(sample["tags"]).reshape(n_nodes, -1)
    if tags.shape[1] == 1:
        dir_mask = (tags[:, 0] == 1).astype(np.float32)
        neu_mask = None
    else:
        dir_mask = (tags[:, 1] == 1).astype(np.float32)
        neu_mask = (tags[:, 2] == 1).astype(np.float32)
    node_mask = np.ones((n_nodes,), np.float32)

    blocks_to = blocks_from = None
    n_ext_cap = 0
    if pallas:
        keep = s != r
        n_ext_cap = -(-(n_loc + 2 * halo_w) // 128) * 128
        ea_arr = np.asarray(sample["edge_attr"])[keep]
        blocks_to = _shard_mp_blocks(s[keep], r[keep], ea_arr, n_parts,
                                     n_loc, halo_w, n_ext_cap, "to")
        blocks_from = _shard_mp_blocks(s[keep], r[keep], ea_arr, n_parts,
                                       n_loc, halo_w, n_ext_cap, "from")

    pn = lambda x: jnp.asarray(_part_nodes(x, n_parts, n_loc))
    ed = lambda d: jax.tree.map(jnp.asarray, d)
    return PartitionedGraph(
        x=pn(sample["x"]), b=pn(sample["b"]), sol=pn(sample["sol"]),
        prb_data=pn(sample["prb_data"]),
        dir_mask=pn(dir_mask * node_mask), node_mask=pn(node_mask),
        diag=pn(diag),
        mp_to=ed(part["to"]), mp_from=ed(part["from"]),
        spmv=ed(spart["from"]),
        unit_normal_vector=(pn(sample["unit_normal_vector"])
                            if "unit_normal_vector" in sample else None),
        neu_mask=pn(neu_mask) if neu_mask is not None else None,
        mp_blocks_to=blocks_to, mp_blocks_from=blocks_from,
        n_loc=n_loc, halo=halo_w, n_parts=n_parts, n_ext_cap=n_ext_cap)


# ------------------------------------------------------------------ local ops

def _halo_strips(h: jax.Array, halo: int, n_parts: int, axis: str):
    """Start the two neighbor ppermutes (the ICI strip exchange of
    SURVEY.md §5.7) and return the received (left, right) strips.  Callers
    that aggregate interior edges BEFORE touching the strips give XLA's
    latency-hiding scheduler independent compute to overlap the
    collective-permute with."""
    fwd = [(i, (i + 1) % n_parts) for i in range(n_parts)]
    bwd = [(i, (i - 1) % n_parts) for i in range(n_parts)]
    left = jax.lax.ppermute(h[-halo:], axis, fwd)
    right = jax.lax.ppermute(h[:halo], axis, bwd)
    idx = jax.lax.axis_index(axis)
    left = jnp.where(idx == 0, jnp.zeros_like(left), left)
    right = jnp.where(idx == n_parts - 1, jnp.zeros_like(right), right)
    return left, right


def _halo_exchange(h: jax.Array, halo: int, n_parts: int, axis: str):
    """(n_loc, D) local rows → (n_loc + 2·halo, D) extended window."""
    left, right = _halo_strips(h, halo, n_parts, axis)
    return jnp.concatenate([left, h, right], axis=0)


def _gather_mlp_agg(mlp_params, h, src, ed):
    """One packed edge set: gather → MLP → masked segment-sum onto local
    rows.  ``src`` is the array ``ed['oth_local']`` indexes (the local block
    for interior packs, the extended window for boundary packs)."""
    xi = jnp.take(h, ed["agg_local"], axis=0)
    xj = jnp.take(src, ed["oth_local"], axis=0)
    feats = jnp.concatenate([xi, xj, ed["edge_attr"]], axis=-1)
    msg = mlp_apply(mlp_params, feats) * ed["mask"][:, None]
    return jax.ops.segment_sum(msg, ed["agg_local"], num_segments=h.shape[0])


def _mp_local(mlp_params, h, h_ext, ed):
    """One directional aggregation: interior edges read the LOCAL block (no
    dependence on the halo exchange), boundary edges read the extended
    window — summed after, so interior compute overlaps the ppermutes."""
    if isinstance(ed, dict) and "int" in ed:
        out = _gather_mlp_agg(mlp_params, h, h, ed["int"])
        return out + _gather_mlp_agg(mlp_params, h, h_ext, ed["bnd"])
    return _gather_mlp_agg(mlp_params, h, h_ext, ed)


def _spmv_local(u, u_ext, ed, diag):
    """Local rows of A @ u: halo-aggregated off-diagonal + local diagonal."""
    vals = ed["edge_attr"] * jnp.take(u_ext, ed["oth_local"], axis=0)
    vals = vals * ed["mask"][:, None]
    off = jax.ops.segment_sum(vals, ed["agg_local"], num_segments=u.shape[0])
    return off + diag * u


def make_partitioned_function(cfg, n_parts: int, halo: int,
                              axis: str = "x") -> Callable:
    """Per-shard Ψ-GNN update function f(params, h, h0, pg_local) -> h'
    (models/psignn.make_function with halo-exchange message passing).
    One exchange per layer feeds all of the layer's aggregations.

    When the graph carries fused-kernel packings (build_partitioned_graph
    with pallas=True) and ops.USE_PALLAS_MP, each shard's aggregations run
    the Pallas MXU kernel over its extended window instead of
    take/segment_sum — the same kernel as the single-device path, per
    shard (closes the r4 2x partition-overhead gap where the window
    fits)."""
    mixed = cfg.bc_mode == "mixed"

    def _mp_any(mlp_params, h, h_ext, ed, blocks, n_loc):
        from .. import ops
        if blocks is not None and ops.USE_PALLAS_MP:
            from ..kernels import fused_message_passing
            pad_rows = blocks.n_node_cap - h_ext.shape[0]
            h_pad = jnp.pad(h_ext, ((0, pad_rows), (0, 0)))
            out = fused_message_passing(mlp_params, h_pad, blocks,
                                        latent_dim=h.shape[-1])
            return out[halo:halo + n_loc]
        return _mp_local(mlp_params, h, h_ext, ed)

    def f(params, h, h_initial, pg):
        n_layers = len(params["layers"])
        n_loc = h.shape[0]
        for k, layer in enumerate(params["layers"]):
            h_ext = _halo_exchange(h, halo, n_parts, axis)
            mp_to = _mp_any(layer["phi_to"], h, h_ext, pg.mp_to,
                            pg.mp_blocks_to, n_loc)
            mp_from = _mp_any(layer["phi_from"], h, h_ext, pg.mp_from,
                              pg.mp_blocks_from, n_loc)
            concat = jnp.concatenate([h, mp_to, mp_from, pg.prb_data],
                                     axis=-1)
            alpha = jax.nn.sigmoid(linear_apply(params["alpha"], concat))
            update = alpha * mlp_apply(layer["update"], concat)
            h_next = h + update
            if mixed:
                mp_neu = _mp_any(params["phi_neumann"], h, h_ext,
                                 pg.mp_from, pg.mp_blocks_from, n_loc)
                concat_neu = jnp.concatenate(
                    [h, mp_neu, pg.prb_data, pg.unit_normal_vector], axis=-1)
                upd_neu = mlp_apply(params["update_neumann"], concat_neu)
                h_next = jnp.where(pg.neu_mask > 0, upd_neu, h_next)
            if k == n_layers - 1:
                h_next = layer_norm_apply(params["laynorm"], h_next)
            h = jnp.where(pg.dir_mask > 0, h_initial, h_next)
            h = h * pg.node_mask
        return h

    return f


def _unshard(pg: PartitionedGraph) -> PartitionedGraph:
    """Drop the leading shard dim of every array leaf (inside shard_map)."""
    return jax.tree.map(lambda x: x.reshape(x.shape[1:]), pg)


def partitioned_residual_local(u, u_ext, pg, red):
    """Global mean((A u − b)²) over real nodes from local shards."""
    r = _spmv_local(u, u_ext, pg.spmv, pg.diag) - pg.b
    num = red(jnp.sum(jnp.square(r) * pg.node_mask))
    den = red(jnp.sum(pg.node_mask))
    return num / den


def make_partitioned_inference(cfg, mesh: Mesh, n_parts: int, halo: int,
                               axis: str = "x") -> Callable:
    """Build the jitted partitioned inference once (call it many times with
    graphs of the same (n_parts, n_loc, halo) packing — rebuilding per call
    re-traces, which is what kept the partition bench unrecorded in r4).

    Returns ``fn(params, pg) -> (u, nstep, lowest, residual)``."""
    f = make_partitioned_function(cfg, n_parts, halo, axis)
    solver = get_solver(cfg.solver)
    kw = _solver_kwargs(cfg.deq)

    def local(prm, pg_sh):
        g = _unshard(pg_sh)
        red = lambda s: jax.lax.psum(s, axis)
        ae = prm["autoencoder"]
        h0 = mlp_apply(ae["encoder"], g.x) * g.node_mask
        out = solver(lambda h: f(prm["function"], h, h0, g), h0,
                     threshold=cfg.fw_thres, eps=cfg.fw_tol,
                     reduce=red, **kw)
        u = mlp_apply(ae["decoder"], out.result) * g.node_mask
        u_ext = _halo_exchange(u, halo, n_parts, axis)
        res = partitioned_residual_local(u, u_ext, g, red)
        return u[None], out.nstep, out.lowest, res

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(axis), P(), P(), P()),
        check_vma=False))


def partitioned_psignn_inference(params: Dict, pg: PartitionedGraph,
                                 cfg, mesh: Mesh, axis: str = "x"):
    """Full partitioned inference: encoder → fixed point (psum'd stopping
    norm) → decoder → global residual.  Matches
    ``models.psignn.psignn_inference`` iterate-for-iterate on one device
    set; returns (u (n_parts, n_loc, 1), nstep, lowest, residual).
    Convenience wrapper over ``make_partitioned_inference`` (one-shot
    callers); loops should build once."""
    fn = make_partitioned_inference(cfg, mesh, pg.n_parts, pg.halo, axis)
    return fn(params, pg)


def partitioned_psignn_inference_dp(params: Dict, pg_stacked,
                                    cfg, mesh: Mesh, dp_axis: str = "dp",
                                    axis: str = "x"):
    """DP × partition on a 2-D mesh: independent graphs sharded over
    ``dp_axis``, each graph's nodes partitioned over ``axis``.

    ``pg_stacked`` is a tree-stack of PartitionedGraphs with identical
    static shape (leading dim = dp size).  Collectives: halo ppermutes and
    stopping-norm psums ride ``axis`` only, so the dp rows solve
    independently — the multi-host layout where dp spans hosts (DCN) and
    the partition spans a slice (ICI), SURVEY.md §5.8."""
    n_parts, halo = pg_stacked.n_parts, pg_stacked.halo
    f = make_partitioned_function(cfg, n_parts, halo, axis)
    solver = get_solver(cfg.solver)
    kw = _solver_kwargs(cfg.deq)

    def local(prm, pg_sh):
        g = jax.tree.map(lambda x: x.reshape(x.shape[2:]), pg_sh)
        red = lambda s: jax.lax.psum(s, axis)
        # the dp rows solve independently but the halo ppermutes rendezvous
        # across the WHOLE mesh: every device must take the same number of
        # loop trips, so the loop condition is a global any() over both
        # axes and already-stopped rows freeze their carry (solvers._sync_loop)
        sync = lambda b: jax.lax.psum(b.astype(jnp.int32),
                                      (dp_axis, axis)) > 0
        ae = prm["autoencoder"]
        h0 = mlp_apply(ae["encoder"], g.x) * g.node_mask
        out = solver(lambda h: f(prm["function"], h, h0, g), h0,
                     threshold=cfg.fw_thres, eps=cfg.fw_tol,
                     reduce=red, sync=sync, **kw)
        u = mlp_apply(ae["decoder"], out.result) * g.node_mask
        u_ext = _halo_exchange(u, halo, n_parts, axis)
        res = partitioned_residual_local(u, u_ext, g, red)
        return (u[None, None], out.nstep[None], out.lowest[None], res[None])

    return jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(dp_axis, axis)),
        out_specs=(P(dp_axis, axis), P(dp_axis), P(dp_axis), P(dp_axis)),
        check_vma=False))(params, pg_stacked)


# ------------------------------------------------------------- training step

def stack_partitioned_graphs(pgs):
    """Tree-stack PartitionedGraphs (identical static shape) on a leading dp
    axis for ``partitioned_psignn_inference_dp`` / the partitioned train
    step.  Production batching must bucket meshes to equal (n_loc, halo,
    e_cap) first — same contract as graphs.batch_graphs caps."""
    assert len({(p.n_loc, p.halo, p.n_parts, p.n_ext_cap) for p in pgs}) == 1
    out = jax.tree.map(lambda *xs: jnp.stack(xs), *pgs)
    return dataclasses.replace(out, n_loc=pgs[0].n_loc, halo=pgs[0].halo,
                               n_parts=pgs[0].n_parts,
                               n_ext_cap=pgs[0].n_ext_cap)


def make_partitioned_loss(cfg, n_parts: int, halo: int, mesh: Mesh,
                          jac_weight: float = 1.0, dp_axis: str = "dp",
                          axis: str = "x"):
    """Shard-mapped Ψ-GNN training loss over a dp×partition mesh.

    Returns ``loss_fn(params, pg_stacked, v_stacked) -> (loss, aux)`` where
    ``pg_stacked`` is a (dp, n_parts, ...) tree-stack and ``v_stacked`` a
    (dp, n_parts, n_loc, D) Hutchinson probe (padded rows ignored — they
    produce zero cotangent because the update function masks them).

    Semantics match ``models.psignn.psignn_forward`` + DataParallel's
    replica-mean (training_class.py:156-159): per-graph losses are global
    over the partition axis (psum'd partials), then pmean'd over dp.
    Differentiate THROUGH the returned function (dist/dp.py pattern); the
    DEQ backward adjoint solve runs inside with the same reduce/sync hooks
    via ``deq_attach_dist``."""
    from ..deq import deq_attach_dist, jac_loss_probe
    f = make_partitioned_function(cfg, n_parts, halo, axis)
    solver = get_solver(cfg.solver)
    kw = _solver_kwargs(cfg.deq)
    deq_cfg = cfg.deq

    def loss_fn(params, pg_stacked, v_stacked):
        def local(prm, pg_sh, v_sh):
            g = jax.tree.map(lambda x: x.reshape(x.shape[2:]), pg_sh)
            v = v_sh.reshape(v_sh.shape[2:])
            red = lambda s: jax.lax.psum(s, axis)
            sync = lambda b: jax.lax.psum(b.astype(jnp.int32),
                                          (dp_axis, axis)) > 0
            ae = prm["autoencoder"]
            enc = lambda x: mlp_apply(ae["encoder"], x) * g.node_mask
            dec = lambda h: mlp_apply(ae["decoder"], h) * g.node_mask
            h0 = enc(g.x)

            # forward fixed point (data; gradients flow via deq_attach_dist)
            fp = jax.lax.stop_gradient(prm["function"])
            h0d = jax.lax.stop_gradient(h0)
            out_fw = solver(lambda h: f(fp, h, h0d, g), h0d,
                            threshold=deq_cfg.fw_thres, eps=deq_cfg.fw_tol,
                            reduce=red, sync=sync, **kw)
            h_star = out_fw.result
            new_h = deq_attach_dist(f, deq_cfg, red, sync,
                                    prm["function"], h_star, h0, g)
            u = dec(new_h)

            u_ext = _halo_exchange(u, halo, n_parts, axis)
            res = partitioned_residual_local(u, u_ext, g, red)

            n_real = red(jnp.sum(g.node_mask))
            D = new_h.shape[-1]
            jac = jac_loss_probe(f, prm["function"], h_star, h0, g, v,
                                 denom=n_real * D, reduce=red)

            u_det = jax.lax.stop_gradient(u)
            h_det = jax.lax.stop_gradient(new_h)
            mm = lambda a, b, w: red(jnp.sum(jnp.square(a - b)
                                             * g.node_mask)) / (n_real * w)
            enc_loss = mm(enc(u_det), h_det, D)
            auto_loss = mm(dec(jax.lax.stop_gradient(enc(u_det))), u_det, 1)
            mse = mm(u_det, g.sol, 1)

            loss = (res + jac_weight * jac + enc_loss + auto_loss)
            aux = {"residual_loss": res, "jacobian_loss": jac,
                   "encoder_loss": enc_loss, "autoencoder_loss": auto_loss,
                   "mse_loss": mse,
                   "fw_nstep": out_fw.nstep.astype(jnp.float32),
                   "fw_lowest": out_fw.lowest}
            loss = jax.lax.pmean(loss, dp_axis)
            aux = jax.tree.map(lambda a: jax.lax.pmean(a, dp_axis), aux)
            return loss, aux

        return shard_map(local, mesh=mesh,
                         in_specs=(P(), P(dp_axis, axis), P(dp_axis, axis)),
                         out_specs=(P(), P()),
                         check_vma=False)(params, pg_stacked, v_stacked)

    return loss_fn


def make_partitioned_train_step(cfg, n_parts: int, halo: int, mesh: Mesh,
                                jac_weight: float = 1.0, clip: float = 0.1,
                                dp_axis: str = "dp", axis: str = "x"):
    """Full partitioned Ψ-GNN train step: shard_mapped loss+implicit grads,
    global-norm clip, dual Adam on replicated params (BASELINE.json
    config 5 — batched multi-mesh training with partitioned graphs).

    ``step(params, opt_state, pg_stacked, rng, lr_deq, lr_ae) ->
    (params, opt_state, loss, aux, grad_norm)``; jit it once per shape."""
    from ..train.optim import adam_update, clip_by_global_norm
    loss_fn = make_partitioned_loss(cfg, n_parts, halo, mesh, jac_weight,
                                    dp_axis, axis)
    def step(params, opt_state, pg_stacked, rng, lr_deq, lr_ae):
        v = jax.random.normal(
            rng, pg_stacked.x.shape[:-1] + (cfg.latent_dim,),
            pg_stacked.x.dtype)
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, pg_stacked, v)
        grads, gnorm = clip_by_global_norm(grads, clip)
        pf, sd = adam_update(grads["function"], opt_state["deq"],
                             params["function"], lr_deq)
        pa, sa = adam_update(grads["autoencoder"], opt_state["ae"],
                             params["autoencoder"], lr_ae)
        return ({"function": pf, "autoencoder": pa},
                {"deq": sd, "ae": sa}, loss, aux, gnorm)

    return step


def unpartition(arr: jax.Array, n_nodes: int) -> jax.Array:
    """(n_parts, n_loc, w) → (n_nodes, w): undo the partition padding."""
    flat = arr.reshape(-1, arr.shape[-1])
    return flat[:n_nodes]
