"""Ψ-GNN: deep-equilibrium GNN Poisson solver.

Re-designs ``dirichlet/psignn/model.py`` (ModelDEQDSS, 456 LoC) and its
mixed-BC sibling ``mixed/psignn/model.py`` as one functional model:

* shared 1↔latent autoencoder (model.py:35-37, 391-406)
* update function f_θ: two directional message passings + sigmoid gate +
  gated MLP update + LayerNorm on the last layer + hard Dirichlet reset
  (model.py:263-300); mixed mode adds a Neumann message-passing branch and
  a dedicated Neumann update overwriting Neumann rows before the Dirichlet
  reset (mixed/psignn/model.py:195-246)
* DEQ solve with implicit backward (see psignn_tpu.deq)
* losses: residual, jacobian, encoder, autoencoder round-trip, report-only
  MSE vs FEM and Dirichlet-node MSE (model.py:58-97)

In-place row assignments become ``jnp.where`` on tag masks, and the update
function masks padded rows to zero so solver norms equal the unpadded
computation.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from ..deq import DEQConfig, deq_solve, fixed_point_forward
from ..graphs import PaddedGraph
from ..nn import (layer_norm_apply, layer_norm_init, linear_apply,
                  linear_init, mlp_apply, mlp_init)
from ..ops import message_passing, mse_masked, residual_loss


@dataclasses.dataclass(frozen=True)
class PsignnConfig:
    latent_dim: int = 10
    n_layers: int = 1
    bc_mode: str = "dirichlet"          # 'dirichlet' | 'mixed'
    solver: str = "broyden"
    fw_tol: float = 1e-5
    fw_thres: int = 300
    bw_tol: float = 1e-8
    bw_thres: int = 300
    jac_vecs: int = 1                   # model.py:207 uses vecs=1
    edge_dim: int = 3
    lowrank_bf16: bool = False          # bf16 Broyden rank buffers (TPU perf)
    lowrank_max_rank: int = 0           # >0: L-BFGS-style Broyden rank cap
    ls: bool = False                    # Broyden Armijo line search

    @property
    def prb_dim(self) -> int:
        # second_member_dim: 2 Dirichlet (model.py:50), 3 mixed
        # (mixed/psignn/model.py:50)
        return 2 if self.bc_mode == "dirichlet" else 3

    @property
    def deq(self) -> DEQConfig:
        return DEQConfig(solver=self.solver, fw_tol=self.fw_tol,
                         fw_thres=self.fw_thres, bw_tol=self.bw_tol,
                         bw_thres=self.bw_thres,
                         lowrank_bf16=self.lowrank_bf16,
                         lowrank_max_rank=self.lowrank_max_rank,
                         ls=self.ls)


def psignn_init(key: jax.Array, cfg: PsignnConfig) -> Dict:
    D, E, P = cfg.latent_dim, cfg.edge_dim, cfg.prb_dim
    keys = iter(jax.random.split(key, 6 * cfg.n_layers + 8))
    layers = []
    for _ in range(cfg.n_layers):
        layers.append({
            "phi_to": mlp_init(next(keys), [2 * D + E, D, D]),
            "phi_from": mlp_init(next(keys), [2 * D + E, D, D]),
            "update": mlp_init(next(keys), [3 * D + P, D, D]),
        })
    function = {
        "layers": layers,
        "alpha": linear_init(next(keys), 3 * D + P, 1),
        "laynorm": layer_norm_init(D),
    }
    if cfg.bc_mode == "mixed":
        function["phi_neumann"] = mlp_init(next(keys), [2 * D + E, D, D])
        function["update_neumann"] = mlp_init(next(keys), [2 * D + P + 2, D, D])
    return {
        "autoencoder": {
            "encoder": mlp_init(next(keys), [1, D, D]),
            "decoder": mlp_init(next(keys), [D, D, 1]),
        },
        "function": function,
    }


def encoder_apply(p, x):
    return mlp_apply(p["encoder"], x)


def decoder_apply(p, x):
    return mlp_apply(p["decoder"], x)


def make_function(cfg: PsignnConfig):
    """The DEQ update function f(params, h, h_initial, graph) -> h'.

    Signature shaped for psignn_tpu.deq: params is the `function` sub-tree.
    """
    mixed = cfg.bc_mode == "mixed"

    def f(params, h, h_initial, graph: PaddedGraph):
        dir_mask = graph.dirichlet_mask
        neu_mask = graph.neumann_mask if mixed else None
        n_layers = len(params["layers"])
        for k, layer in enumerate(params["layers"]):
            mp_to = message_passing(layer["phi_to"], h, graph, "to")
            mp_from = message_passing(layer["phi_from"], h, graph, "from")
            concat = jnp.concatenate([h, mp_to, mp_from, graph.prb_data], axis=-1)
            alpha = jax.nn.sigmoid(linear_apply(params["alpha"], concat))
            update = alpha * mlp_apply(layer["update"], concat)

            if mixed:
                mp_neu = message_passing(params["phi_neumann"], h, graph, "from")
                concat_neu = jnp.concatenate(
                    [h, mp_neu, graph.prb_data, graph.unit_normal_vector], axis=-1)
                upd_neu = mlp_apply(params["update_neumann"], concat_neu)
                h_next = h + update
                h_next = jnp.where(neu_mask > 0, upd_neu, h_next)
                if k == n_layers - 1:
                    h_next = layer_norm_apply(params["laynorm"], h_next)
            else:
                h_next = h + update
                if k == n_layers - 1:
                    h_next = layer_norm_apply(params["laynorm"], h_next)

            # hard Dirichlet reset (model.py:298)
            h = jnp.where(dir_mask > 0, h_initial, h_next)
            # padded rows stay exactly zero (solver-norm parity)
            h = h * graph.fnode_mask
        return h

    return f


class PsignnOutput(NamedTuple):
    u_final: jax.Array
    losses: Dict[str, jax.Array]


def psignn_forward(params: Dict, graph: PaddedGraph, cfg: PsignnConfig,
                   rng: jax.Array, training: bool = True,
                   bw_sink=None) -> PsignnOutput:
    """Full forward with the loss dictionary (model.py:58-97).

    ``bw_sink``: optional (2,) zeros whose loss-gradient carries the
    backward implicit solve's (lowest, nstep) — see ``deq.deq_attach``."""
    f = make_function(cfg)
    ae = params["autoencoder"]
    h_initial = encoder_apply(ae, graph.x) * graph.fnode_mask

    deq_out = deq_solve(f, params["function"], h_initial, graph, cfg.deq,
                        rng, compute_sradius=not training,
                        jac_vecs=cfg.jac_vecs, bw_sink=bw_sink)
    h_final = deq_out.new_h_star
    u_final = decoder_apply(ae, h_final) * graph.fnode_mask

    res = residual_loss(u_final, graph)

    u_det = jax.lax.stop_gradient(u_final)
    h_det = jax.lax.stop_gradient(h_final)
    # encoder loss on detached values (model.py:75-79)
    enc_loss = mse_masked(encoder_apply(ae, u_det), h_det, graph.node_mask)
    # decoder round-trip with detached encoding (model.py:82)
    auto_loss = mse_masked(
        decoder_apply(ae, jax.lax.stop_gradient(encoder_apply(ae, u_det))),
        u_det, graph.node_mask)

    mse = mse_masked(u_final, graph.sol, graph.node_mask)
    dmask = graph.dirichlet_mask[:, 0] > 0
    mse_dir = mse_masked(u_final, graph.x, dmask)

    losses = {
        "residual_loss": res,
        "jacobian_loss": deq_out.jac_loss,
        "encoder_loss": enc_loss,
        "autoencoder_loss": auto_loss,
        "mse_loss": mse,
        "mse_dirichlet": mse_dir,
        "fw_lowest": deq_out.fw_lowest,
        "fw_nstep": deq_out.fw_nstep.astype(jnp.float32),
        "sradius": deq_out.sradius,
    }
    return PsignnOutput(u_final=u_final, losses=losses)


def psignn_forward_stacked(params: Dict, stacked: PaddedGraph,
                           cfg: PsignnConfig, rng: jax.Array,
                           training: bool = True,
                           bw_sink=None) -> PsignnOutput:
    """Per-graph vmapped forward over a stacked batch (leading G axis).

    The concatenated ``psignn_forward`` solves the whole batch jointly with
    one residual norm (what the reference's collated Batch does per
    replica); this variant vmaps the full DEQ per graph, so each mesh stops
    at its own tolerance — under ``vmap`` the while_loop keeps stepping only
    unconverged lanes' states via select, giving true per-graph adaptive
    iteration counts (the reference gets this granularity only when
    DataParallel happens to scatter one graph per replica).  Losses are
    averaged over graphs (exactly DataParallel's replica-mean,
    training_class.py:156-159).
    """
    n_graphs = stacked.x.shape[0]
    keys = jax.random.split(rng, n_graphs)

    # The fused Pallas MP kernel's custom_vjp closes over its MPBlocks edge
    # packing; under vmap those closure captures become BatchTracers, which
    # custom_vjp forbids (UnexpectedTracerError).  Per-graph solves use the
    # XLA take/segment_sum path instead — vmap composes with it natively.
    if stacked.mp_blocks_to is not None or stacked.mp_blocks_from is not None:
        import dataclasses as _dc
        stacked = _dc.replace(stacked, mp_blocks_to=None, mp_blocks_from=None)

    if bw_sink is None:
        bw_sink = jnp.zeros((n_graphs, 2), jnp.float32)

    def one(graph, key, sink):
        out = psignn_forward(params, graph, cfg, key, training=training,
                             bw_sink=sink)
        return out

    outs = jax.vmap(one)(stacked, keys, bw_sink)
    losses = {k: jnp.mean(v) for k, v in outs.losses.items()}
    losses["fw_nstep_per_graph"] = outs.losses["fw_nstep"]
    return PsignnOutput(u_final=outs.u_final, losses=losses)


def stack_single_graphs(samples, n_node_cap=None, n_edge_cap=None):
    """Build a stacked PaddedGraph: each sample becomes its own padded
    single-graph PaddedGraph; all are stacked on a new leading axis."""
    from ..graphs import batch_graphs, bucket_size
    if n_node_cap is None:
        n_node_cap = bucket_size(max(s["x"].shape[0] for s in samples) + 1)
    if n_edge_cap is None:
        n_edge_cap = bucket_size(max(len(s["senders"]) for s in samples) + 1,
                                 1024)
    per = [batch_graphs([s], n_node_cap=n_node_cap, n_edge_cap=n_edge_cap)
           for s in samples]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per)


def psignn_inference(params: Dict, graph: PaddedGraph, cfg: PsignnConfig):
    """Solve and decode, no losses (model.py:99-107). Returns (u, nstep,
    lowest)."""
    f = make_function(cfg)
    ae = params["autoencoder"]
    h_initial = encoder_apply(ae, graph.x) * graph.fnode_mask
    out = fixed_point_forward(f, params["function"], h_initial, graph, cfg.deq)
    u = decoder_apply(ae, out.result) * graph.fnode_mask
    return u, out.nstep, out.lowest


def psignn_iterative_inference(params: Dict, graph: PaddedGraph,
                               cfg: PsignnConfig):
    """Decoded iterate trace for intermediate-solution inspection
    (model.py:109-155). Returns dict of per-iterate metrics arrays."""
    f = make_function(cfg)
    ae = params["autoencoder"]
    h_initial = encoder_apply(ae, graph.x) * graph.fnode_mask
    out = fixed_point_forward(f, params["function"], h_initial, graph,
                              cfg.deq, keep_trace=True)

    bmask = graph.dirichlet_mask[:, 0] > 0
    imask = (~bmask) & graph.node_mask

    def per_iter(h):
        u = decoder_apply(ae, h) * graph.fnode_mask
        return dict(
            res=residual_loss(u, graph),
            mse=mse_masked(u, graph.sol, graph.node_mask),
            bound_mse=mse_masked(u, graph.sol, bmask),
            inter_mse=mse_masked(u, graph.sol, imask),
            u=u,
        )

    metrics = jax.vmap(per_iter)(out.trace)

    # iterate 0 is the raw initial condition x (model.py:127-131)
    u0 = dict(
        res=residual_loss(graph.x, graph),
        mse=mse_masked(graph.x, graph.sol, graph.node_mask),
        bound_mse=mse_masked(graph.x, graph.sol, bmask),
        inter_mse=mse_masked(graph.x, graph.sol, imask),
        u=graph.x,
    )
    return dict(initial=u0, trace=metrics, nstep=out.nstep,
                trace_len=out.trace_len)
