"""Training THROUGH the partitioned solve: implicit gradients with halo
exchange + psum'd adjoint stopping norms vs the single-device oracle
(BASELINE.json config 5; reference backward-hook semantics
``dirichlet/psignn/model.py:210-225``)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from psignn_tpu.deq import deq_attach, fixed_point_forward, jac_loss_probe
from psignn_tpu.dist.partitioned import (build_partitioned_graph,
                                         make_partitioned_loss,
                                         make_partitioned_train_step,
                                         stack_partitioned_graphs)
from psignn_tpu.graphs import batch_graphs
from psignn_tpu.models import PsignnConfig, psignn_init
from psignn_tpu.models.psignn import make_function
from psignn_tpu.nn import mlp_apply
from psignn_tpu.ops import mse_masked, residual_loss


def _two_rcm_samples(seed=11, hsize=0.11):
    """Two RHS samples on the SAME mesh → identical static partition shape."""
    from psignn_tpu.data.fem import solve_poisson
    from psignn_tpu.data.meshgen import blob_mesh
    from psignn_tpu.data.reader import psignn_sample_from_fem
    from psignn_tpu.kernels import rcm_permutation
    from psignn_tpu.kernels.fused_mp import apply_node_permutation

    rng = np.random.default_rng(seed)
    mesh_geo = blob_mesh(radius=1.0, hsize=hsize, rng=rng)
    samples = []
    for _ in range(2):
        s = psignn_sample_from_fem(solve_poisson(mesh_geo, 1.0, rng))
        perm = rcm_permutation(s["senders"], s["receivers"], s["x"].shape[0])
        samples.append(apply_node_permutation(s, perm))
    return samples


def _oracle_loss(params, g, v1, cfg, jac_weight=1.0):
    """Single-device Ψ-GNN training loss with an explicit Hutchinson probe —
    ``models.psignn.psignn_forward``'s loss with v injected so both sides of
    the parity test use the identical probe."""
    f = make_function(cfg)
    ae = params["autoencoder"]
    enc = lambda x: mlp_apply(ae["encoder"], x) * g.fnode_mask
    dec = lambda h: mlp_apply(ae["decoder"], h) * g.fnode_mask
    h0 = enc(g.x)
    out = fixed_point_forward(f, params["function"], h0, g, cfg.deq)
    new_h = deq_attach(f, cfg.deq, params["function"], out.result, h0, g,
                       jnp.zeros(2))
    u = dec(new_h)
    res = residual_loss(u, g)
    D = new_h.shape[-1]
    jac = jac_loss_probe(f, params["function"], out.result, h0, g, v1,
                         denom=g.total_nodes * D)
    u_det = jax.lax.stop_gradient(u)
    h_det = jax.lax.stop_gradient(new_h)
    enc_loss = mse_masked(enc(u_det), h_det, g.node_mask)
    auto_loss = mse_masked(dec(jax.lax.stop_gradient(enc(u_det))), u_det,
                           g.node_mask)
    return res + jac_weight * jac + enc_loss + auto_loss


def _embed_probe(v_real, n_rows):
    out = np.zeros((n_rows, v_real.shape[1]), np.float32)
    out[: v_real.shape[0]] = v_real
    return jnp.asarray(out)


def _contractive_params(key, cfg, scale=0.5):
    """Random init with the update-function weights scaled down so the DEQ
    map is contractive and the forward/adjoint solves CONVERGE (lowest ≪
    tol).  Implicit grads are only well-defined at a converged fixed point —
    at a plateaued best-iterate the two float reduction orders legitimately
    diverge, which is a property of non-convergence, not of the partition."""
    params = psignn_init(key, cfg)
    fn = jax.tree.map(lambda x: x * scale, params["function"])
    return {"autoencoder": params["autoencoder"], "function": fn}


def test_partitioned_train_grads_match_single_device():
    """grads of the full loss (residual + jac + enc + autoenc) through the
    partitioned DEQ (halo ppermutes inside J, psum'd adjoint norms) must
    match the mean of the per-graph single-device implicit grads."""
    samples = _two_rcm_samples()
    n_nodes = samples[0]["x"].shape[0]
    cfg = PsignnConfig(solver="broyden", fw_tol=1e-6, fw_thres=100,
                       bw_tol=1e-9, bw_thres=100)
    params = _contractive_params(jax.random.PRNGKey(0), cfg)
    D = cfg.latent_dim

    rng = np.random.default_rng(3)
    v_reals = [rng.normal(size=(n_nodes, D)).astype(np.float32)
               for _ in samples]

    # single-device oracle: mean over the two graphs (DataParallel replica
    # mean, training_class.py:156-159)
    def oracle(p):
        total = 0.0
        for s, v_real in zip(samples, v_reals):
            g = batch_graphs([s])
            v1 = _embed_probe(v_real, g.n_node_cap)
            total = total + _oracle_loss(p, g, v1, cfg)
        return total / len(samples)

    loss1, grads1 = jax.value_and_grad(oracle)(params)

    # 2 (dp) × 4 (partition) mesh
    pgs = [build_partitioned_graph(s, n_parts=4) for s in samples]
    stacked = stack_partitioned_graphs(pgs)
    mesh2d = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "x"))
    loss_fn = make_partitioned_loss(cfg, n_parts=4, halo=pgs[0].halo,
                                    mesh=mesh2d, jac_weight=1.0)
    v8 = jnp.stack([
        _embed_probe(v_real, 4 * pgs[0].n_loc).reshape(4, pgs[0].n_loc, D)
        for v_real in v_reals])
    (loss8, aux8), grads8 = jax.value_and_grad(
        loss_fn, has_aux=True)(params, stacked, v8)

    np.testing.assert_allclose(float(loss8), float(loss1), rtol=2e-3)
    flat1 = jax.tree.leaves(grads1)
    flat8 = jax.tree.leaves(grads8)
    assert len(flat1) == len(flat8)
    for a, b in zip(flat8, flat1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-4)


def test_partitioned_train_step_runs_and_descends():
    """A few partitioned train steps execute end to end (dual Adam on
    replicated params) and reduce the training loss."""
    samples = _two_rcm_samples(seed=5)
    cfg = PsignnConfig(solver="broyden", fw_tol=1e-5, fw_thres=60,
                       bw_tol=1e-7, bw_thres=60)
    params = _contractive_params(jax.random.PRNGKey(1), cfg)
    from psignn_tpu.train.optim import init_adam
    opt_state = {"deq": init_adam(params["function"]),
                 "ae": init_adam(params["autoencoder"])}

    pgs = [build_partitioned_graph(s, n_parts=4) for s in samples]
    stacked = stack_partitioned_graphs(pgs)
    mesh2d = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("dp", "x"))
    step = jax.jit(make_partitioned_train_step(
        cfg, n_parts=4, halo=pgs[0].halo, mesh=mesh2d,
        jac_weight=1.0, clip=0.1))

    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(4):
        key, k = jax.random.split(key)
        params, opt_state, loss, aux, gnorm = step(
            params, opt_state, stacked, k, 0.01, 0.05)
        losses.append(float(loss))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(gnorm))
    assert losses[-1] < losses[0]
