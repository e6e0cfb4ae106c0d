"""Model family tests on a tiny generated dataset."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psignn_tpu.data.generate import generate_data, add_dss_variable
from psignn_tpu.data.reader import load_dataset, GraphLoader
from psignn_tpu.graphs import batch_graphs
from psignn_tpu.models import (PsignnConfig, psignn_init, psignn_forward,
                               psignn_inference, psignn_iterative_inference,
                               DsgpsConfig, dsgps_init, dsgps_forward,
                               dsgps_inference,
                               DssConfig, dss_init, dss_forward, dss_inference)
from psignn_tpu.models.psignn import make_function, encoder_apply


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data"))
    generate_data(path, n_mesh=2, n_samples=3, hsize=0.25, seed=11,
                  verbose=False)
    add_dss_variable(path)
    return path


@pytest.fixture(scope="module")
def graph(data_dir):
    samples = load_dataset(data_dir, family="psignn")
    return batch_graphs(samples[:2])


@pytest.fixture(scope="module")
def dss_graph(data_dir):
    samples = load_dataset(data_dir, family="dss")
    return batch_graphs(samples[:2])


def mixed_synthetic_graph():
    """Synthetic mixed-BC style sample: 3-col one-hot tags, 3-col prb,
    unit normals."""
    rng = np.random.default_rng(0)
    n = 20
    dense = np.zeros((n, n), np.float32)
    for i in range(n):
        dense[i, i] = 1.0
        for j in rng.choice(n, 3, replace=False):
            if i != j:
                dense[i, j] = rng.normal()
    s, r = np.nonzero(dense)
    kinds = rng.choice(3, size=n, p=[0.5, 0.25, 0.25])
    tags = np.eye(3, dtype=np.float32)[kinds]
    sample = dict(
        x=rng.normal(size=(n, 1)).astype(np.float32),
        b=rng.normal(size=(n, 1)).astype(np.float32),
        sol=rng.normal(size=(n, 1)).astype(np.float32),
        prb_data=rng.normal(size=(n, 3)).astype(np.float32),
        tags=tags,
        pos=rng.normal(size=(n, 2)).astype(np.float32),
        senders=s.astype(np.int32), receivers=r.astype(np.int32),
        a_ij=dense[s, r].reshape(-1, 1),
        edge_attr=rng.normal(size=(len(s), 3)).astype(np.float32),
        unit_normal_vector=rng.normal(size=(n, 2)).astype(np.float32),
    )
    return batch_graphs([sample])


def test_psignn_function_invariants(graph):
    cfg = PsignnConfig(fw_thres=30)
    params = psignn_init(jax.random.PRNGKey(0), cfg)
    f = make_function(cfg)
    h0 = encoder_apply(params["autoencoder"], graph.x) * graph.fnode_mask
    h1 = f(params["function"], h0, h0, graph)
    # Dirichlet rows reset to h_initial
    dmask = np.asarray(graph.dirichlet_mask[:, 0]) > 0
    np.testing.assert_allclose(np.asarray(h1)[dmask], np.asarray(h0)[dmask],
                               rtol=1e-6)
    # padded rows exactly zero
    pmask = ~np.asarray(graph.node_mask)
    np.testing.assert_array_equal(np.asarray(h1)[pmask], 0.0)


def test_psignn_forward_and_grads(graph):
    cfg = PsignnConfig(solver="broyden", fw_tol=1e-4, fw_thres=60,
                       bw_tol=1e-6, bw_thres=60)
    params = psignn_init(jax.random.PRNGKey(1), cfg)
    out = psignn_forward(params, graph, cfg, jax.random.PRNGKey(2))
    for k, v in out.losses.items():
        assert np.isfinite(float(v)), k
    assert out.u_final.shape == graph.x.shape

    def loss_fn(p):
        o = psignn_forward(p, graph, cfg, jax.random.PRNGKey(2))
        return (o.losses["residual_loss"] + o.losses["jacobian_loss"]
                + o.losses["encoder_loss"] + o.losses["autoencoder_loss"])

    g = jax.grad(loss_fn)(params)
    gnorm_fn = jnp.sqrt(sum(jnp.sum(x ** 2) for x in
                            jax.tree.leaves(g["function"])))
    gnorm_ae = jnp.sqrt(sum(jnp.sum(x ** 2) for x in
                            jax.tree.leaves(g["autoencoder"])))
    assert float(gnorm_fn) > 0 and np.isfinite(float(gnorm_fn))
    assert float(gnorm_ae) > 0 and np.isfinite(float(gnorm_ae))


def test_psignn_inference_and_trace(graph):
    cfg = PsignnConfig(solver="forward_iteration", fw_tol=1e-4, fw_thres=40)
    params = psignn_init(jax.random.PRNGKey(3), cfg)
    u, nstep, lowest = psignn_inference(params, graph, cfg)
    assert u.shape == graph.x.shape
    out = psignn_iterative_inference(params, graph, cfg)
    assert out["trace"]["res"].shape[0] == 42  # threshold + 2 iterate slots
    assert np.isfinite(float(out["initial"]["res"]))


def test_psignn_mixed_forward():
    g = mixed_synthetic_graph()
    cfg = PsignnConfig(bc_mode="mixed", solver="forward_iteration",
                       fw_tol=1e-4, fw_thres=30, bw_thres=30)
    params = psignn_init(jax.random.PRNGKey(4), cfg)
    assert "phi_neumann" in params["function"]
    out = psignn_forward(params, g, cfg, jax.random.PRNGKey(5))
    assert np.isfinite(float(out.losses["residual_loss"]))

    f = make_function(cfg)
    h0 = encoder_apply(params["autoencoder"], g.x) * g.fnode_mask
    h1 = f(params["function"], h0, h0, g)
    dmask = np.asarray(g.tags[:, 1]) == 1
    np.testing.assert_allclose(np.asarray(h1)[dmask], np.asarray(h0)[dmask],
                               rtol=1e-6)


@pytest.mark.parametrize("bc_mode", ["dirichlet"])
def test_dsgps_forward_and_grads(graph, bc_mode):
    cfg = DsgpsConfig(k=5, gamma=0.9, bc_mode=bc_mode)
    params = dsgps_init(jax.random.PRNGKey(6), cfg)
    out = dsgps_forward(params, graph, cfg)
    assert out.losses["res_per_iter"].shape == (5,)
    assert np.isfinite(float(out.losses["train_loss"]))

    g = jax.grad(lambda p: dsgps_forward(p, graph, cfg).losses["train_loss"])(params)
    for name in ["phi_to", "z_k", "correction"]:
        gn = sum(float(jnp.sum(x ** 2)) for x in jax.tree.leaves(g[name]))
        assert gn > 0, name
    # encoder gets gradient from both H0 path and enc loss
    gn_enc = sum(float(jnp.sum(x ** 2))
                 for x in jax.tree.leaves(g["autoencoder"]["encoder"]))
    assert gn_enc > 0

    u = dsgps_inference(params, graph, cfg, k=7)
    assert u.shape == graph.x.shape


def test_dsgps_mixed_forward():
    g = mixed_synthetic_graph()
    cfg = DsgpsConfig(k=3, bc_mode="mixed")
    params = dsgps_init(jax.random.PRNGKey(7), cfg)
    out = dsgps_forward(params, g, cfg)
    assert np.isfinite(float(out.losses["train_loss"]))


def test_dsgps_mixed_enc_loss_override():
    """--enc_loss_mode freeze on the mixed variant (the round-5 fix,
    docs/dsgps_dynamics.md): loss VALUES change only via gradient
    routing; freeze mode must route enc-loss gradients into the
    recurrence (via H) where detach mode must not, and the override must
    survive a config round-trip through checkpoint hyperparameters."""
    import dataclasses
    g = mixed_synthetic_graph()
    cfg_d = DsgpsConfig(k=3, bc_mode="mixed")
    cfg_f = DsgpsConfig(k=3, bc_mode="mixed", enc_loss_override="freeze")
    assert cfg_d.enc_loss_mode == "detach" and cfg_f.enc_loss_mode == "freeze"
    params = dsgps_init(jax.random.PRNGKey(7), cfg_f)

    # config survives the trainer's hyperparameters round-trip
    assert DsgpsConfig(**dataclasses.asdict(cfg_f)).enc_loss_mode == "freeze"

    # in detach mode the enc loss backprops ONLY into the encoder; in
    # freeze mode its value-gradients reach the recurrence params too
    def enc_term(p, cfg):
        return dsgps_forward(p, g, cfg).losses["encoder_loss"]
    g_det = jax.grad(lambda p: enc_term(p, cfg_d))(params)
    g_frz = jax.grad(lambda p: enc_term(p, cfg_f))(params)
    corr_det = sum(float(jnp.sum(x ** 2))
                   for x in jax.tree.leaves(g_det["correction"]))
    corr_frz = sum(float(jnp.sum(x ** 2))
                   for x in jax.tree.leaves(g_frz["correction"]))
    assert corr_det == 0.0
    assert corr_frz > 0.0


def test_dss_forward_and_grads(dss_graph):
    cfg = DssConfig(k=4, alpha=1e-3, gamma=0.9)
    params = dss_init(jax.random.PRNGKey(8), cfg)
    # stacked layer params have leading k axis
    assert params["layers"]["psi"][0]["w"].shape[0] == 4
    out = dss_forward(params, dss_graph, cfg)
    assert out.losses["res_per_iter"].shape == (4,)
    assert np.isfinite(float(out.losses["train_loss"]))

    g = jax.grad(lambda p: dss_forward(p, dss_graph, cfg).losses["train_loss"])(params)
    gn = sum(float(jnp.sum(x ** 2)) for x in jax.tree.leaves(g))
    assert gn > 0 and np.isfinite(gn)

    u = dss_inference(params, dss_graph, cfg)
    np.testing.assert_allclose(np.asarray(u), np.asarray(out.u_final),
                               rtol=1e-5, atol=1e-6)


def test_dsgps_training_reduces_loss(graph):
    """A few Adam steps on the tiny batch should reduce the train loss."""
    import optax
    cfg = DsgpsConfig(k=3)
    params = dsgps_init(jax.random.PRNGKey(9), cfg)
    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(
            lambda q: dsgps_forward(q, graph, cfg).losses["train_loss"])(p)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, loss

    losses = []
    for _ in range(12):
        params, state, l = step(params, state)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_psignn_stacked_matches_per_sample(data_dir):
    """vmapped per-graph solve == solving each graph alone."""
    from psignn_tpu.data.reader import load_dataset
    from psignn_tpu.models.psignn import (psignn_forward_stacked,
                                          stack_single_graphs)

    samples = load_dataset(data_dir, family="psignn")[:3]
    cfg = PsignnConfig(solver="forward_iteration", fw_tol=1e-4, fw_thres=25,
                       bw_thres=25)
    params = psignn_init(jax.random.PRNGKey(10), cfg)
    stacked = stack_single_graphs(samples)
    rng = jax.random.PRNGKey(11)
    out = psignn_forward_stacked(params, stacked, cfg, rng)
    assert out.u_final.shape[0] == 3
    assert out.losses["fw_nstep_per_graph"].shape == (3,)

    # per-sample oracle (same rngs as the vmap fold)
    keys = jax.random.split(rng, 3)
    per = []
    for i in range(3):
        g = jax.tree.map(lambda x: x[i], stacked)
        per.append(psignn_forward(params, g, cfg, keys[i]))
    res_mean = np.mean([float(p.losses["residual_loss"]) for p in per])
    np.testing.assert_allclose(float(out.losses["residual_loss"]), res_mean,
                               rtol=1e-5)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(out.u_final[i]),
                                   np.asarray(per[i].u_final),
                                   rtol=1e-4, atol=1e-5)


def test_psignn_stacked_with_kernel_packings(data_dir):
    """--stacked_batch + --pallas regression: the loader stacks per-graph
    PaddedGraphs that carry MPBlocks kernel packings; psignn_forward_stacked
    must not vmap the fused kernel over them (its custom_vjp closes over the
    block arrays -> UnexpectedTracerError, round-4 fix) but strip them and
    take the XLA MP path."""
    from psignn_tpu.models.psignn import psignn_forward_stacked

    samples = load_dataset(data_dir, family="psignn")[:4]
    loader = GraphLoader(samples, batch_size=2, rcm=True,
                         pack_kernel_blocks=True, stacked=True)
    stacked = next(iter(loader))
    assert stacked.mp_blocks_to is not None
    cfg = PsignnConfig(solver="forward_iteration", fw_tol=1e-4, fw_thres=12,
                       bw_thres=12)
    params = psignn_init(jax.random.PRNGKey(3), cfg)

    def loss_fn(p):
        out = psignn_forward_stacked(params | p, stacked,
                                     cfg, jax.random.PRNGKey(4))
        return out.losses["residual_loss"]

    # forward AND gradient (the custom_vjp leak fired on the backward build)
    val, grads = jax.value_and_grad(
        lambda p: loss_fn(p))({"function": params["function"]})
    assert np.isfinite(float(val))
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
