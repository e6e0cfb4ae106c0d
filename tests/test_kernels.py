"""Pallas fused message-passing kernel vs the XLA ops oracle (interpret
mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psignn_tpu import ops
from psignn_tpu.data.generate import generate_data
from psignn_tpu.data.reader import load_dataset
from psignn_tpu.graphs import batch_graphs
from psignn_tpu.kernels import (pack_mp_blocks, fused_message_passing,
                                rcm_permutation)
from psignn_tpu.kernels.fused_mp import apply_node_permutation
from psignn_tpu.nn import mlp_init


@pytest.fixture(scope="module")
def graph():
    import tempfile
    path = tempfile.mkdtemp()
    generate_data(path, n_mesh=2, n_samples=2, hsize=0.2, seed=41,
                  verbose=False)
    samples = load_dataset(path, family="psignn")
    # RCM-permute each sample for small kernel windows
    out = []
    for s in samples[:2]:
        perm = rcm_permutation(s["senders"], s["receivers"], len(s["x"]))
        out.append(apply_node_permutation(s, perm))
    return batch_graphs(out)


def test_rcm_reduces_bandwidth(graph):
    s = np.asarray(graph.senders)[np.asarray(graph.edge_mask)]
    r = np.asarray(graph.receivers)[np.asarray(graph.edge_mask)]
    bw = np.abs(s - r).max()
    assert bw < 160  # RCM bandwidth on these meshes is tiny vs N


def test_apply_node_permutation_preserves_graph():
    rng = np.random.default_rng(0)
    n = 30
    sample = dict(
        x=rng.normal(size=(n, 1)).astype(np.float32),
        senders=rng.integers(0, n, 50).astype(np.int32),
        receivers=rng.integers(0, n, 50).astype(np.int32),
        a_ij=rng.normal(size=(50, 1)).astype(np.float32),
    )
    perm = rng.permutation(n)
    out = apply_node_permutation(sample, perm)
    # edge values still connect the same feature vectors
    for e in range(50):
        old_s = sample["senders"][e]
        np.testing.assert_allclose(out["x"][out["senders"][e]],
                                   sample["x"][old_s])


@pytest.mark.parametrize("direction", ["to", "from"])
def test_fused_mp_matches_ops(graph, direction):
    D = 10
    params = mlp_init(jax.random.PRNGKey(0), [2 * D + 3, D, D])
    h = jax.random.normal(jax.random.PRNGKey(1), (graph.n_node_cap, D))

    want = ops.message_passing(params, h, graph, direction)

    blocks = pack_mp_blocks(
        np.asarray(graph.senders), np.asarray(graph.receivers),
        np.asarray(graph.edge_attr), np.asarray(graph.edge_mask),
        graph.n_node_cap, direction)
    got = fused_message_passing(params, h, blocks, D, interpret=True)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pack_blocks_shapes(graph):
    blocks = pack_mp_blocks(
        np.asarray(graph.senders), np.asarray(graph.receivers),
        np.asarray(graph.edge_attr), np.asarray(graph.edge_mask),
        graph.n_node_cap, "to")
    assert blocks.agg_local.shape[0] == graph.n_node_cap // 128
    assert blocks.window % 128 == 0
    assert int(blocks.mask.sum()) == int(
        (graph.edge_mask & (graph.senders != graph.receivers)).sum())
    # every local index within bounds
    assert int(blocks.agg_local.max()) < 128
    assert int(blocks.oth_local.max()) < blocks.window


def test_mp_from_blocks_matches_ops(graph):
    from psignn_tpu.kernels.fused_mp import mp_from_blocks
    D = 10
    params = mlp_init(jax.random.PRNGKey(2), [2 * D + 3, D, D])
    h = jax.random.normal(jax.random.PRNGKey(3), (graph.n_node_cap, D))
    for direction in ("to", "from"):
        blocks = pack_mp_blocks(
            np.asarray(graph.senders), np.asarray(graph.receivers),
            np.asarray(graph.edge_attr), np.asarray(graph.edge_mask),
            graph.n_node_cap, direction)
        got = mp_from_blocks(params, h, blocks)
        want = ops.message_passing(params, h, graph, direction)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_fused_mp_gradients_match_ops(graph):
    """custom_vjp backward (XLA recompute) == differentiating the ops path."""
    D = 10
    params = mlp_init(jax.random.PRNGKey(4), [2 * D + 3, D, D])
    h = jax.random.normal(jax.random.PRNGKey(5), (graph.n_node_cap, D))
    blocks = pack_mp_blocks(
        np.asarray(graph.senders), np.asarray(graph.receivers),
        np.asarray(graph.edge_attr), np.asarray(graph.edge_mask),
        graph.n_node_cap, "to")

    def loss_kernel(p, hh):
        out = fused_message_passing(p, hh, blocks, D, interpret=True)
        return jnp.sum(out ** 2)

    def loss_ops(p, hh):
        return jnp.sum(ops.message_passing(p, hh, graph, "to") ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1))(params, h)
    go = jax.grad(loss_ops, argnums=(0, 1))(params, h)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(go)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_fused_mp_bwd_kernel_matches_oracle_vjp(graph):
    """The dedicated backward kernel == jax.vjp of the XLA oracle."""
    from psignn_tpu.kernels.fused_mp import (_fused_mp_bwd_kernel,
                                             mp_from_blocks)
    D = 10
    params = mlp_init(jax.random.PRNGKey(6), [2 * D + 3, D, D])
    h = jax.random.normal(jax.random.PRNGKey(7), (graph.n_node_cap, D))
    g = jax.random.normal(jax.random.PRNGKey(8), (graph.n_node_cap, D))
    blocks = pack_mp_blocks(
        np.asarray(graph.senders), np.asarray(graph.receivers),
        np.asarray(graph.edge_attr), np.asarray(graph.edge_mask),
        graph.n_node_cap, "from")

    got = _fused_mp_bwd_kernel(params, h, blocks, g, D, interpret=True)
    _, vjp_fn = jax.vjp(lambda p, x: mp_from_blocks(p, x, blocks), params, h)
    want = vjp_fn(g)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fused_mp_second_order_matches_ops(graph):
    """grad through a vjp (the Hutchinson jac-loss pattern,
    psignn/model.py:416-435) routes through the backward kernel's own
    custom_vjp fallback and must equal the pure-ops result."""
    D = 10
    params = mlp_init(jax.random.PRNGKey(9), [2 * D + 3, D, D])
    h = jax.random.normal(jax.random.PRNGKey(10), (graph.n_node_cap, D))
    v = jax.random.normal(jax.random.PRNGKey(11), (graph.n_node_cap, D))
    blocks = pack_mp_blocks(
        np.asarray(graph.senders), np.asarray(graph.receivers),
        np.asarray(graph.edge_attr), np.asarray(graph.edge_mask),
        graph.n_node_cap, "to")

    def jacish_kernel(p, hh):
        _, vjp_fn = jax.vjp(
            lambda x: fused_message_passing(p, x, blocks, D, interpret=True),
            hh)
        return jnp.sum(vjp_fn(v)[0] ** 2)

    def jacish_ops(p, hh):
        _, vjp_fn = jax.vjp(
            lambda x: ops.message_passing(p, x, graph, "to"), hh)
        return jnp.sum(vjp_fn(v)[0] ** 2)

    gk = jax.grad(jacish_kernel, argnums=(0, 1))(params, h)
    go = jax.grad(jacish_ops, argnums=(0, 1))(params, h)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(go)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_dss_kernel_path_matches(monkeypatch):
    """DSS forward via the fused kernel (interpret) == the XLA path."""
    import tempfile
    from psignn_tpu import ops
    from psignn_tpu.data.generate import generate_data, add_dss_variable
    from psignn_tpu.data.reader import load_dataset
    from psignn_tpu.kernels import fused_mp as fm
    from psignn_tpu.models import DssConfig, dss_init, dss_forward

    path = tempfile.mkdtemp()
    generate_data(path, n_mesh=1, n_samples=2, hsize=0.25, seed=71,
                  verbose=False)
    add_dss_variable(path)
    samples = load_dataset(path, family="dss")
    g_plain = batch_graphs(samples[:2])
    g_packed = batch_graphs(samples[:2], pack_kernel_blocks=True)
    assert g_packed.mp_blocks_to.edge_attr.shape[-1] == 1  # a_ij_norm

    cfg = DssConfig(k=3)
    params = dss_init(jax.random.PRNGKey(0), cfg)
    want = dss_forward(params, g_plain, cfg)

    # force interpret mode for the CPU test
    orig = fm.fused_message_passing
    monkeypatch.setattr(
        fm, "fused_message_passing",
        lambda p, h, b, latent_dim, interpret=False:
            orig(p, h, b, latent_dim, interpret=True))
    import psignn_tpu.kernels as K
    monkeypatch.setattr(K, "fused_message_passing", fm.fused_message_passing)
    monkeypatch.setattr(ops, "USE_PALLAS_MP", True)
    got = dss_forward(params, g_packed, cfg)
    np.testing.assert_allclose(np.asarray(got.u_final),
                               np.asarray(want.u_final), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(got.losses["train_loss"]),
                               float(want.losses["train_loss"]), rtol=2e-4)
