"""Multi-device tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from psignn_tpu.data.generate import generate_data
from psignn_tpu.data.reader import load_dataset, GraphLoader
from psignn_tpu.dist import (make_mesh, stack_graphs, shard_stacked,
                             dp_value_and_grad, partition_message_passing,
                             partition_spmv)
from psignn_tpu.dist.partition import pad_edges_for_sharding
from psignn_tpu.graphs import batch_graphs
from psignn_tpu.models import (DsgpsConfig, dsgps_forward, dsgps_init,
                               PsignnConfig, psignn_forward, psignn_init)
from psignn_tpu import ops
from psignn_tpu.nn import mlp_init


@pytest.fixture(scope="module")
def samples(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data"))
    generate_data(path, n_mesh=2, n_samples=8, hsize=0.25, seed=31,
                  verbose=False)
    return load_dataset(path, family="psignn")


def test_dp_matches_single_device(samples):
    """pmean of per-device grads == grad of mean of per-device losses."""
    n_dev = 4
    mesh = make_mesh(n_dev)
    cfg = DsgpsConfig(k=3)
    params = dsgps_init(jax.random.PRNGKey(0), cfg)

    caps = dict(n_node_cap=512, n_edge_cap=4096)
    per_dev = [batch_graphs(samples[2 * i:2 * i + 2], **caps)
               for i in range(n_dev)]
    stacked = shard_stacked(stack_graphs(per_dev), mesh)

    def loss_fn(p, graph, rng):
        out = dsgps_forward(p, graph, cfg)
        return out.losses["train_loss"], {"mse": out.losses["mse_loss"]}

    vag = jax.jit(dp_value_and_grad(loss_fn, mesh))
    loss_dp, aux_dp, grads_dp = vag(params, stacked, jax.random.PRNGKey(1))

    # single-device oracle: mean over the same 4 sub-batches
    losses, grads = [], []
    for g in per_dev:
        (l, _), gr = jax.value_and_grad(loss_fn, has_aux=True)(
            params, g, jax.random.PRNGKey(1))
        losses.append(l)
        grads.append(gr)
    want_loss = np.mean([float(l) for l in losses])
    want_grads = jax.tree.map(lambda *x: sum(x) / n_dev, *grads)

    np.testing.assert_allclose(float(loss_dp), want_loss, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(grads_dp), jax.tree.leaves(want_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_partition_mp_matches_ops(samples):
    n_dev = 8
    mesh = make_mesh(n_dev, axis="x")
    g = batch_graphs(samples[:2])
    D = 6
    params = mlp_init(jax.random.PRNGKey(2), [2 * D + 3, D, D])
    h = jax.random.normal(jax.random.PRNGKey(3), (g.n_node_cap, D))

    mp = partition_message_passing(mesh, axis="x")
    for direction in ("to", "from"):
        want = ops.message_passing(params, h, g, direction)
        got = mp(params, h, g.senders, g.receivers, g.edge_attr,
                 g.edge_mask, direction)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_partition_spmv_matches_ops(samples):
    mesh = make_mesh(8, axis="x")
    g = batch_graphs(samples[:2])
    u = jax.random.normal(jax.random.PRNGKey(4), (g.n_node_cap, 1))
    want = ops.spmv(g, u)
    spmv = partition_spmv(mesh, axis="x")
    got = spmv(u, g.senders, g.receivers, g.a_ij, g.edge_mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_pad_edges_for_sharding():
    arrs = dict(senders=np.arange(10, dtype=np.int32),
                receivers=np.arange(10, dtype=np.int32),
                a_ij=np.ones((10, 1), np.float32),
                edge_mask=np.ones(10, bool))
    out = pad_edges_for_sharding(arrs, 8)
    assert out["senders"].shape[0] == 16
    assert out["edge_mask"][10:].sum() == 0


def test_psignn_dp_full_step(samples):
    """Full psignn DEQ training step under shard_map on 2 devices."""
    mesh = make_mesh(2)
    cfg = PsignnConfig(solver="forward_iteration", fw_tol=1e-3, fw_thres=15,
                       bw_thres=15)
    params = psignn_init(jax.random.PRNGKey(5), cfg)
    caps = dict(n_node_cap=512, n_edge_cap=4096)
    per_dev = [batch_graphs(samples[i:i + 1], **caps) for i in range(2)]
    stacked = shard_stacked(stack_graphs(per_dev), mesh)

    def loss_fn(p, graph, rng):
        out = psignn_forward(p, graph, cfg, rng)
        l = out.losses
        total = (l["residual_loss"] + l["jacobian_loss"]
                 + l["encoder_loss"] + l["autoencoder_loss"])
        return total, {"res": l["residual_loss"]}

    vag = jax.jit(dp_value_and_grad(loss_fn, mesh))
    loss, aux, grads = vag(params, stacked, jax.random.PRNGKey(6))
    assert np.isfinite(float(loss))
    gn = sum(float(jnp.sum(x ** 2)) for x in jax.tree.leaves(grads))
    assert gn > 0 and np.isfinite(gn)


def test_psignn_dp_bw_sink(samples):
    """sink_dim=2 surfaces the DEQ backward-solve stats (mesh-averaged)
    through the DP path — the backward_iteration.csv channel under
    --data_parallel (round-4 advisor finding)."""
    mesh = make_mesh(2)
    cfg = PsignnConfig(solver="forward_iteration", fw_tol=1e-3, fw_thres=15,
                       bw_thres=15)
    params = psignn_init(jax.random.PRNGKey(5), cfg)
    caps = dict(n_node_cap=512, n_edge_cap=4096)
    per_dev = [batch_graphs(samples[i:i + 1], **caps) for i in range(2)]
    stacked = shard_stacked(stack_graphs(per_dev), mesh)

    def loss_fn(p, graph, rng, sink):
        out = psignn_forward(p, graph, cfg, rng, bw_sink=sink)
        l = out.losses
        total = (l["residual_loss"] + l["jacobian_loss"]
                 + l["encoder_loss"] + l["autoencoder_loss"])
        return total, {"res": l["residual_loss"]}

    vag = jax.jit(dp_value_and_grad(loss_fn, mesh, sink_dim=2))
    loss, aux, grads, gsink = vag(params, stacked, jax.random.PRNGKey(6))
    assert np.isfinite(float(loss))
    lowest, nstep = float(gsink[0]), float(gsink[1])
    assert np.isfinite(lowest)
    assert 0 < nstep <= 15  # mean backward iterations across shards


def test_sharded_loader_pads_uneven_batches(samples):
    """Uneven final batches are padded with empty graphs, never dropped."""
    n = 7
    loader = GraphLoader(samples[:n], batch_size=4, n_devices=2)
    batches = list(loader)
    assert len(batches) == 2
    real = 0
    for g in batches:
        assert g.x.shape[0] == 2              # stacked dp axis
        assert g.n_nodes.shape == (2, 2)      # per-shard num_graphs constant
        real += int((np.asarray(g.n_nodes) > 0).sum())
        # every shard keeps at least one real node (masked-mean safety)
        assert (np.asarray(g.node_mask).sum(axis=1) > 0).all()
    assert real == n
    # node mass conserved: all real nodes appear exactly once
    want = sum(s["x"].shape[0] for s in samples[:n])
    got = sum(int(np.asarray(g.node_mask).sum()) for g in batches)
    assert got == want


def test_sharded_loader_forwards_kernel_blocks(samples):
    loader = GraphLoader(samples[:4], batch_size=4, n_devices=2,
                         rcm=True, pack_kernel_blocks=True)
    (g,) = list(loader)
    assert g.mp_blocks_to is not None and g.mp_blocks_from is not None
    # stacked block shapes are unified across shards
    assert g.mp_blocks_to.agg_local.shape[0] == 2


def test_pad_mp_blocks_is_noop_math(samples):
    from psignn_tpu.kernels import pack_mp_blocks, pad_mp_blocks
    from psignn_tpu.kernels.fused_mp import mp_from_blocks, BLOCK_N
    g = batch_graphs(samples[:1])
    blocks = pack_mp_blocks(np.asarray(g.senders), np.asarray(g.receivers),
                            np.asarray(g.edge_attr), np.asarray(g.edge_mask),
                            g.n_node_cap, "to")
    nb, ec = blocks.agg_local.shape
    padded = pad_mp_blocks(blocks, nb + 2, ec + 128,
                           min(blocks.window + 2 * BLOCK_N, g.n_node_cap))
    D = 6
    params = mlp_init(jax.random.PRNGKey(7), [2 * D + 3, D, D])
    h = jax.random.normal(jax.random.PRNGKey(8), (g.n_node_cap, D))
    want = mp_from_blocks(params, h, blocks)
    got = mp_from_blocks(params, h, padded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
