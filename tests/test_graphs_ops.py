"""Unit tests: PaddedGraph batching and graph ops vs dense numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psignn_tpu.graphs import PaddedGraph, batch_graphs, bucket_size
from psignn_tpu import ops
from psignn_tpu.nn import mlp_init, mlp_apply


def random_sample(rng, n, extra=False):
    """A random small 'mesh-like' graph: symmetric sparsity + self loops."""
    # random symmetric adjacency with diagonal
    dense = np.zeros((n, n), np.float32)
    for i in range(n):
        dense[i, i] = rng.uniform(1, 2)
        for j in rng.choice(n, size=3, replace=False):
            if i != j:
                v = rng.uniform(-1, 1)
                dense[i, j] = v
                dense[j, i] = v
    s, r = np.nonzero(dense)
    vals = dense[s, r].astype(np.float32)
    tags = (rng.uniform(size=(n, 1)) < 0.3).astype(np.float32)
    sample = dict(
        x=rng.normal(size=(n, 1)).astype(np.float32),
        b=rng.normal(size=(n, 1)).astype(np.float32),
        sol=rng.normal(size=(n, 1)).astype(np.float32),
        prb_data=rng.normal(size=(n, 2)).astype(np.float32),
        tags=tags,
        pos=rng.normal(size=(n, 2)).astype(np.float32),
        senders=s.astype(np.int32),
        receivers=r.astype(np.int32),
        a_ij=vals.reshape(-1, 1),
        edge_attr=rng.normal(size=(len(s), 3)).astype(np.float32),
    )
    if extra:
        off = dense.copy()
        np.fill_diagonal(off, 0.0)
        so, ro = np.nonzero(off)
        sample["b_prime"] = rng.normal(size=(n, 3)).astype(np.float32)
        sample["b_prime"][:, 1] = (rng.uniform(size=n) < 0.3).astype(np.float32)
    sample["dense"] = dense
    return sample


def to_graph(samples, **kw):
    clean = [{k: v for k, v in s.items() if k != "dense"} for s in samples]
    return batch_graphs(clean, **kw)


def test_bucket_size():
    assert bucket_size(1) == 256
    assert bucket_size(257) == 512
    assert bucket_size(4096) == 4096
    # multiples of 1024 above 4096 (bounded padding waste; see docstring)
    assert bucket_size(4097) == 5120
    assert bucket_size(11081) == 11264


def test_batch_offsets_and_masks():
    rng = np.random.default_rng(0)
    samples = [random_sample(rng, n) for n in (7, 11, 5)]
    g = to_graph(samples)
    tot_n = 7 + 11 + 5
    assert int(g.total_nodes) == tot_n
    assert bool(jnp.all(g.n_nodes == jnp.array([7, 11, 5])))
    # senders of second graph offset by 7
    e0 = len(samples[0]["senders"])
    e1 = len(samples[1]["senders"])
    np.testing.assert_array_equal(
        np.asarray(g.senders[e0:e0 + e1]), samples[1]["senders"] + 7)
    # masks
    assert int(g.node_mask.sum()) == tot_n
    assert int(g.edge_mask.sum()) == sum(len(s["senders"]) for s in samples)
    # padded graph_id is num_graphs
    assert int(g.graph_id[-1]) == 3


def test_spmv_matches_dense():
    rng = np.random.default_rng(1)
    samples = [random_sample(rng, n) for n in (9, 6)]
    g = to_graph(samples)
    u = np.asarray(jax.device_get(g.x))
    out = np.asarray(ops.spmv(g, g.x))
    # dense block-diagonal oracle
    want0 = samples[0]["dense"] @ u[:9]
    want1 = samples[1]["dense"] @ u[9:15]
    np.testing.assert_allclose(out[:9], want0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[9:15], want1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out[15:], 0.0)


def test_residual_loss_matches_dense():
    rng = np.random.default_rng(2)
    samples = [random_sample(rng, n) for n in (9, 6)]
    g = to_graph(samples)
    u = np.asarray(jax.device_get(g.x))
    r0 = samples[0]["dense"] @ u[:9] - samples[0]["b"]
    r1 = samples[1]["dense"] @ u[9:15] - samples[1]["b"]
    want = np.mean(np.concatenate([r0, r1]) ** 2)
    got = float(ops.residual_loss(g.x, g))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_message_passing_matches_loop():
    rng = np.random.default_rng(3)
    samples = [random_sample(rng, 8)]
    g = to_graph(samples)
    D = 4
    key = jax.random.PRNGKey(0)
    params = mlp_init(key, [2 * D + 3, D, D])
    h = jax.random.normal(jax.random.PRNGKey(1), (g.n_node_cap, D))

    for direction in ("to", "from"):
        out = np.asarray(ops.message_passing(params, h, g, direction))
        # python loop oracle, self-loops removed
        want = np.zeros((g.n_node_cap, D), np.float32)
        s = np.asarray(g.senders)
        r = np.asarray(g.receivers)
        hn = np.asarray(h)
        ea = np.asarray(g.edge_attr)
        for e in range(len(s)):
            if not bool(g.edge_mask[e]) or s[e] == r[e]:
                continue
            if direction == "to":
                xi, xj, agg = hn[r[e]], hn[s[e]], r[e]
            else:
                xi, xj, agg = hn[s[e]], hn[r[e]], s[e]
            feats = np.concatenate([xi, xj, ea[e]])[None]
            want[agg] += np.asarray(mlp_apply(params, jnp.asarray(feats)))[0]
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


def test_dss_residual_matches_spmv_form():
    """Cross-validation of the two residual formulations, mirroring
    tests/test_func_dirichlet.py:26-66 in the reference: with A' = A minus
    diagonal, Dirichlet rows A[i,i]=1, b'=[b*(1-tag), tag, b*tag], the
    BC-encoded residual equals A u - b up to sign conventions on interior
    rows where diag(A)[i] = -sum_j A'[i,j]."""
    rng = np.random.default_rng(4)
    n = 10
    # Laplacian-like matrix: offdiag random negative, diag = -rowsum, some Dirichlet rows
    A = np.zeros((n, n), np.float32)
    for i in range(n):
        for j in rng.choice(n, 3, replace=False):
            if i != j:
                A[i, j] = -rng.uniform(0.1, 1.0)
                A[j, i] = A[i, j]
    dirich = rng.uniform(size=n) < 0.3
    for i in range(n):
        A[i, i] = -A[i].sum() + A[i, i]
    A[dirich, :] = 0.0
    A[:, dirich][:] = A[:, dirich]  # reference keeps columns
    for i in np.where(dirich)[0]:
        A[i, :] = 0.0
        A[i, i] = 1.0
    b = rng.normal(size=(n, 1)).astype(np.float32)

    # psignn-form sample (full A incl diag)
    s, r = np.nonzero(A)
    sample = dict(
        x=np.zeros((n, 1), np.float32), b=b, sol=np.zeros((n, 1), np.float32),
        prb_data=np.zeros((n, 2), np.float32),
        tags=dirich.astype(np.float32).reshape(-1, 1),
        pos=np.zeros((n, 2), np.float32),
        senders=s.astype(np.int32), receivers=r.astype(np.int32),
        a_ij=A[s, r].reshape(-1, 1).astype(np.float32),
        edge_attr=np.zeros((len(s), 3), np.float32),
    )
    g1 = batch_graphs([sample])

    # dss-form sample: A' = A without diagonal, b' encoding
    Ap = A.copy()
    np.fill_diagonal(Ap, 0.0)
    so, ro = np.nonzero(Ap)
    bp = np.zeros((n, 3), np.float32)
    bp[:, 0] = b[:, 0] * (~dirich)
    bp[:, 1] = dirich
    bp[:, 2] = b[:, 0] * dirich
    sample2 = dict(sample)
    sample2.update(
        senders=so.astype(np.int32), receivers=ro.astype(np.int32),
        a_ij=Ap[so, ro].reshape(-1, 1).astype(np.float32),
        edge_attr=np.zeros((len(so), 3), np.float32),
        b_prime=bp,
    )
    g2 = batch_graphs([sample2])

    u = rng.normal(size=(n, 1)).astype(np.float32)
    up = jnp.zeros((g1.n_node_cap, 1), np.float32).at[:n].set(u)
    r_spmv = float(ops.residual_loss(up, g1))
    r_dss = float(ops.dss_residual_loss(up, g2))
    # interior: A u - b = sum_j A'_ij u_j + diag_i u_i - b_i
    #         = -sum_j A'_ij (u_i - u_j) - b_i = -(b_i) + sum A'(u_j - u_i) -> matches -p1-ish sign
    np.testing.assert_allclose(r_dss, r_spmv, rtol=1e-4)
