"""Data pipeline tests: mesh generation, P1 FEM correctness, dataset IO."""

import os

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from psignn_tpu.data.meshgen import blob_mesh, circle_mesh
from psignn_tpu.data.fem import (assemble_p1, apply_dirichlet, solve_poisson,
                                 compute_edge_distance)
from psignn_tpu.data.generate import generate_data, add_dss_variable
from psignn_tpu.data.reader import load_dataset, split_dataset, GraphLoader


def test_blob_mesh_valid():
    m = blob_mesh(radius=1.0, hsize=0.15, seed=0)
    assert m.n_points > 30
    assert m.triangles.min() >= 0 and m.triangles.max() < m.n_points
    assert m.boundary_mask.sum() >= 8
    # every vertex used
    used = np.zeros(m.n_points, bool)
    used[m.triangles.ravel()] = True
    assert used.all()
    # triangle areas positive (unsigned) and not degenerate
    p = m.points
    t = m.triangles
    area = 0.5 * np.abs(
        (p[t[:, 1], 0] - p[t[:, 0], 0]) * (p[t[:, 2], 1] - p[t[:, 0], 1])
        - (p[t[:, 2], 0] - p[t[:, 0], 0]) * (p[t[:, 1], 1] - p[t[:, 0], 1]))
    assert (area > 1e-8).all()


def test_fem_patch_linear_exact():
    """P1 FEM reproduces a linear solution exactly (f=0, g linear)."""
    m = circle_mesh(radius=1.0, hsize=0.2, seed=1)
    A, b = assemble_p1(m, lambda x, y: np.zeros_like(x))
    bidx = np.where(m.boundary_mask)[0]
    g = 2.0 + 3.0 * m.points[bidx, 0] - 1.5 * m.points[bidx, 1]
    A, b = apply_dirichlet(A, b, bidx, g)
    u = spla.spsolve(A.tocsc(), b)
    want = 2.0 + 3.0 * m.points[:, 0] - 1.5 * m.points[:, 1]
    np.testing.assert_allclose(u, want, rtol=1e-8, atol=1e-8)


def test_fem_convergence_quadratic():
    """-Δu = -4 with u = x²+y² on the unit circle: h² convergence."""
    errs = []
    for h in (0.3, 0.15):
        m = circle_mesh(radius=1.0, hsize=h, seed=2)
        A, b = assemble_p1(m, lambda x, y: np.full_like(x, -4.0))
        bidx = np.where(m.boundary_mask)[0]
        g = m.points[bidx, 0] ** 2 + m.points[bidx, 1] ** 2
        A, b = apply_dirichlet(A, b, bidx, g)
        u = spla.spsolve(A.tocsc(), b)
        want = m.points[:, 0] ** 2 + m.points[:, 1] ** 2
        errs.append(np.abs(u - want).max())
    assert errs[1] < errs[0] * 0.5  # at least ~2x drop when h halves
    assert errs[1] < 0.05


def test_solve_poisson_sample_shapes():
    m = blob_mesh(radius=1.0, hsize=0.15, seed=3)
    s = solve_poisson(m, 1.0, np.random.default_rng(0))
    n = m.n_points
    assert s["b"].shape == (n, 1) and s["sol"].shape == (n, 1)
    assert s["prb_data"].shape == (n, 2) and s["tags"].shape == (n, 1)
    # boundary rows: A row = e_i, b = g, prb_data = [0, g], tags = 1
    bidx = np.where(m.boundary_mask)[0]
    Ad = s["A"].toarray()
    for i in bidx[:5]:
        row = Ad[i]
        assert row[i] == 1.0 and np.count_nonzero(row) == 1
        assert s["tags"][i, 0] == 1.0
        assert s["prb_data"][i, 0] == 0.0
        np.testing.assert_allclose(s["b"][i, 0], s["prb_data"][i, 1])
    # solution satisfies the system
    r = s["A"] @ s["sol"][:, 0] - s["b"][:, 0]
    assert np.abs(r).max() < 1e-8
    # distance features
    c = sp.find(s["A"])
    ei = np.stack([c[0], c[1]], axis=1)
    d = compute_edge_distance(ei, m.points)
    np.testing.assert_allclose(
        d[:, 2], np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2), rtol=1e-8)


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("data"))
    generate_data(path, n_mesh=2, n_samples=5, hsize=0.2, seed=7, verbose=False)
    add_dss_variable(path)
    return path


def test_dataset_files_and_reader(tiny_dataset):
    for f in ["A_sparse_matrix", "b_matrix", "sol", "prb_data", "tags",
              "coordinates", "distance", "A_prime", "b_prime"]:
        assert os.path.exists(os.path.join(tiny_dataset, f + ".npy"))

    samples = load_dataset(tiny_dataset, family="psignn")
    assert len(samples) == 10
    s = samples[0]
    n = s["x"].shape[0]
    # initial condition: x = b on boundary, 0 interior
    bnd = s["tags"][:, 0] == 1
    np.testing.assert_allclose(s["x"][bnd], s["b"][bnd])
    np.testing.assert_allclose(s["x"][~bnd], 0.0)
    assert s["edge_attr"].shape[1] == 3 and s["prb_data"].shape[1] == 2

    train, val, test = split_dataset(samples, family="psignn")
    assert len(train) == 6 and len(val) == 2 and len(test) == 2

    dss = load_dataset(tiny_dataset, family="dss")
    assert dss[0]["b_prime"].shape == (len(dss[0]["x"]), 3)
    # dss A' has empty diagonal
    assert not np.any(dss[0]["senders"] == dss[0]["receivers"])


def test_graph_loader_batching(tiny_dataset):
    samples = load_dataset(tiny_dataset, family="psignn")
    loader = GraphLoader(samples, batch_size=4, shuffle=True, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0].num_graphs == 4 and batches[2].num_graphs == 2
    # fixed shapes across batches
    assert len({b.n_node_cap for b in batches}) == 1
    assert len({b.n_edge_cap for b in batches}) == 1
    # shuffling differs across epochs
    b1 = list(loader)[0]
    assert b1.n_node_cap == batches[0].n_node_cap


def test_graph_loader_cache_batches(tiny_dataset):
    from psignn_tpu.data.reader import load_dataset, GraphLoader
    import numpy as np
    samples = load_dataset(tiny_dataset, family="psignn")
    loader = GraphLoader(samples, batch_size=4, shuffle=True, seed=0,
                         cache_batches=True)
    e1 = list(loader)
    e2 = list(loader)
    assert len(e1) == len(e2) == 3
    # membership frozen: the set of batch objects is identical, order may differ
    ids1 = {id(b) for b in e1}
    ids2 = {id(b) for b in e2}
    assert ids1 == ids2
    # contents match an uncached loader built with the same seed
    plain = GraphLoader(samples, batch_size=4, shuffle=True, seed=0)
    p1 = list(plain)
    for a, b in zip(e1, p1):
        np.testing.assert_array_equal(np.asarray(a.n_nodes),
                                      np.asarray(b.n_nodes))
