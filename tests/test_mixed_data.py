"""Mixed-BC data pipeline tests: arcs, normals, mixed FEM, reader round-trip."""

import numpy as np
import pytest
import scipy.sparse as sp

from psignn_tpu.data.fem import (solve_poisson_mixed, vertex_unit_normals,
                                 assemble_p1, apply_dirichlet)
from psignn_tpu.data.generate import generate_data
from psignn_tpu.data.meshgen import mixed_blob_mesh, circle_mesh
from psignn_tpu.data.reader import load_dataset, GraphLoader
import scipy.sparse.linalg as spla


def test_mixed_mesh_arcs():
    m = mixed_blob_mesh(radius=1.0, hsize=0.12, seed=3)
    tags = m.boundary_tag[m.boundary_loop]
    assert set(np.unique(tags)) == {101, 303}
    # both BC kinds present in nontrivial proportion
    frac_d = (tags == 101).mean()
    assert 0.3 < frac_d < 0.8
    # arcs are contiguous: few alternations around the loop (4 interfaces)
    switches = int((tags != np.roll(tags, 1)).sum())
    assert switches <= 8


def test_vertex_normals_unit_outward():
    m = circle_mesh(radius=1.0, hsize=0.2, seed=1)
    n = vertex_unit_normals(m)
    bidx = np.where(m.boundary_mask)[0]
    norms = np.linalg.norm(n[bidx], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-12)
    # outward on a circle ≈ radial direction
    radial = m.points[bidx] / np.linalg.norm(m.points[bidx], axis=1,
                                             keepdims=True)
    dots = np.sum(n[bidx] * radial, axis=1)
    assert dots.min() > 0.95
    # interior normals are zero
    iidx = np.where(~m.boundary_mask)[0]
    np.testing.assert_allclose(n[iidx], 0.0)


def test_mixed_fem_patch_linear():
    """u = a+bx+cy has zero normal flux nowhere in general, so use a mixed
    patch test with the exact solution imposed only on Dirichlet arcs won't
    be exact; instead check the constant solution: f=0, g=c, du/dn=0 → u=c."""
    m = mixed_blob_mesh(radius=1.0, hsize=0.15, seed=5)
    A, b = assemble_p1(m, lambda x, y: np.zeros_like(x))
    didx = np.where(m.boundary_tag == 101)[0]
    A, b = apply_dirichlet(A, b, didx, np.full(len(didx), 3.5))
    u = spla.spsolve(A.tocsc(), b)
    np.testing.assert_allclose(u, 3.5, atol=1e-8)


def test_solve_poisson_mixed_encoding():
    m = mixed_blob_mesh(radius=1.0, hsize=0.15, seed=7)
    s = solve_poisson_mixed(m, 1.0, np.random.default_rng(0))
    tags = s["tags"]
    # one-hot rows
    np.testing.assert_allclose(tags.sum(axis=1), 1.0)
    didx = np.where(tags[:, 1] == 1)[0]
    nidx = np.where(tags[:, 2] == 1)[0]
    iidx = np.where(tags[:, 0] == 1)[0]
    assert len(didx) > 0 and len(nidx) > 0 and len(iidx) > 0
    # prb encoding: interior [f,0,0], dirichlet [0,g,0], neumann [0,0,f]
    assert np.all(s["prb_data"][iidx, 1:] == 0)
    assert np.all(s["prb_data"][didx, 0] == 0)
    assert np.all(s["prb_data"][didx, 2] == 0)
    assert np.all(s["prb_data"][nidx, :2] == 0)
    # dirichlet rows: identity rows, b = g
    Ad = s["A"].toarray()
    for i in didx[:5]:
        assert Ad[i, i] == 1.0 and np.count_nonzero(Ad[i]) == 1
        np.testing.assert_allclose(s["b"][i, 0], s["prb_data"][i, 1])
    # neumann rows are NOT identity (no BC applied)
    assert np.count_nonzero(Ad[nidx[0]]) > 1
    # solution solves the system
    r = s["A"] @ s["sol"][:, 0] - s["b"][:, 0]
    assert np.abs(r).max() < 1e-8
    # normals nonzero exactly on boundary
    nz = np.linalg.norm(s["unit_normal_vector"], axis=1) > 0
    np.testing.assert_array_equal(nz, m.boundary_mask)


def test_mixed_dataset_generation_and_reader(tmp_path):
    path = str(tmp_path)
    generate_data(path, n_mesh=2, n_samples=3, hsize=0.25, seed=9,
                  variant="mixed", verbose=False)
    samples = load_dataset(path, family="psignn", variant="mixed")
    assert len(samples) == 6
    s = samples[0]
    assert s["tags"].shape[1] == 3
    assert s["prb_data"].shape[1] == 3
    assert s["unit_normal_vector"].shape[1] == 2
    # initial condition on Dirichlet rows only
    dmask = s["tags"][:, 1] == 1
    np.testing.assert_allclose(s["x"][dmask], s["b"][dmask])
    np.testing.assert_allclose(s["x"][~dmask], 0.0)

    # end-to-end: mixed psignn forward on real mixed data
    import jax
    from psignn_tpu.graphs import batch_graphs
    from psignn_tpu.models import PsignnConfig, psignn_init, psignn_forward
    g = batch_graphs(samples[:2])
    cfg = PsignnConfig(bc_mode="mixed", solver="forward_iteration",
                       fw_tol=1e-3, fw_thres=20, bw_thres=20)
    params = psignn_init(jax.random.PRNGKey(0), cfg)
    out = psignn_forward(params, g, cfg, jax.random.PRNGKey(1))
    assert np.isfinite(float(out.losses["residual_loss"]))

    from psignn_tpu.models import DsgpsConfig, dsgps_init, dsgps_forward
    cfg2 = DsgpsConfig(k=3, bc_mode="mixed")
    params2 = dsgps_init(jax.random.PRNGKey(2), cfg2)
    out2 = dsgps_forward(params2, g, cfg2)
    assert np.isfinite(float(out2.losses["train_loss"]))
