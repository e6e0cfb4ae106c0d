"""Native C++ core vs scipy/numpy oracles."""

import numpy as np
import pytest
import scipy.sparse as sp

from psignn_tpu import native
from psignn_tpu.data.fem import assemble_p1, apply_dirichlet, _QP, _QW
from psignn_tpu.data.meshgen import blob_mesh

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native build unavailable")


@pytest.fixture(scope="module")
def mesh():
    return blob_mesh(radius=1.0, hsize=0.2, seed=17)


def test_native_assembly_matches_python(mesh):
    A_py, _ = assemble_p1(mesh, lambda x, y: np.zeros_like(x))
    rows, cols, vals = native.assemble_p1_coo(mesh.points, mesh.triangles)
    A_nat = sp.coo_matrix((vals, (rows, cols)),
                          shape=(mesh.n_points, mesh.n_points)).tocsr()
    A_nat.sum_duplicates()
    diff = abs(A_py - A_nat).max()
    assert diff < 1e-12


def test_native_load_matches_python(mesh):
    def f(x, y):
        return 1.0 + x ** 2 - 2 * y

    _, b_py = assemble_p1(mesh, f)
    lam = np.stack([1.0 - _QP[:, 0] - _QP[:, 1], _QP[:, 0], _QP[:, 1]], 1)
    p0 = mesh.points[mesh.triangles[:, 0]]
    p1 = mesh.points[mesh.triangles[:, 1]]
    p2 = mesh.points[mesh.triangles[:, 2]]
    xq = (lam[None, :, 0:1] * p0[:, None] + lam[None, :, 1:2] * p1[:, None]
          + lam[None, :, 2:3] * p2[:, None])
    fq = f(xq[..., 0], xq[..., 1])
    b_nat = native.assemble_load(mesh.points, mesh.triangles, fq, lam, _QW,
                                 mesh.n_points)
    np.testing.assert_allclose(b_nat, b_py, rtol=1e-12, atol=1e-14)


def test_native_cg_solves_reduced_system(mesh):
    """CG on the interior-eliminated SPD system matches spsolve."""
    import scipy.sparse.linalg as spla

    def f(x, y):
        return np.full_like(x, -4.0)

    A, b = assemble_p1(mesh, f)
    bidx = np.where(mesh.boundary_mask)[0]
    g = mesh.points[bidx, 0] ** 2 + mesh.points[bidx, 1] ** 2
    Ad, bd = apply_dirichlet(A.copy(), b.copy(), bidx, g)
    want = spla.spsolve(Ad.tocsc(), bd)

    # interior elimination: A_II u_I = b_I - A_IB g
    interior = ~mesh.boundary_mask
    iidx = np.where(interior)[0]
    A_II = A[iidx][:, iidx].tocsr()
    A_IB = A[iidx][:, bidx]
    rhs = b[iidx] - A_IB @ g
    x, iters = native.solve_cg(A_II.indptr.astype(np.int64), A_II.indices,
                               A_II.data, rhs, tol=1e-12)
    assert iters > 0
    np.testing.assert_allclose(x, want[iidx], rtol=1e-7, atol=1e-9)


def test_native_rcm_reduces_bandwidth(mesh):
    A, _ = assemble_p1(mesh, lambda x, y: np.zeros_like(x))
    A = A.tocsr()
    perm = native.rcm_order(A.indptr.astype(np.int64), A.indices,
                            mesh.n_points)
    assert sorted(perm) == list(range(mesh.n_points))
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    coo = A.tocoo()
    bw_before = np.abs(coo.row - coo.col).max()
    bw_after = np.abs(inv[coo.row] - inv[coo.col]).max()
    assert bw_after <= bw_before
    assert bw_after < mesh.n_points // 4


def test_native_pack_matches_python(mesh):
    from psignn_tpu.kernels.fused_mp import pack_mp_blocks
    A, _ = assemble_p1(mesh, lambda x, y: np.zeros_like(x))
    c = sp.find(A)
    s, r = c[0].astype(np.int32), c[1].astype(np.int32)
    ea = np.random.default_rng(0).normal(size=(len(s), 3)).astype(np.float32)
    mask = np.ones(len(s), bool)
    n_cap = ((mesh.n_points + 255) // 256) * 256

    py = pack_mp_blocks(s, r, ea, mask, n_cap, "to")

    keep = s != r
    agg, oth = r[keep], s[keep]
    order = np.argsort(agg, kind="stable")
    agg, oth = agg[order], oth[order]
    e_cap = py.agg_local.shape[1]
    al, og, m, ws, need = native.pack_mp_blocks_core(agg, oth, n_cap, 128,
                                                     e_cap)
    np.testing.assert_array_equal(al, np.asarray(py.agg_local))
    np.testing.assert_array_equal(m, np.asarray(py.mask))
    np.testing.assert_array_equal(ws, np.asarray(py.win_start))
