"""Eval harness tests: per-graph metrics, geometry zoo, sweep machinery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from psignn_tpu.data.fem import solve_poisson
from psignn_tpu.data.meshgen import blob_mesh
from psignn_tpu.data.reader import psignn_sample_from_fem, dss_sample_from_fem
from psignn_tpu.eval.geometries import GEOMETRY_BUILDERS, build_geometry
from psignn_tpu.eval.metrics import errors_batch, metrics_table
from psignn_tpu.eval.sweep import build_data, growing_geometry_sweep
from psignn_tpu.eval.sweep import test_sample as run_test_sample  # noqa: F401
from psignn_tpu.eval.sweep import test_several_init as run_test_several_init
from psignn_tpu.graphs import batch_graphs
from psignn_tpu.ops import spmv


@pytest.fixture(scope="module")
def fem_sample():
    mesh = blob_mesh(radius=1.0, hsize=0.22, seed=5)
    rng = np.random.default_rng(1)
    return solve_poisson(mesh, 1.0, rng)


def test_errors_batch_exact_solution(fem_sample):
    """On the exact FEM solution: mse=0, rel=0, residual ~ solver tolerance."""
    s = psignn_sample_from_fem(fem_sample)
    g = batch_graphs([s, s])
    u = g.sol
    m = errors_batch(u, g)
    assert m["res"].shape == (2,)
    np.testing.assert_allclose(np.asarray(m["mse"]), 0.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(m["rel"]), 0.0, atol=1e-6)
    assert float(m["res"][0]) < 1e-6
    # table renders
    assert "Residual" in metrics_table({"m": {
        k + "_mean": float(v[0]) for k, v in m.items()}})


def test_errors_batch_per_graph_independence(fem_sample):
    """Metrics for graph i must not depend on other graphs in the batch."""
    s = psignn_sample_from_fem(fem_sample)
    s2 = dict(s)
    s2["sol"] = s["sol"] + 1.0  # corrupt the second graph only
    g = batch_graphs([s, s2])
    u = jnp.concatenate([g.sol[: int(g.n_nodes[0])],
                         jnp.zeros((g.n_node_cap - int(g.n_nodes[0]), 1))])
    m = errors_batch(u, g)
    assert float(m["mse"][0]) < 1e-10
    assert float(m["mse"][1]) > 0.5


@pytest.mark.parametrize("name", sorted(GEOMETRY_BUILDERS))
def test_geometry_zoo_meshes_are_valid(name):
    m = build_geometry(name, hsize=0.15)
    assert m.n_points > 20, name
    assert m.boundary_mask.sum() >= 8, name
    used = np.zeros(m.n_points, bool)
    used[m.triangles.ravel()] = True
    assert used.all(), name
    # FEM solve works on every zoo mesh (each eval carries its own oracle)
    s = solve_poisson(m, 1.0, np.random.default_rng(0))
    r = s["A"] @ s["sol"][:, 0] - s["b"][:, 0]
    assert np.abs(r).max() < 1e-8, name


def test_holes_have_boundary_nodes():
    m = build_geometry("donut", hsize=0.15)
    # boundary nodes exist both near r=1 and near r=0.45
    bpts = m.points[m.boundary_mask]
    rad = np.linalg.norm(bpts, axis=1)
    assert (rad > 0.9).any() and (rad < 0.6).any()


def test_sweep_and_inits(fem_sample):
    """Sweep machinery with a trivial 'predictor' (returns the FEM solution)."""
    predictors = {"oracle": lambda g: g.sol,
                  "zero": lambda g: jnp.zeros_like(g.sol)}
    summary = growing_geometry_sweep(predictors, radii=(0.6,), n_meshes=2,
                                     hsize=0.25, families=("psignn",))
    assert summary["oracle"][0.6]["mse"] < 1e-8
    assert summary["zero"][0.6]["mse"] > summary["oracle"][0.6]["mse"]
    assert summary["oracle"][0.6]["time"] > 0

    s = psignn_sample_from_fem(fem_sample)
    out = run_test_several_init(lambda g: g.sol, s)
    assert set(out) == {"zero", "default", "random", "solution"}
    assert out["solution"]["mse"] < 1e-8


def test_sweep_csv_output(tmp_path, fem_sample):
    predictors = {"oracle": lambda g: g.sol}
    growing_geometry_sweep(predictors, radii=(0.6,), n_meshes=1, hsize=0.25,
                           out_dir=str(tmp_path), families=("psignn",))
    txt = open(tmp_path / "oracle_results.csv").read()
    assert "mse" in txt and "nstep" in txt


def test_dss_sample_from_fem_roundtrip(fem_sample):
    s = dss_sample_from_fem(fem_sample)
    g = batch_graphs([s])
    # BC-encoded residual of the exact solution vanishes
    from psignn_tpu.ops import dss_residual_loss
    n = s["x"].shape[0]
    u = jnp.zeros((g.n_node_cap, 1)).at[:n].set(jnp.asarray(s["sol"]))
    assert float(dss_residual_loss(u, g)) < 1e-6


def test_geometry_zoo_eval():
    from psignn_tpu.eval.sweep import geometry_zoo_eval
    out = geometry_zoo_eval({"oracle": lambda g: g.sol}, hsize=0.25,
                            shapes=["circle", "heart"], families=("psignn",))
    assert set(out) == {"circle", "heart"}
    assert out["circle"]["oracle"]["mse"] < 1e-8


def test_errors_batch_dss_form(fem_sample):
    """dss-form graphs (b=0, A' off-diagonal, b_prime BC-encoding) must be
    scored with the gather/scatter residual, not SpMV vs the zero b
    (round-4 fix: test-split eval reported residual ~6e2 on a checkpoint
    whose true BC-encoded residual was ~1e-3)."""
    import jax.numpy as jnp
    from psignn_tpu.data.reader import dss_sample_from_fem
    from psignn_tpu.ops import dss_residual_loss

    s = dss_sample_from_fem(fem_sample)
    g = batch_graphs([s, s])
    u = g.sol  # exact FEM solution: residual should be ~machine-level
    m = errors_batch(u, g)
    assert np.isfinite(np.asarray(m["res_norm"])).all()
    assert float(jnp.max(m["res"])) < 1e-6, m["res"]
    # consistency with the training-side loss (node-count weighting)
    ref = float(dss_residual_loss(u, g))
    got = float(jnp.sum(m["res"] * g.n_nodes) / jnp.sum(g.n_nodes))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-12)
