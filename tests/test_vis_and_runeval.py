"""Vis suite + checkpoint-eval CLI smoke tests."""

import os

import numpy as np
import pytest

from psignn_tpu.data.fem import solve_poisson
from psignn_tpu.data.meshgen import blob_mesh
from psignn_tpu.eval import vis


@pytest.fixture(scope="module")
def mesh_and_sample():
    mesh = blob_mesh(radius=1.0, hsize=0.25, seed=2)
    s = solve_poisson(mesh, 1.0, np.random.default_rng(0))
    return mesh, s


def test_vis_outputs(tmp_path, mesh_and_sample):
    mesh, s = mesh_and_sample
    pos = s["coordinates"]
    p1 = vis.plot_solution_map(pos, s["sol"], tmp_path / "sol.png",
                               triangles=mesh.triangles)
    p2 = vis.plot_error_map(pos, s["sol"] * 1.1, s["sol"],
                            tmp_path / "err.png", triangles=mesh.triangles)
    p3 = vis.plot_node_types(pos, s["tags"], tmp_path / "types.png")
    p4 = vis.plot_convergence([1, 0.1, 0.01], tmp_path / "conv.png",
                              mse_trace=[2, 0.2, 0.02])
    frames = vis.plot_iteration_frames(
        pos, np.stack([s["sol"], s["sol"] * 0.5]), str(tmp_path / "frames"),
        triangles=mesh.triangles)
    for p in [p1, p2, p3, p4] + frames:
        assert os.path.exists(p)

    # spectral radius csv
    csv = tmp_path / "sr.csv"
    csv.write_text("Spectral Radius\n0.9\n0.95\n0.99")
    p5 = vis.plot_spectral_radius(str(csv), str(tmp_path / "sr.png"))
    assert os.path.exists(p5)

    summary = {"m1": {0.6: {"mse": 1e-2}, 1.0: {"mse": 2e-2}}}
    p6 = vis.plot_radius_sweep(summary, str(tmp_path / "sweep.png"))
    assert os.path.exists(p6)


def test_run_eval_cli(tmp_path):
    """Train one tiny dsgps epoch, then evaluate the checkpoint via the CLI."""
    from psignn_tpu.data.generate import generate_data
    from psignn_tpu.data.reader import GraphLoader, load_dataset, split_dataset
    from psignn_tpu.models import DsgpsConfig
    from psignn_tpu.train import Trainer, TrainConfig
    from psignn_tpu.eval import run_eval

    data = str(tmp_path / "data")
    generate_data(data, n_mesh=2, n_samples=5, hsize=0.25, seed=51,
                  verbose=False)
    samples = load_dataset(data, family="dsgps")
    train, val, test = split_dataset(samples, family="dsgps")
    cfg = TrainConfig(family="dsgps", model_cfg=DsgpsConfig(k=2),
                      max_epochs=1, path_results=str(tmp_path / "res"),
                      plot_every=100)
    tr = Trainer(cfg, GraphLoader(train, batch_size=3),
                 GraphLoader(val, batch_size=3))
    tr.train_model()

    out = str(tmp_path / "eval")
    run_eval.main(["--ckpt", str(tmp_path / "res" / "ckpt" / "best_model.ckpt"),
                   "--path_dataset", data, "--out", out])
    assert os.path.exists(os.path.join(out, "test_metrics.json"))


def test_vis_panel_and_grids(tmp_path):
    """Round-3 vis surface: 4-panel paper figure, iterate-metric curves,
    nstep-vs-nodes scatter, zoo grid."""
    import numpy as np
    from psignn_tpu.eval import vis

    rng = np.random.default_rng(0)
    n = 60
    pos = rng.uniform(-1, 1, (n, 2))
    u = rng.normal(size=(n, 1))
    sol = u + 0.1 * rng.normal(size=(n, 1))
    tags = np.zeros((n, 1)); tags[:10] = 1

    p = vis.plot_sample_panel(pos, u, sol, tags, str(tmp_path / "panel.png"),
                              title="demo")
    assert os.path.getsize(p) > 0

    trace = dict(res=np.geomspace(1, 1e-4, 30),
                 mse=np.geomspace(2, 1e-3, 30),
                 bound_mse=np.geomspace(1, 1e-5, 30),
                 inter_mse=np.geomspace(2, 1e-3, 30))
    p = vis.plot_iteration_metrics(trace, str(tmp_path / "iter.png"),
                                   nstep=25)
    assert os.path.getsize(p) > 0

    rows = [dict(n_nodes=100 * (i + 1), nstep=30 + 5 * i) for i in range(6)]
    p = vis.plot_nstep_vs_nodes(rows, str(tmp_path / "nstep.png"))
    assert os.path.getsize(p) > 0

    samples = {f"shape{i}": dict(pos=rng.uniform(-1, 1, (40, 2)),
                                 sol=rng.normal(size=(40,)))
               for i in range(5)}
    p = vis.plot_zoo_grid(samples, str(tmp_path / "zoo.png"))
    assert os.path.getsize(p) > 0


def test_plot_radius_comparison(tmp_path):
    from psignn_tpu.eval import vis
    d = tmp_path / "csvs"
    d.mkdir()
    for fam in ("psignn", "dss"):
        with open(d / f"{fam}_results.csv", "w") as f:
            f.write("metric,0.6,1.0\n")
            f.write("n_nodes,192,487\n")
            f.write("mse,0.006,0.008\n")
            f.write("res,0.001,0.002\n")
            f.write("rel,0.01,0.013\n")
            f.write("nstep,35,67\n")
            f.write("time,0.03,0.05\n")
    p = vis.plot_radius_comparison(str(d), str(tmp_path / "cmp.png"))
    assert os.path.getsize(p) > 0


def test_round5_figure_generators(tmp_path):
    """Smoke the r5 paper-figure suite (montage, composite, curve
    comparison) on synthetic data — the real-checkpoint driver is
    tools/make_figures.py."""
    import numpy as np
    from psignn_tpu.eval.vis import (plot_iterative_montage,
                                     plot_paper_figure,
                                     plot_training_comparison,
                                     parse_val_curve)
    rng = np.random.default_rng(0)
    n, T = 60, 12
    pos = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    u_trace = rng.normal(size=(T, n, 1)).astype(np.float32)
    sol = rng.normal(size=(n, 1)).astype(np.float32)
    res = np.geomspace(10, 1e-3, T)
    tags = np.zeros((n, 1), np.float32)
    tags[:10] = 1.0

    p1 = plot_iterative_montage(pos, u_trace, str(tmp_path / "m.png"),
                                sol=sol, res_trace=res)
    p2 = plot_paper_figure(pos, tags, u_trace, sol,
                           str(tmp_path / "p.png"), res_trace=res,
                           nstep=T)
    csv = tmp_path / "tm.csv"
    csv.write_text("Train Metrics\n" + "\n".join(
        f"Validation Epoch {e} : \t Train : 1e0 \t Res : {r:.3e} \t "
        f"Jac : 0 \t Enc : 0 \t AE : 0 \t MSE : 1"
        for e, r in enumerate(res)))
    eps, vals = parse_val_curve(str(csv))
    assert len(eps) == T and abs(vals[0] - 10) < 1e-6
    p3 = plot_training_comparison({"psignn": str(csv)},
                                  str(tmp_path / "c.png"),
                                  ref_runs={"psignn": str(csv)})
    import os
    assert all(os.path.getsize(p) > 5000 for p in (p1, p2, p3))
