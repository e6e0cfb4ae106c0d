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
