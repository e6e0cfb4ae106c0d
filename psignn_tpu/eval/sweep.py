"""Growing-geometry generalization benchmark — the headline experiment.

Mirrors ``tests/test_multiple.py:49-176``: for each radius in
{0.6, 1, 2, 4, 5}, build fresh circle-ish meshes, FEM-solve for ground
truth, run the trained models (DSS at trained k, DSGPS with k→100/1000,
Ψ-GNN with fw_thres→1000 and fw_tol→1e-6, spec_geo.py:261,292-293), and
collect per-model MSE / residual / iteration-count / wall-clock tables to
CSV.

Also contains the single-sample harness (spec_geo.py:226-324 analog) and
the robustness-to-initialization study (spec_geo.py:375-409).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import numpy as np

from ..data.fem import solve_poisson
from ..data.meshgen import blob_mesh
from ..data.reader import dss_sample_from_fem, psignn_sample_from_fem
from ..graphs import batch_graphs
from .metrics import errors_batch


def build_data(mesh, radius: float, rng=None, families=("psignn", "dss"),
               pallas: bool = False):
    """FEM-solve one fresh mesh and emit paired psignn+dss graph samples
    (spec_geo.py:139-224).  With ``pallas=True`` node orders are
    RCM-permuted so the fused-kernel edge windows stay narrow."""
    s = solve_poisson(mesh, radius, rng)
    out = {}
    if "psignn" in families:
        out["psignn"] = psignn_sample_from_fem(s)
    if "dss" in families:
        out["dss"] = dss_sample_from_fem(s)
    if pallas:
        from ..kernels import rcm_permutation
        from ..kernels.fused_mp import apply_node_permutation
        for k, smp in out.items():
            perm = rcm_permutation(smp["senders"], smp["receivers"],
                                   smp["x"].shape[0])
            out[k] = apply_node_permutation(smp, perm)
    return out


def _batch_for_eval(sample, pallas: bool = False):
    """One-sample PaddedGraph for the eval path: kernel packings + quantized
    caps when the Pallas path is on (so same-radius meshes share one
    compiled program and the predictors hit the jit cache)."""
    return batch_graphs([sample], pack_kernel_blocks=pallas,
                        pack_quantized=pallas)


def _timed(fn, *args):
    """Wall-clock one device computation, forcing completion via host
    transfer (the analog of torch.cuda.synchronize, spec_geo.py:241-245)."""
    t0 = time.perf_counter()
    out = fn(*args)
    out0 = jax.tree.leaves(out)[0]
    np.asarray(out0)
    return out, time.perf_counter() - t0


def test_sample(predictors: Dict[str, Callable], graphs: Dict[str, object],
                warmup: bool = True) -> Dict[str, Dict[str, float]]:
    """Run each named predictor on its graph, timing it (spec_geo.py:226-324).

    ``predictors[name](graph) -> u`` (or ``(u, nstep, lowest)`` for psignn).
    """
    results = {}
    for name, fn in predictors.items():
        g = graphs["dss" if name == "dss" else "psignn"]
        if warmup:
            _ = _timed(fn, g)  # compile excluded from timing
        out, dt = _timed(fn, g)
        if isinstance(out, tuple):
            u, nstep = out[0], int(out[1])
        else:
            u, nstep = out, -1
        m = errors_batch(u, g)
        results[name] = dict(
            mse=float(np.asarray(m["mse"])[0]),
            res=float(np.asarray(m["res"])[0]),
            rel=float(np.asarray(m["rel"])[0]),
            nstep=nstep,
            time=dt,
            n_nodes=int(np.asarray(g.n_nodes)[0]),
        )
    return results


def growing_geometry_sweep(
        predictors: Dict[str, Callable],
        radii: Sequence[float] = (0.6, 1.0, 2.0, 4.0, 5.0),
        n_meshes=3, hsize: float = 0.08, seed: int = 0,
        out_dir: Optional[str] = None,
        families=("psignn", "dss"),
        pallas: bool = False) -> Dict[str, Dict[float, Dict[str, float]]]:
    """The radius sweep (tests/test_multiple.py:49-121): fresh meshes per
    radius, every predictor evaluated on every mesh; means per radius.
    ``n_meshes`` is an int, or a sequence matched positionally to ``radii``
    (e.g. 20 meshes at small radii, 3 at large ones).

    Writes ``{name}_results.csv`` per model when ``out_dir`` is given,
    mirroring tests/txtresults/*.csv.
    """
    rng = np.random.default_rng(seed)
    acc: Dict[str, Dict[float, List[Dict[str, float]]]] = {
        name: {r: [] for r in radii} for name in predictors}
    if isinstance(n_meshes, int):
        counts = {r: n_meshes for r in radii}
    else:
        counts = {r: int(c) for r, c in zip(radii, n_meshes)}

    for radius in radii:
        for _ in range(counts[radius]):
            mesh = blob_mesh(radius=radius, hsize=hsize, rng=rng)
            data = build_data(mesh, radius, rng, families=families,
                              pallas=pallas)
            graphs = {k: _batch_for_eval(v, pallas) for k, v in data.items()}
            res = test_sample(predictors, graphs)
            for name, m in res.items():
                acc[name][radius].append(m)

    summary: Dict[str, Dict[float, Dict[str, float]]] = {}
    for name, per_radius in acc.items():
        summary[name] = {}
        for r, items in per_radius.items():
            keys = items[0].keys()
            summary[name][r] = {k: float(np.mean([it[k] for it in items]))
                                for k in keys}
            summary[name][r].update({k + "_std":
                                     float(np.std([it[k] for it in items]))
                                     for k in keys})

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        for name, per_radius in summary.items():
            path = os.path.join(out_dir, f"{name}_results.csv")
            with open(path, "w") as f:
                rs = sorted(per_radius.keys())
                f.write("metric," + ",".join(str(r) for r in rs) + "\n")
                for metric in ["n_nodes", "mse", "res", "rel", "nstep",
                               "time"]:
                    f.write(metric + "," + ",".join(
                        "{:.6g}".format(per_radius[r][metric]) for r in rs)
                        + "\n")
    return summary


def geometry_zoo_eval(predictors: Dict[str, Callable], hsize: float = 0.08,
                      seed: int = 0, shapes: Optional[Sequence[str]] = None,
                      families=("psignn",),
                      pallas: bool = False) -> Dict[str, Dict[str, Dict[str, float]]]:
    """Out-of-distribution generalization over the geometry zoo
    (the tests/special_geo studies): FEM-solve each shape fresh and run
    every predictor. Returns {shape: {model: metrics}}."""
    from .geometries import GEOMETRY_BUILDERS, build_geometry

    rng = np.random.default_rng(seed)
    shapes = shapes or sorted(GEOMETRY_BUILDERS)
    results = {}
    for name in shapes:
        mesh = build_geometry(name, hsize=hsize)
        data = build_data(mesh, 1.0, rng, families=families, pallas=pallas)
        graphs = {k: _batch_for_eval(v, pallas) for k, v in data.items()}
        results[name] = test_sample(predictors, graphs)
    return results


def test_several_init(predict_fn: Callable, sample: dict,
                      inits: Sequence[str] = ("zero", "default", "random",
                                              "solution"),
                      seed: int = 0) -> Dict[str, Dict[str, float]]:
    """Robustness to the solution initialization (spec_geo.py:375-409):
    re-run the model with x=0, the default BC init, uniform random, and the
    exact solution as starting points."""
    rng = np.random.default_rng(seed)
    out = {}
    for mode in inits:
        s = dict(sample)
        x = np.array(s["x"])
        if mode == "zero":
            x = np.zeros_like(x)
        elif mode == "random":
            x = rng.uniform(-10, 10, x.shape).astype(x.dtype)
        elif mode == "solution":
            x = np.array(s["sol"])
        s["x"] = x
        g = batch_graphs([s])
        res = predict_fn(g)
        u = res[0] if isinstance(res, tuple) else res
        m = errors_batch(u, g)
        out[mode] = dict(mse=float(np.asarray(m["mse"])[0]),
                         res=float(np.asarray(m["res"])[0]))
    return out
