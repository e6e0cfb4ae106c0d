"""Per-graph error metrics and test-set evaluation tables.

Mirrors ``dirichlet/psignn/test/test_func.py:26-120``: for each graph in a
batch — mean squared residual, normalized residual ‖Au−b‖/‖b‖, MSE vs FEM,
relative L2 ‖u−sol‖/‖sol‖, boundary MSE — then dataset means/stds in a
printed table.
"""

from __future__ import annotations

from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..graphs import PaddedGraph
from ..ops import spmv


def _seg_sum(x, graph: PaddedGraph):
    x = x * graph.node_mask.astype(x.dtype)
    return jax.ops.segment_sum(x, graph.graph_id,
                               num_segments=graph.num_graphs + 1)[:graph.num_graphs]


def errors_batch(u: jax.Array, graph: PaddedGraph) -> Dict[str, jax.Array]:
    """(G,) per-graph metrics (test_func.py:26-66).

    dss-form graphs carry the BC-encoded system (A' off-diagonal-only, b=0,
    b_prime=[B0,B1,B2]); their residual uses the gather/scatter form and is
    normalized by ‖B0+B2‖, exactly the reference's dss branch
    (tests/test_func_dirichlet.py:26-48, 89-91).  psignn/dsgps graphs use
    the SpMV residual normalized by ‖b‖.
    """
    dss_form = getattr(graph, "b_prime", None) is not None
    if dss_form:
        from ..ops import dss_residual_vector
        residual = dss_residual_vector(u, graph)
        rhs = graph.b_prime[:, 0:1] + graph.b_prime[:, 2:3]
    else:
        residual = spmv(graph, u) - graph.b
        rhs = graph.b
    counts = graph.n_nodes.astype(u.dtype)

    res_sq = _seg_sum(jnp.square(residual)[:, 0], graph)
    res = res_sq / counts

    b_sq = _seg_sum(jnp.square(rhs)[:, 0], graph)
    res_norm = jnp.sqrt(res_sq) / jnp.sqrt(b_sq)

    err_sq = _seg_sum(jnp.square(u - graph.sol)[:, 0], graph)
    mse = err_sq / counts

    sol_sq = _seg_sum(jnp.square(graph.sol)[:, 0], graph)
    rel = jnp.sqrt(err_sq) / jnp.sqrt(sol_sq)

    bmask = (graph.dirichlet_mask[:, 0] > 0).astype(u.dtype)
    berr = _seg_sum(jnp.square(u - graph.sol)[:, 0] * bmask, graph)
    bcount = _seg_sum(bmask, graph)
    mse_bound = berr / jnp.maximum(bcount, 1.0)

    return dict(res=res, res_norm=res_norm, mse=mse, rel=rel,
                mse_bound=mse_bound)


def evaluate_dataset(predict_fn: Callable, loader, name: str = "model",
                     verbose: bool = True) -> Dict[str, float]:
    """Sweep a loader with ``predict_fn(graph) -> u`` and aggregate metrics
    (test_func.py:68-120)."""
    acc: Dict[str, List[float]] = {}
    for graph in loader:
        u = predict_fn(graph)
        m = errors_batch(u, graph)
        for k, v in m.items():
            acc.setdefault(k, []).extend(np.asarray(v).tolist())
    out = {}
    for k, v in acc.items():
        out[k + "_mean"] = float(np.mean(v))
        out[k + "_std"] = float(np.std(v))
    if verbose:
        print(metrics_table({name: out}))
    return out


def metrics_table(results: Dict[str, Dict[str, float]]) -> str:
    """Plain-text table like the tabulate summary (test_func.py:119-120)."""
    headers = ["Name", "Residual", "ResidualNorm", "MSE", "Rel", "MSEBound"]
    keys = ["res_mean", "res_norm_mean", "mse_mean", "rel_mean",
            "mse_bound_mean"]
    rows = [headers]
    for name, m in results.items():
        rows.append([name] + ["{:.3e}".format(m.get(k, float("nan")))
                              for k in keys])
    widths = [max(len(str(r[i])) for r in rows) for i in range(len(headers))]
    lines = []
    for i, r in enumerate(rows):
        lines.append("  ".join(str(c).ljust(w) for c, w in zip(r, widths)))
        if i == 0:
            lines.append("-" * (sum(widths) + 2 * len(widths)))
    return "\n".join(lines)
