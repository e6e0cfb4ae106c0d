"""Benchmark: Ψ-GNN fixed-point message-passing throughput on one TPU chip.

Reproduces the reference's largest headline workload: the growing-geometry
sweep at radius 5 runs a Broyden fixed point of ~531 iterations on an
≈11 k-node mesh in 3.18 s on one Turing GPU
(``tests/txtresults/psignn_results.csv``, BASELINE.md).  Each solver
iteration evaluates the GNN update function once = two directional
message passings over all E edges.

Metric: processed message-edges per second during the Broyden solve,
``edges/s = nstep * 2 * E / wall_clock``.  Baseline: the reference numbers
give 531.2 iters × 2 × ~77.6 k edges / 3.18 s ≈ 25.9 M edges/s.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REF_EDGES_PER_S = 531.2 * 2 * 77_588 / 3.18  # ≈ 25.9e6, see module docstring


def build_big_graph(radius=5.0, hsize=0.08, seed=0, pallas=False):
    from psignn_tpu.data.fem import solve_poisson
    from psignn_tpu.data.meshgen import blob_mesh
    from psignn_tpu.data.reader import psignn_sample_from_fem
    from psignn_tpu.graphs import batch_graphs

    rng = np.random.default_rng(seed)
    mesh = blob_mesh(radius=radius, hsize=hsize, rng=rng)
    sample = psignn_sample_from_fem(solve_poisson(mesh, radius, rng))
    if pallas:
        from psignn_tpu.kernels import rcm_permutation
        from psignn_tpu.kernels.fused_mp import apply_node_permutation
        perm = rcm_permutation(sample["senders"], sample["receivers"],
                               len(sample["x"]))
        sample = apply_node_permutation(sample, perm)
    n_edges = len(sample["senders"])
    g = batch_graphs([sample], pack_kernel_blocks=pallas)
    return g, mesh.n_points, n_edges


def main():
    import os
    import jax
    from psignn_tpu import ops
    from psignn_tpu.deq import fixed_point_forward
    from psignn_tpu.models import PsignnConfig, psignn_init
    from psignn_tpu.models.psignn import encoder_apply, make_function

    # Persistent compile cache: the fused-kernel program's first (remote)
    # Mosaic compile is ~1 min; subsequent runs load from this cache.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__) or ".",
                                       ".jax_cache"))
    except Exception:
        pass

    # Default: fused Pallas MP kernels (2x end-to-end over take+segment_sum,
    # docs/PERF.md).  PSIGNN_TPU_BENCH_PALLAS=0 opts out (pure-XLA path).
    use_pallas = os.environ.get("PSIGNN_TPU_BENCH_PALLAS", "1") == "1"
    ops.USE_PALLAS_MP = use_pallas

    nstep = 531
    graph, n_nodes, n_edges = build_big_graph(pallas=use_pallas)

    cfg = PsignnConfig(solver="broyden", fw_tol=0.0, fw_thres=nstep)
    params = psignn_init(jax.random.PRNGKey(0), cfg)
    f = make_function(cfg)

    @jax.jit
    def run(params, graph):
        h0 = encoder_apply(params["autoencoder"], graph.x) * graph.fnode_mask
        out = fixed_point_forward(f, params["function"], h0, graph, cfg.deq)
        return out.result, out.nstep

    # warmup / compile (force completion with a host transfer — on the axon
    # platform block_until_ready alone returned before execution when the
    # same executable was re-dispatched)
    r, ns = run(params, graph)
    np.asarray(r)

    reps = 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r, ns = run(params, graph)
        np.asarray(r)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    iters = nstep  # fw_tol=0 forces the full threshold
    edges_per_s = iters * 2 * n_edges / dt
    print(json.dumps({
        "metric": "psignn_fixed_point_edges_per_s",
        "value": round(edges_per_s, 1),
        "unit": "edges/s/chip",
        "vs_baseline": round(edges_per_s / REF_EDGES_PER_S, 3),
        "detail": {
            "n_nodes": int(n_nodes), "n_edges": int(n_edges),
            "iters": int(iters), "wall_s": round(dt, 4),
            "solver": "broyden", "pallas_mp": bool(use_pallas),
            "baseline_edges_per_s": round(REF_EDGES_PER_S, 1),
        },
    }))


if __name__ == "__main__":
    main()
