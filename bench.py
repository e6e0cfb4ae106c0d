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

Modes (PSIGNN_TPU_BENCH_MODE):
* ``inference`` (default) — the headline fixed-point solve above.
* ``train`` — one full jitted training step (DEQ forward + implicit
  backward + Hutchinson jac loss + dual-Adam update) on a canonical batch
  of 50 r=1.0 meshes with the converted reference weights; baseline is the
  reference's 360 s/epoch ÷ 120 batches = 3.0 s/step on 2 Turing GPUs
  (BASELINE.md training endpoints).
* ``partition`` — the composed partitioned solve (halo exchange + psum'd
  stopping norm) across all local devices on the headline mesh.
"""

import json
import time

import numpy as np

REF_EDGES_PER_S = 531.2 * 2 * 77_588 / 3.18  # ≈ 25.9e6, see module docstring
REF_TRAIN_STEP_S = 360.0 / 120               # psignn epoch / batches, 2 GPUs


def pause_trainers():
    """SIGSTOP any of OUR live training runs for the duration of the bench.

    The single TPU chip is time-shared by every process on this host;
    benchmarking while a training run dispatches programs inflates wall-clock
    ~5x (BENCH_r03: 0.74 s -> 3.48 s on the identical workload).  Each
    ``psignn_tpu.cli.main`` run writes ``<path_results>/trainer.pid``; we
    stop exactly those PIDs (after verifying /proc/<pid>/cmdline really is a
    psignn_tpu trainer — never pattern-matched, never anyone else's process)
    and SIGCONT them when the bench exits, so training merely pauses.
    """
    import atexit
    import glob
    import os
    import signal

    root = os.path.dirname(os.path.abspath(__file__))
    paused = []
    for pf in glob.glob(os.path.join(root, "results", "*", "trainer.pid")):
        try:
            pid = int(open(pf).read().strip())
            cmd = open(f"/proc/{pid}/cmdline", "rb").read().decode()
        except (OSError, ValueError):
            continue
        if "psignn_tpu" not in cmd.replace("\0", " "):
            continue  # PID was recycled by an unrelated process: leave it be
        try:
            os.kill(pid, signal.SIGSTOP)
            paused.append(pid)
        except (ProcessLookupError, PermissionError):
            pass

    def _resume():
        for pid in paused:
            try:
                os.kill(pid, signal.SIGCONT)
            except (ProcessLookupError, PermissionError):
                pass

    def _on_signal(signum, frame):
        # atexit does not run on an unhandled SIGTERM (e.g. `timeout`):
        # resume the trainers, then die with the conventional exit code.
        _resume()
        signal.signal(signum, signal.SIG_DFL)
        os.kill(os.getpid(), signum)

    if paused:
        atexit.register(_resume)
        signal.signal(signal.SIGTERM, _on_signal)
        signal.signal(signal.SIGINT, _on_signal)
        time.sleep(5.0)  # let in-flight device programs drain
    return paused


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


def bench_train_step(use_pallas: bool):
    """One full jitted psignn train step at canonical hyperparameters.

    Uses the reference's own trained weights (converted via compat) so the
    forward/backward iteration counts match late-training reality, a fresh
    batch of 50 radius-1.0 meshes (the dConstant distribution), fw_tol 1e-5
    / fw_thres 500 / bw_tol 1e-8 / bw_thres 500, jac loss, global-norm
    clip 0.1, dual Adam (SURVEY.md §3.1 call stack end to end)."""
    import jax
    import jax.numpy as jnp
    from psignn_tpu import ops
    from psignn_tpu.compat import convert_reference_checkpoint
    from psignn_tpu.data.fem import solve_poisson
    from psignn_tpu.data.meshgen import blob_mesh
    from psignn_tpu.data.reader import psignn_sample_from_fem
    from psignn_tpu.graphs import batch_graphs
    from psignn_tpu.models import PsignnConfig, psignn_forward
    from psignn_tpu.train.optim import (adam_update, clip_by_global_norm,
                                        init_adam)

    ops.USE_PALLAS_MP = use_pallas
    rng = np.random.default_rng(0)
    samples = []
    for _ in range(50):
        mesh = blob_mesh(radius=1.0, hsize=0.08, rng=rng)
        s = psignn_sample_from_fem(solve_poisson(mesh, 1.0, rng))
        if use_pallas:
            from psignn_tpu.kernels import rcm_permutation
            from psignn_tpu.kernels.fused_mp import apply_node_permutation
            perm = rcm_permutation(s["senders"], s["receivers"],
                                   len(s["x"]))
            s = apply_node_permutation(s, perm)
        samples.append(s)
    n_nodes = sum(len(s["x"]) for s in samples)
    n_edges = sum(len(s["senders"]) for s in samples)
    graph = batch_graphs(samples, pack_kernel_blocks=use_pallas)

    ck = convert_reference_checkpoint(
        "/root/reference/dirichlet/psignn/results/constant_dataset/ckpt/"
        "best_model.pt", family="psignn")
    params = jax.tree.map(jnp.asarray, ck["params"])
    cfg = PsignnConfig(solver="broyden", fw_tol=1e-5, fw_thres=500,
                       bw_tol=1e-8, bw_thres=500)
    opt_state = {"deq": init_adam(params["function"]),
                 "ae": init_adam(params["autoencoder"])}

    def loss_fn(p, g, r):
        out = psignn_forward(p, g, cfg, r, training=True)
        l = out.losses
        total = (l["residual_loss"] + 1.0 * l["jacobian_loss"]
                 + l["encoder_loss"] + l["autoencoder_loss"])
        return total, l

    @jax.jit
    def train_step(params, opt_state, g, r):
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, g, r)
        grads, _ = clip_by_global_norm(grads, 0.1)
        pf, sd = adam_update(grads["function"], opt_state["deq"],
                             params["function"], 0.01)
        pa, sa = adam_update(grads["autoencoder"], opt_state["ae"],
                             params["autoencoder"], 0.05)
        return ({"function": pf, "autoencoder": pa},
                {"deq": sd, "ae": sa}, loss, aux["fw_nstep"])

    key = jax.random.PRNGKey(7)
    p2, o2, loss, fw_nstep = train_step(params, opt_state, graph, key)
    np.asarray(loss)  # force completion (axon timing discipline)

    reps, times = 3, []
    for i in range(reps):
        t0 = time.perf_counter()
        _, _, loss, fw_nstep = train_step(params, opt_state, graph,
                                          jax.random.PRNGKey(8 + i))
        np.asarray(loss)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    step_s = dt
    print(json.dumps({
        "metric": "psignn_train_step_seconds",
        "value": round(step_s, 4),
        "unit": "s/step (batch 50, canonical config)",
        "vs_baseline": round(REF_TRAIN_STEP_S / step_s, 3),
        "detail": {
            "n_nodes": int(n_nodes), "n_edges": int(n_edges),
            "fw_nstep": int(fw_nstep), "loss": float(loss),
            "pallas_mp": bool(use_pallas),
            "epoch_s_extrapolated": round(step_s * 120, 1),
            "baseline_step_s": REF_TRAIN_STEP_S,
        },
    }))


def bench_partitioned():
    """Partitioned solve of the headline mesh across all local devices."""
    import os

    import jax
    from psignn_tpu.data.fem import solve_poisson
    from psignn_tpu.data.meshgen import blob_mesh
    from psignn_tpu.data.reader import psignn_sample_from_fem
    from psignn_tpu.dist import build_partitioned_graph, make_mesh
    from psignn_tpu.dist.partitioned import make_partitioned_inference
    from psignn_tpu.kernels import rcm_permutation
    from psignn_tpu.kernels.fused_mp import apply_node_permutation
    from psignn_tpu.models import PsignnConfig, psignn_init

    n_dev = len(jax.devices())
    rng = np.random.default_rng(0)
    mesh_geo = blob_mesh(radius=5.0, hsize=0.08, rng=rng)
    s = psignn_sample_from_fem(solve_poisson(mesh_geo, 5.0, rng))
    perm = rcm_permutation(s["senders"], s["receivers"], len(s["x"]))
    s = apply_node_permutation(s, perm)
    n_edges = len(s["senders"])

    nstep = 531
    cfg = PsignnConfig(solver="broyden", fw_tol=0.0, fw_thres=nstep)
    params = psignn_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(n_dev, axis="x")
    # default: fused per-shard Pallas MP (PSIGNN_TPU_BENCH_PALLAS=0 opts
    # out) — same A/B knob as the single-device headline bench
    use_pallas = os.environ.get("PSIGNN_TPU_BENCH_PALLAS", "1") == "1" \
        and jax.default_backend() == "tpu"
    from psignn_tpu import ops
    ops.USE_PALLAS_MP = use_pallas
    pg = build_partitioned_graph(s, n_parts=n_dev, pallas=use_pallas)

    fn = make_partitioned_inference(cfg, mesh, pg.n_parts, pg.halo)
    u, ns, lowest, res = fn(params, pg)
    np.asarray(u)
    reps, times = 3, []
    for _ in range(reps):
        t0 = time.perf_counter()
        u, ns, lowest, res = fn(params, pg)
        np.asarray(u)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    edges_per_s = nstep * 2 * n_edges / dt
    print(json.dumps({
        "metric": "psignn_partitioned_fixed_point_edges_per_s",
        "value": round(edges_per_s, 1),
        "unit": f"edges/s over {n_dev} devices",
        "vs_baseline": round(edges_per_s / REF_EDGES_PER_S, 3),
        "detail": {
            "n_nodes": int(mesh_geo.n_points), "n_edges": int(n_edges),
            "n_devices": n_dev, "iters": nstep, "wall_s": round(dt, 4),
            "halo": int(pg.halo), "n_loc": int(pg.n_loc),
            "pallas_mp": bool(use_pallas),
            "residual": float(res),
        },
    }))


def main():
    import os
    import jax

    pause_trainers()
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
    mode = os.environ.get("PSIGNN_TPU_BENCH_MODE", "inference")
    # PSIGNN_TPU_BENCH_CPU8=1: force an 8-device virtual CPU mesh (the
    # axon site install overrides XLA_FLAGS, so the env var alone is not
    # enough) — used to measure partition-mode scaling without a pod.
    if os.environ.get("PSIGNN_TPU_BENCH_CPU8", "0") == "1":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    if mode == "train":
        return bench_train_step(use_pallas)
    if mode == "partition":
        return bench_partitioned()
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
